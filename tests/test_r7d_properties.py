"""Property tests for round-7 batch 20 — brute-force replicas on random
or planted data for the motif matcher, grouped OLS, the referential
audit, drawdown, and the multimodal chunk-hash dedup."""

from __future__ import annotations

import datetime
import math
import random
import re

import pytest


def _stage(spark, tmp_path, name, rows, schema, table):
    out = str(tmp_path / name)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{out}/{table}.parquet"
    )
    return out


def _stage_many(spark, tmp_path, name, tables):
    out = str(tmp_path / name)
    for table, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    return out


def _round_half_away(x: float) -> int:
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


_T0 = datetime.datetime(2024, 1, 1)


def test_pattern_match_matches_bruteforce_re(spark, tmp_path):
    """The journey histogram == a plain Python re.findall replay, with
    deliberately duplicated timestamps (the event_id tie-break must keep
    both engines and the brute force aligned)."""
    from cassandra_syncer_spark.queries.analytics_r7t import (
        _MOTIF,
        events_pattern_match,
    )

    rng = random.Random(41)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    eid = 0
    for user in range(30):
        for _ in range(rng.randint(0, 40)):
            # coarse timestamps → plenty of exact ts collisions
            ts = _T0 + datetime.timedelta(seconds=rng.randint(0, 50))
            rows.append((eid, ts, user, rng.choice(types)))
            eid += 1
    sf = _stage(
        spark, tmp_path, "pm", rows,
        "event_id long, ts timestamp, user_id long, event_type string", "events",
    )
    got = {
        r.n_matches: (r.n_users, r.sum_journey_len)
        for r in events_pattern_match(spark, sf).collect()
    }
    per_user: dict[int, list] = {}
    for e, ts, u, t in rows:
        per_user.setdefault(u, []).append((ts, e, t[0]))
    hist: dict[int, list] = {}
    for u, evs in per_user.items():
        j = "".join(s for _, _, s in sorted(evs))
        n = len(re.findall(_MOTIF, j))
        hist.setdefault(n, [0, 0])
        hist[n][0] += 1
        hist[n][1] += len(j)
    assert got == {k: tuple(v) for k, v in hist.items()}


def test_ols_fit_matches_closed_form_and_perfect_line(spark, tmp_path):
    """Moments-based OLS == the closed-form slope/intercept/R² computed
    straight from the staged points; an exact line gives slope==the
    line's slope and R²==1.0 bit-exactly."""
    from cassandra_syncer_spark.queries.analytics_r7t import agg_ols_fit

    rng = random.Random(97)
    rows = [
        (i, rng.choice("ABC"), float(rng.randint(1, 50)),
         round(rng.uniform(900.0, 10000.0), 2))
        for i in range(400)
    ]
    sf = _stage(
        spark, tmp_path, "ols", rows,
        "l_orderkey long, l_returnflag string, l_quantity double,"
        " l_extendedprice double", "lineitem",
    )
    out = {r.grp: r for r in agg_ols_fit(spark, sf).collect()}
    for grp in "ABC":
        pts = [
            (_round_half_away(100 * q), _round_half_away(100 * p))
            for _, g, q, p in rows if g == grp
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        syy = sum(y * y for _, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        r = out[grp]
        assert r.n == n
        assert abs(r.slope_r6 - slope) <= 1.001e-6
        assert abs(r.intercept_centi_r2 - intercept) <= 1.001e-2
        assert abs(r.r2_r6 - r2) <= 1.001e-6
    # exact line y = 3x + 700 (centi: slope 3, intercept 70000)
    line = [(i, "L", float(i % 50 + 1), 3.0 * (i % 50 + 1) + 700.0) for i in range(100)]
    sf2 = _stage(
        spark, tmp_path, "ols_line", line,
        "l_orderkey long, l_returnflag string, l_quantity double,"
        " l_extendedprice double", "lineitem",
    )
    r = agg_ols_fit(spark, sf2).collect()[0]
    assert (r.slope_r6, r.r2_r6) == (3.0, 1.0)
    assert r.intercept_centi_r2 == 70000.0


def test_referential_audit_detects_planted_orphans(spark, tmp_path):
    """The fixture star schema is healthy (orphans ≡ 0), so plant a
    broken one: orphan FK rows and unreferenced parents at every edge
    must be counted exactly."""
    from cassandra_syncer_spark.queries.analytics_r7t import (
        audit_referential_integrity,
    )

    nation = [(0, "A"), (1, "B"), (2, "C")]  # nationkey 2 unreferenced
    customer = [(10, 0), (11, 1), (12, 99), (13, 0)]  # c 12 → orphan nation 99
    orders = [(100, 10), (101, 11), (102, 77), (103, 77)]  # 2 orphan rows cust 77
    lineitem = [(100, 1), (100, 2), (101, 1), (999, 1), (998, 1)]  # 2 orphans
    supplier = [(50, 0), (51, 98)]  # s 51 → orphan nation 98
    sf = _stage_many(
        spark, tmp_path, "ri",
        {
            "nation": (nation, "n_nationkey long, n_name string"),
            "customer": (customer, "c_custkey long, c_nationkey long"),
            "orders": (orders, "o_orderkey long, o_custkey long"),
            "lineitem": (lineitem, "l_orderkey long, l_linenumber int"),
            "supplier": (supplier, "s_suppkey long, s_nationkey long"),
        },
    )
    got = {
        r.edge: (r.n_child, r.n_distinct_fk, r.n_orphan_rows, r.n_unref_parents)
        for r in audit_referential_integrity(spark, sf).collect()
    }
    assert got == {
        # customer→nation: 4 rows, fks {0,1,99}, 1 orphan row, nation 2 unref
        "customer.c_nationkey->nation": (4, 3, 1, 1),
        # lineitem→orders: 5 rows, fks {100,101,998,999}, 2 orphan rows,
        # orders 102/103 unreferenced
        "lineitem.l_orderkey->orders": (5, 4, 2, 2),
        # orders→customer: 4 rows, fks {10,11,77}, 2 orphan rows, cust 12/13 unref
        "orders.o_custkey->customer": (4, 3, 2, 2),
        # supplier→nation: 2 rows, fks {0,98}, 1 orphan row, nations 1/2 unref
        "supplier.s_nationkey->nation": (2, 2, 1, 2),
    }


def test_drawdown_matches_bruteforce_walk(spark, tmp_path):
    """Top-10 drawdowns == a Python running-peak replay over the same
    filtered, (ts, event_id)-ordered walk, duplicates in ts included."""
    from cassandra_syncer_spark.queries.analytics_r7t import events_max_drawdown

    rng = random.Random(23)
    types = ["purchase", "error", "view"]
    rows = []
    eid = 0
    for user in range(25):
        for _ in range(rng.randint(1, 60)):
            ts = _T0 + datetime.timedelta(seconds=rng.randint(0, 30))
            rows.append((eid, ts, user, rng.choice(types),
                         round(rng.uniform(-50.0, 50.0), 2)))
            eid += 1
    sf = _stage(
        spark, tmp_path, "dd", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double", "events",
    )
    got = [
        (r.user_id, r.n_events, r.max_drawdown_centi)
        for r in events_max_drawdown(spark, sf).collect()
    ]
    per_user: dict[int, list] = {}
    for e, ts, u, t, v in rows:
        if t in ("purchase", "error"):
            per_user.setdefault(u, []).append((ts, e, _round_half_away(100 * v)))
    exp = []
    for u, evs in per_user.items():
        running = peak = 0
        best = 0
        first = True
        for _, _, v in sorted(evs):
            running += v
            if first or running > peak:
                peak = running
                first = False
            best = max(best, peak - running)
        exp.append((u, len(evs), best))
    exp.sort(key=lambda t: (-t[2], t[0]))
    assert got == exp[:10]


def test_media_chunkhash_planted_pair_structure(spark, sf_dir):
    """On the real fixture: the pair set is EXACTLY the planted copies —
    byte-identical copies at 4/4 shared bands and Hamming 0, quartile-
    corrupted copies at 3/4 bands with Hamming confined to one 15-bit
    field, every pair media_type-homogeneous."""
    from cassandra_syncer_spark.queries.analytics_r7t import (
        _CHUNK_MOD,
        _COPY_OFFSET,
        dedup_media_chunkhash,
    )

    rows = dedup_media_chunkhash(spark, sf_dir).collect()
    assert rows, "planted copies must produce pairs"
    doc_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("text IS NOT NULL")
        .select("doc_id")
        .collect()
    }
    expected = {d + _COPY_OFFSET: d for d in doc_ids if d % 100 < 2}
    seen = set()
    for r in rows:
        assert r.doc_b == r.doc_a + _COPY_OFFSET, r
        seen.add(r.doc_b)
        if r.doc_a % 100 == 1:
            assert (r.n_shared_bands, r.hamming) == (4, 0), r
        else:
            assert r.n_shared_bands == 3, r
            # corruption confined to the 2nd quartile's 15-bit field
            assert 0 <= r.hamming <= 15, r
    assert seen == set(expected)


# --------------------------------------------------------------------------
# round-7 batch 21
# --------------------------------------------------------------------------


def test_clustering_coeff_matches_bruteforce_on_real_edges(spark, sf_dir):
    """The decile histogram == a Python set-based lcc replay over the
    SAME candidate edge list the query consumes."""
    from cassandra_syncer_spark.queries.analytics_r7u import graph_clustering_coeff
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    edges = {
        (r.doc_a, r.doc_b) for r in _minhash_pairs(spark, sf_dir).collect()
    }
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    hist: dict[int, list] = {}
    for node, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(1 for x in nb for y in nb if x < y and y in adj.get(x, ()))
        lcc_micro = (2000000 * tri) // (d * (d - 1))
        b = lcc_micro // 100000
        hist.setdefault(b, [0, 0, 0])
        hist[b][0] += 1
        hist[b][1] += tri
        hist[b][2] += d
    got = {
        r.bucket: (r.n_nodes, r.sum_triangles, r.sum_degree)
        for r in graph_clustering_coeff(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in hist.items()}


def test_covariance_matrix_matches_closed_form(spark, tmp_path):
    """All 6 cells == the closed-form population covariance/correlation
    on staged points; self-cells give corr exactly 1.0."""
    from cassandra_syncer_spark.queries.analytics_r7u import agg_covariance_matrix

    rng = random.Random(11)
    rows = [
        (i, float(rng.randint(1, 50)), round(rng.uniform(900, 9000), 2),
         rng.choice([0.0, 0.02, 0.05, 0.1]))
        for i in range(300)
    ]
    sf = _stage(
        spark, tmp_path, "covm", rows,
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_discount double", "lineitem",
    )
    got = {(r.m1, r.m2): r for r in agg_covariance_matrix(spark, sf).collect()}
    pts = {
        "qty": [_round_half_away(100 * q) for _, q, _, _ in rows],
        "price": [_round_half_away(100 * p) for _, _, p, _ in rows],
        "disc": [_round_half_away(10000 * d) for _, _, _, d in rows],
    }
    n = len(rows)
    for (a, b), r in got.items():
        xa, xb = pts[a], pts[b]
        sab = sum(x * y for x, y in zip(xa, xb))
        sa, sb = sum(xa), sum(xb)
        saa = sum(x * x for x in xa)
        sbb = sum(y * y for y in xb)
        cov = (n * sab - sa * sb) / (n * n)
        corr = (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )
        assert r.n == n
        assert abs(r.cov_r4 - cov) <= 1.001e-4 * max(1.0, abs(cov) * 1e-10)
        assert abs(r.corr_r6 - corr) <= 1.001e-6
        if a == b:
            assert r.corr_r6 == 1.0
    assert set(got) == {
        ("disc", "disc"), ("disc", "price"), ("disc", "qty"),
        ("price", "price"), ("price", "qty"), ("qty", "qty"),
    }


def test_pq_adc_matches_python_lut_bruteforce(spark, sf_dir):
    """ADC top-5 == a Python replay: codes from the registered
    quantizer, LUTs from the shared codebook, 8 lookups summed."""
    import hashlib as _h

    from cassandra_syncer_spark.queries.analytics_r5f import (
        _PQ_K,
        _PQ_SUBDIM,
        _PQ_SUBS,
        _pq_centroid,
        embed_pq_quantize,
    )
    from cassandra_syncer_spark.queries.analytics_r7u import (
        _ADC_K,
        _ADC_QUERIES,
        sim_pq_adc_topk,
    )

    codes = {
        r.vec_id: [r[f"code{s}"] for s in range(_PQ_SUBS)]
        for r in embed_pq_quantize(spark, sf_dir).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    got = [
        (r.q_id, r.vec_id, r.adist_r6, r.rn)
        for r in sim_pq_adc_topk(spark, sf_dir).collect()
    ]
    exp = []
    for q in range(_ADC_QUERIES):
        v = vecs[q]
        lut = [
            [
                sum(
                    (v[s * _PQ_SUBDIM + d] - _pq_centroid(s, c, d)) ** 2
                    for d in range(_PQ_SUBDIM)
                )
                for c in range(_PQ_K)
            ]
            for s in range(_PQ_SUBS)
        ]
        scored = sorted(
            (round(sum(lut[s][codes[vid][s]] for s in range(_PQ_SUBS)), 6), vid)
        for vid in codes if vid != q
        )[:_ADC_K]
        exp.extend((q, vid, ad, i + 1) for i, (ad, vid) in enumerate(scored))
    assert got == exp


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    """A perfectly linear daily series with ONE corrupted day: Theil–Sen
    recovers the true slope exactly (the median of pairwise slopes
    shrugs the outlier off); n_pairs == C(days, 2)."""
    from cassandra_syncer_spark.queries.analytics_r7u import events_theil_sen_trend

    rows = []
    eid = 0
    n_days = 15
    for d in range(n_days):
        count = 10 + 2 * d if d != 7 else 500  # day 7 corrupted
        for _ in range(count):
            rows.append((eid, _T0 + datetime.timedelta(days=d, seconds=eid % 3600)))
            eid += 1
    sf = _stage(spark, tmp_path, "ts", rows, "event_id long, ts timestamp", "events")
    r = events_theil_sen_trend(spark, sf).collect()[0]
    assert r.n_days == n_days
    assert r.n_pairs == n_days * (n_days - 1) // 2
    assert r.slope_r6 == 2.0


def test_systematic_stride_exact_rate_and_set(spark, tmp_path):
    """Per source: exactly ceil(n/7) sampled, and the id-sum matches a
    Python replay of the md5 rank order."""
    import hashlib as _h

    from cassandra_syncer_spark.queries.analytics_r7u import (
        _STRIDE,
        sample_systematic_stride,
    )

    rng = random.Random(3)
    rows = [(i, f"src{rng.randint(0, 4)}") for i in range(237)]
    sf = _stage(spark, tmp_path, "stride", rows, "doc_id long, source string",
                "documents")
    got = {
        r.source: (r.n_docs, r.n_sampled, r.sampled_id_sum)
        for r in sample_systematic_stride(spark, sf).collect()
    }
    per_src: dict[str, list] = {}
    for i, s in rows:
        per_src.setdefault(s, []).append(i)
    for s, ids in per_src.items():
        ranked = sorted(ids, key=lambda i: (_h.md5(str(i).encode()).hexdigest(), i))
        sampled = ranked[::_STRIDE]  # ranks 1, 8, 15, ... == every 7th
        assert got[s] == (len(ids), len(sampled), sum(sampled)), s


# --------------------------------------------------------------------------
# round-7 batch 22
# --------------------------------------------------------------------------


def test_file_metadata_audit_one_file_per_partition(spark, sf_dir):
    """Every partition reports exactly one physical file, and row counts
    reconstruct the source group-by."""
    from cassandra_syncer_spark.queries.analytics_r7v import scan_file_metadata_audit

    rows = scan_file_metadata_audit(spark, sf_dir).collect()
    assert rows and all(r.n_files == 1 for r in rows)
    src = {
        (r.l_returnflag, r.l_linestatus): r.cnt
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt"))
        .collect()
    }
    assert {(r.l_returnflag, r.l_linestatus): r.n_rows for r in rows} == src


def test_bitemporal_snapshots_bracket_corrections(spark, tmp_path):
    """Planted micro-fixture: the early snapshot sees pre-correction
    values, the late snapshot sees every correction; sums replay in
    Python."""
    from cassandra_syncer_spark.queries.analytics_r7v import (
        _CORR_LAG_S,
        _SNAP_EARLY,
        events_bitemporal_correction,
    )

    rng = random.Random(5)
    rows = []
    for eid in range(200):
        ts = _T0 + datetime.timedelta(days=rng.randint(0, 25), seconds=eid)
        rows.append((eid, ts, round(rng.uniform(1, 99), 2)))
    sf = _stage(spark, tmp_path, "bt", rows,
                "event_id long, ts timestamp, value double", "events")
    got = {
        r.snapshot: (r.n_events, r.n_corrected, r.sum_centi)
        for r in events_bitemporal_correction(spark, sf).collect()
    }
    epoch = datetime.datetime(1970, 1, 1)
    exp = {}
    for snap, cutoff in (("early", _SNAP_EARLY), ("late", 4102444800)):
        n = corrected = total = 0
        for eid, ts, v in rows:
            tx = int((ts - epoch).total_seconds())
            vc = _round_half_away(100 * v)
            if tx > cutoff:
                continue
            n += 1
            if eid % 50 == 0 and tx + _CORR_LAG_S <= cutoff:
                corrected += 1
                total += 2 * vc
            else:
                total += vc
        exp[snap] = (n, corrected, total)
    assert got == exp
    # the fixture spans the early cutoff, so the two snapshots differ
    assert got["early"] != got["late"]


def test_hashing_trick_masses_conserve_and_collide(spark, sf_dir):
    """Bucket masses must conserve the corpus token count exactly, and
    the 64-bucket space must show collisions on a real vocabulary."""
    from cassandra_syncer_spark.queries.analytics_r7v import feat_hashing_trick

    rows = feat_hashing_trick(spark, sf_dir).collect()
    n_tokens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("sum(size(split(text, ' '))) AS n")
        .collect()[0]
        .n
    )
    assert sum(r.total_count for r in rows) == n_tokens
    assert sum(r.n_distinct_words for r in rows) > len(rows)  # collisions exist
    for r in rows:
        assert abs(r.signed_mass) <= r.total_count
        assert 0 <= r.bucket < 64


def test_hampel_flags_planted_spike_not_constant(spark, tmp_path):
    """A constant series with one spike: exactly the spike is flagged
    and replaced by the local median; an all-constant user flags
    nothing."""
    from cassandra_syncer_spark.queries.analytics_r7v import win_hampel_filter

    rows = []
    # user 1: constant 10.00 with a spike at position 7
    for i in range(15):
        v = 500.0 if i == 7 else 10.0
        rows.append((i, _T0 + datetime.timedelta(seconds=i), 1, "view", v))
    # user 2: all constant
    for i in range(10):
        rows.append((100 + i, _T0 + datetime.timedelta(seconds=i), 2, "view", 7.5))
    sf = _stage(
        spark, tmp_path, "hampel", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double", "events",
    )
    got = {r.user_id: r for r in win_hampel_filter(spark, sf).collect()}
    assert got[2].n_flagged == 0
    assert got[2].sum_filtered_centi_x2 == 10 * 2 * 750
    assert got[1].n_flagged == 1
    # spike replaced by local median (1000 centi → med2 = 2000)
    assert got[1].sum_filtered_centi_x2 == 15 * 2 * 1000


def test_time_to_convert_matches_bruteforce(spark, tmp_path):
    """Latency percentiles == a Python replay (first view, earliest
    subsequent purchase, numpy-free interpolated percentiles)."""
    from cassandra_syncer_spark.queries.analytics_r7v import events_time_to_convert

    rng = random.Random(77)
    types = ["view", "purchase", "click"]
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(rng.randint(1, 25)):
            ts = _T0 + datetime.timedelta(seconds=rng.randint(0, 100000))
            rows.append((eid, ts, u, rng.choice(types)))
            eid += 1
    sf = _stage(
        spark, tmp_path, "ttc", rows,
        "event_id long, ts timestamp, user_id long, event_type string", "events",
    )
    r = events_time_to_convert(spark, sf).collect()[0]
    views: dict[int, datetime.datetime] = {}
    for _, ts, u, t in rows:
        if t == "view" and (u not in views or ts < views[u]):
            views[u] = ts
    deltas = {}
    for _, ts, u, t in rows:
        if t == "purchase" and u in views and ts >= views[u]:
            d = int((ts - views[u]).total_seconds() * 1000000)
            if u not in deltas or d < deltas[u]:
                deltas[u] = d

    def pct(vals, p):
        vals = sorted(vals)
        k = (len(vals) - 1) * p
        lo, hi = int(math.floor(k)), int(math.ceil(k))
        v = vals[lo] + (vals[hi] - vals[lo]) * (k - lo)
        return round(v / 1000000.0, 2)

    assert r.n_viewers == len(views)
    assert r.n_converted == len(deltas)
    assert r.conversion_micro == 1000000 * len(deltas) // len(views)
    assert r.p50_sec == pct(list(deltas.values()), 0.5)
    assert r.p90_sec == pct(list(deltas.values()), 0.9)
