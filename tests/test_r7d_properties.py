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
