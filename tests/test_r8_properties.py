"""Property + plan laws for the round-8 batch-1 operators: invariants
checked independently of the fixture-shaped oracle, plus the physical-plan
shape each query's docstring claims."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from cassandra_syncer_spark.registry import REGISTRY, all_queries


def _plan(spark, sf_dir, name):
    all_queries()
    return (
        REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


# ---------------------------------------------------------------------------
# events_power_mde
# ---------------------------------------------------------------------------


def test_power_mde_matches_float_reference(spark, sf_dir):
    """MDE from the exact integer moments == textbook float formula on
    the same per-user totals (both arms), within rounding."""
    all_queries()
    row = REGISTRY["events_power_mde"].fn(spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    # reference: recompute from the per-user totals driver-side
    u = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).alias("y"))
        .withColumn(
            "arm",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 2,
        )
        .collect()
    )
    a = [x.y / 100.0 for x in u if x.arm == 0]
    b = [x.y / 100.0 for x in u if x.arm == 1]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    va = sum((x - sum(a) / len(a)) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - sum(b) / len(b)) ** 2 for x in b) / (len(b) - 1)
    mde = (1.959964 + 0.841621) * math.sqrt(va / len(a) + vb / len(b))
    assert abs(r.mde_abs_r6 - mde) < 1e-4
    assert r.sd_a_r6 >= 0 and r.sd_b_r6 >= 0 and r.mde_abs_r6 >= 0


def test_power_mde_plan_no_joins(spark, sf_dir):
    p = _plan(spark, sf_dir, "events_power_mde")
    assert "Join" not in p, p


# ---------------------------------------------------------------------------
# agg_bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_and_weights(spark, sf_dir):
    """CI is ordered, replicate weights are genuine Poisson(1) draws
    (mean weight ~1 so each replicate's n is ~corpus n), and the point
    mean sits inside the interval on real fixture data."""
    all_queries()
    r = REGISTRY["agg_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert r.ci_lo_r4 <= r.ci_hi_r4
    assert r.ci_lo_r4 <= r.mean_r4 <= r.ci_hi_r4  # ~always at fixture n
    assert r.n_rows > 0


def test_bootstrap_ci_plan_combines_before_shuffle(spark, sf_dir):
    """The 32x explode must collapse map-side: a partial HashAggregate
    sits between Generate and the exchange, and the only join is the
    1-row broadcast cross assembling the output row."""
    p = _plan(spark, sf_dir, "agg_bootstrap_ci")
    assert "CartesianProduct" not in p, p
    gen = p.index("Generate")
    assert "HashAggregate" in p[:gen], p  # partial agg above the explode
    assert p.count("Exchange hashpartitioning") <= 1, p


# ---------------------------------------------------------------------------
# sample_neyman_allocation
# ---------------------------------------------------------------------------


def test_neyman_allocation_sums_to_budget_and_orders_by_weight(spark, sf_dir):
    all_queries()
    rows = REGISTRY["sample_neyman_allocation"].fn(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == 1000
    # allocation must order like N_h * sd_h (within the +/-1 remainder)
    by_w = sorted(rows, key=lambda r: r.n_h * r.sd_r6)
    allocs = [r.alloc for r in by_w]
    assert all(a <= b + 1 for a, b in zip(allocs, allocs[1:], strict=False))


def test_neyman_allocation_exact_on_handmade_strata(spark, tmp_path):
    """3 handmade strata with known sds: allocation matches the
    hand-computed largest-remainder split."""
    all_queries()
    rng = random.Random(5)
    rows = []
    doc = 0
    # stratum A: 100 docs, n_chars constant (sd 0) -> alloc 0 from weight
    for _ in range(100):
        rows.append((doc, "x", "en", "A", 500))
        doc += 1
    # stratum B: 200 docs, n_chars alternating 100/300 (sd ~100.25)
    for i in range(200):
        rows.append((doc, "x", "en", "B", 100 if i % 2 else 300))
        doc += 1
    # stratum C: 100 docs, n_chars uniform spread (bigger sd)
    for _ in range(100):
        rows.append((doc, "x", "en", "C", rng.randrange(0, 2000)))
        doc += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "strata")
    for t in ["documents"]:
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    # the query only reads documents; stage the other tables as empty copies
    import os

    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
    got = {r.source: r for r in REGISTRY["sample_neyman_allocation"].fn(spark, out).collect()}
    import statistics

    w = {}
    data = {"A": [500] * 100, "B": [100 if i % 2 else 300 for i in range(200)]}
    data["C"] = [x[4] for x in rows if x[3] == "C"]
    for srcname, vals in data.items():
        sd = statistics.stdev(vals)
        w[srcname] = round(1e6 * len(vals) * sd)
    total = sum(w.values())
    base = {k: (1000 * v) // total for k, v in w.items()}
    rem = {k: (1000 * v) % total for k, v in w.items()}
    leftover = 1000 - sum(base.values())
    order = sorted(w, key=lambda k: (-rem[k], k))
    expect = {
        k: base[k] + (1 if order.index(k) < leftover else 0) for k in w
    }
    for k in w:
        assert got[k].alloc == expect[k], (k, got[k].alloc, expect[k])
    assert sum(r.alloc for r in got.values()) == 1000


# ---------------------------------------------------------------------------
# feat_woe_encode
# ---------------------------------------------------------------------------


def test_woe_iv_terms_nonnegative_and_sign_consistent(spark, sf_dir):
    """IV terms are (a-b)*ln(a/b) which is >= 0 for all a,b > 0; WoE sign
    must agree with whether the category over-indexes on the target."""
    all_queries()
    rows = REGISTRY["feat_woe_encode"].fn(spark, sf_dir).collect()
    assert rows
    gt = sum(r.n_target for r in rows)
    bt = sum(r.n_other for r in rows)
    k = len(rows)
    for r in rows:
        assert r.iv_term_micro >= 0, r
        lhs = (r.n_target + 0.5) / (gt + 0.5 * k)
        rhs = (r.n_other + 0.5) / (bt + 0.5 * k)
        assert (r.woe_r6 >= 0) == (lhs >= rhs), r


def test_woe_plan_single_corpus_exchange(spark, sf_dir):
    p = _plan(spark, sf_dir, "feat_woe_encode")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p


# ---------------------------------------------------------------------------
# graph_link_prediction_ra
# ---------------------------------------------------------------------------


def test_ra_scores_positive_and_pairs_not_edges(spark, sf_dir):
    all_queries()
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    rows = REGISTRY["graph_link_prediction_ra"].fn(spark, sf_dir).collect()
    edges = {
        (r.doc_a, r.doc_b)
        for r in _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    seen_rk = []
    for r in rows:
        assert r.ra_micro > 0 and r.common >= 1
        assert r.doc_a < r.doc_b
        assert (r.doc_a, r.doc_b) not in edges, r
        seen_rk.append(r.rk)
    assert seen_rk == list(range(1, len(seen_rk) + 1))


def test_ra_no_cartesian(spark, sf_dir):
    p = _plan(spark, sf_dir, "graph_link_prediction_ra")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


# ---------------------------------------------------------------------------
# agg_median_selection (batch 2)
# ---------------------------------------------------------------------------


def test_median_selection_matches_percentile_on_random_frames(spark):
    """Counting selection == sort-based percentile (x2 stays integer)
    on random frames with ties, odd and even group sizes."""
    all_queries()
    rng = random.Random(11)
    rows = [
        (rng.choice("ABC"), rng.choice([1.0, 2.5, 2.5, 7.25, 99.0, rng.random() * 50]))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    g = df.groupBy("l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long").alias("vc")).count()
    from pyspark.sql.window import Window as W

    c = g.select(
        "l_returnflag",
        "vc",
        F.sum("count").over(W.partitionBy("l_returnflag")).alias("n"),
        F.sum("count")
        .over(
            W.partitionBy("l_returnflag").orderBy("vc").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("cum"),
    ).withColumn("k1", F.expr("(n + 1) div 2")).withColumn("k2", F.expr("(n + 2) div 2"))
    sel = {
        r.l_returnflag: r.m
        for r in c.groupBy("l_returnflag")
        .agg(
            (
                F.min(F.when(F.col("cum") >= F.col("k1"), F.col("vc")))
                + F.min(F.when(F.col("cum") >= F.col("k2"), F.col("vc")))
            ).alias("m")
        )
        .collect()
    }
    ref = {
        r.l_returnflag: r.m
        for r in df.groupBy("l_returnflag")
        .agg(
            F.expr(
                "CAST(round(2 * percentile(CAST(round(100 * l_extendedprice) AS BIGINT), 0.5)) AS BIGINT)"
            ).alias("m")
        )
        .collect()
    }
    assert sel == ref


def test_median_selection_two_phase_on_random_frames(spark, tmp_path):
    """The REAL two-phase agg_median_selection == sort-based percentile
    on random frames: ties, odd/even group sizes, values spanning many
    coarse buckets AND values packed into one bucket (cut-at-boundary
    and same-bucket-cuts edge cases of the round-11 rewrite)."""
    all_queries()
    from cassandra_syncer_spark.queries.analytics_r8b import agg_median_selection

    rng = random.Random(17)
    rows = []
    for grp, size, spread in [("A", 401, 5_000_000), ("B", 38, 900), ("C", 7, 40.95)]:
        for _ in range(size):
            rows.append((grp, rng.random() * spread))
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    out = str(tmp_path / "med")
    df.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    got = {r.l_returnflag: (r.n_rows, r.med_centi_x2)
           for r in agg_median_selection(spark, out).collect()}
    ref = {
        r.l_returnflag: (r.n, r.m)
        for r in df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(round(2 * percentile(CAST(round(100 * l_extendedprice) AS BIGINT), 0.5)) AS BIGINT)"
            ).alias("m"),
        )
        .collect()
    }
    assert got == ref


def test_median_selection_plan_broadcast_cuts_only(spark, sf_dir):
    """Round-11 two-phase shape: the only join is the BROADCAST of the
    per-group cut spec onto the second scan (never a shuffled join of
    corpus rows), and every Exchange carries bucket/cut-slice rows —
    the full (group, value) grid is never shuffled."""
    for q in ("agg_median_selection", "agg_trimmed_mean_selection"):
        p = _plan(spark, sf_dir, q)
        assert "BroadcastHashJoin" in p, p
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
        assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p
        # bounded exchange count (round-11 ADVICE): the two-phase shape
        # plans 5 hash exchanges (bucket agg, two window repartitions, the
        # cut-slice agg, its window) — a regression that reintroduces the
        # full (group, value)-grid shuffle adds more
        assert p.count("Exchange hashpartitioning") <= 5, p


# ---------------------------------------------------------------------------
# corpus_zipf_octave_fit (batch 2)
# ---------------------------------------------------------------------------


def test_zipf_fit_recovers_exponent_on_synthetic_zipf_corpus(spark, tmp_path):
    """A handmade corpus with true Zipf(s=1) token frequencies: the
    octave fit recovers a negative slope and s in a sane band.  (The
    tiny synthetic sf fixtures have ~dozens of types with an INVERTED
    spectrum, so the sign assertion belongs on real Zipf data.)"""
    all_queries()
    import os

    # vocabulary of 512 words, word r appears ceil(2048/r) times (s=1)
    words = []
    for r in range(1, 513):
        words += [f"w{r}"] * (2048 // r + 1)
    rng = random.Random(3)
    rng.shuffle(words)
    docs, chunk = [], 200
    for i in range(0, len(words), chunk):
        docs.append((i // chunk, " ".join(words[i : i + chunk]), "en", "syn", chunk))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "zipf")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src_p = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src_p):
            spark.read.parquet(src_p).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    r = REGISTRY["corpus_zipf_octave_fit"].fn(spark, out).collect()[0]
    assert r.n_octaves >= 6
    assert r.slope_r6 < 0, r
    assert r.zipf_s_r6 is not None and 0.5 < r.zipf_s_r6 < 2.0, r


def test_zipf_fit_schema_stable_on_fixture(spark, sf_dir):
    """On the synthetic fixture the spectrum may invert -- the contract
    is one row, k >= 2, and the exponent NULLs out iff slope >= 0."""
    all_queries()
    rows = REGISTRY["corpus_zipf_octave_fit"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_octaves >= 2
    assert (r.zipf_s_r6 is None) == (r.slope_r6 >= 0)


# ---------------------------------------------------------------------------
# events_entropy_profile (batch 2)
# ---------------------------------------------------------------------------


def test_entropy_bands_partition_users_and_bound_by_log_types(spark, sf_dir):
    all_queries()
    rows = REGISTRY["events_entropy_profile"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_types = ev.select("event_type").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    # max possible entropy = ln(n_types) nats -> band bound
    assert all(0 <= r.band <= int(math.log(n_types) * 1e6) // 250000 for r in rows)


def test_entropy_exact_on_handmade_mixes(spark, tmp_path):
    """Uniform 2-type mix -> ln 2; single-type -> 0 (band 0)."""
    all_queries()
    import os

    rows = []
    eid = 0
    for i in range(8):  # user 1: 50/50 click/view -> H = ln 2
        rows.append((eid, "2024-01-01 00:%02d:00" % i, 1, "click" if i % 2 else "view", 1.0, "{}"))
        eid += 1
    for i in range(5):  # user 2: all clicks -> H = 0
        rows.append((eid, "2024-01-01 01:%02d:00" % i, 2, "click", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "ent")
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    got = {r.band: (r.n_users, r.sum_h_micro) for r in REGISTRY["events_entropy_profile"].fn(spark, out).collect()}
    ln2_micro = round(1e6 * math.log(2))
    # user 1 in band ln2//0.25 = 2, user 2 in band 0
    assert got[0] == (1, 0)
    band1 = ln2_micro // 250000
    assert got[band1][0] == 1
    assert abs(got[band1][1] - ln2_micro) <= 2  # per-term rounding slack


# ---------------------------------------------------------------------------
# stream_session_window (batch 2)
# ---------------------------------------------------------------------------


def test_session_window_merges_at_exact_gap(spark, tmp_path):
    """An exactly-30-minute gap MERGES (UpdatingSessionsIterator joins
    when next.start <= prev.end) -- the same > convention as the cumsum
    sessionizers; 30:01 splits."""
    all_queries()
    import os

    rows = [
        (0, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (1, "2024-01-01 00:30:00", 1, "view", 1.0, "{}"),  # exact gap -> MERGES
        (2, "2024-01-01 01:00:00", 2, "view", 1.0, "{}"),
        (3, "2024-01-01 01:30:01", 2, "view", 1.0, "{}"),  # gap + 1s -> splits
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "sess")
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    got = {r.user_id: r for r in REGISTRY["stream_session_window"].fn(spark, out).collect()}
    assert got[1].n_sessions == 1 and got[1].sum_span_us == 1800 * 1000000
    assert got[2].n_sessions == 2 and got[2].sum_span_us == 0


def test_session_window_single_user_shuffle(spark, sf_dir):
    p = _plan(spark, sf_dir, "stream_session_window")
    assert "Join" not in p, p


# ---------------------------------------------------------------------------
# audit_column_profile (batch 2)
# ---------------------------------------------------------------------------


def test_column_profile_prunes_each_scan_to_one_column(spark, sf_dir):
    """Measured plan choice (see docstring): five per-column branches,
    each scan PRUNED to exactly its one source column — five 1-column
    scans read the same bytes as one 5-column scan, without the Expand
    the multi-distinct one-scan draft planned (benchmarked 2.8x slower)."""
    p = _plan(spark, sf_dir, "audit_column_profile")
    assert p.count("FileScan parquet") == 5, p
    assert "Expand" not in p, p
    assert "Join" not in p, p
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert len(schemas) == 5, p
    for s in schemas:
        assert s.count(":") == 1, (s, p)  # exactly one column per scan


def test_column_profile_matches_per_column_queries(spark, sf_dir):
    all_queries()
    got = {r.col_name: r for r in REGISTRY["audit_column_profile"].fn(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select(F.round(F.col("l_quantity") * 100).cast("long").alias("v"))
    ref = q.agg(
        F.count(F.lit(1)).alias("nr"),
        F.countDistinct("v").alias("nd"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).collect()[0]
    r = got["l_quantity"]
    assert (r.n_rows, r.n_distinct, r.min_centi, r.max_centi) == (ref.nr, ref.nd, ref.mn, ref.mx)


# ---------------------------------------------------------------------------
# agg_trimmed_mean_selection (batch 3)
# ---------------------------------------------------------------------------


def test_trimmed_mean_selection_matches_sorted_reference(spark):
    """Counting-selection tail sums == brute-force sorted trim on random
    frames with heavy ties (k spans tie runs) and tiny groups (k=0)."""
    all_queries()
    from cassandra_syncer_spark.queries.analytics_r8c import (
        agg_trimmed_mean_selection,
    )

    rng = random.Random(23)
    rows = []
    for grp, size in [("A", 400), ("B", 37), ("C", 7)]:  # C: k=0
        for _ in range(size):
            v = rng.choice([1.0, 1.0, 2.0, 5.0, rng.random() * 100, 99.0])
            rows.append((grp, v))
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    import tempfile, os

    out = tempfile.mkdtemp(prefix="trim")
    df.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    got = {
        r.l_returnflag: r
        for r in agg_trimmed_mean_selection(spark, out).collect()
    }
    from collections import defaultdict

    byg = defaultdict(list)
    for grp, v in rows:
        byg[grp].append(round(100 * v))
    for grp, vals in byg.items():
        vals.sort()
        n = len(vals)
        k = n // 20
        mid = vals[k : n - k]
        expect = round(sum(mid) / len(mid) / 100.0, 6)
        r = got[grp]
        assert (r.n_rows, r.n_trimmed_each) == (n, k), (grp, r)
        assert abs(r.trimmed_mean_r6 - expect) < 1e-6, (grp, r.trimmed_mean_r6, expect)


def test_trimmed_mean_plan_broadcast_cuts_only(spark, sf_dir):
    """Round-11 two-phase shape (see the median law above): broadcast
    cut-spec join only, no shuffled/cartesian join of corpus rows."""
    p = _plan(spark, sf_dir, "agg_trimmed_mean_selection")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p


# ---------------------------------------------------------------------------
# events_seasonal_decompose (batch 3)
# ---------------------------------------------------------------------------


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark, tmp_path):
    """Pure signal = flat trend + exact weekly pattern, no noise: the
    decomposition recovers the planted factors exactly (residual 0)."""
    all_queries()
    import datetime, os

    pattern = [500, -300, 0, 200, -100, -200, -100]  # sums to 0 (centi)
    base = 100000
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day in range(35):
        d = d0 + datetime.timedelta(days=day)
        dow = (d - datetime.date(1970, 1, 1)).days % 7
        total_centi = base + pattern[dow]
        rows.append((eid, f"{d} 12:00:00", 1, "view", total_centi / 100.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "seas")
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    got = {r.dow: r for r in REGISTRY["events_seasonal_decompose"].fn(spark, out).collect()}
    for dow, factor in enumerate(pattern):
        r = got[dow]
        assert r.seasonal_centi == factor, (dow, r.seasonal_centi, factor)
        assert r.mean_abs_resid_centi == 0, r


# ---------------------------------------------------------------------------
# text_readability_flesch (batch 3)
# ---------------------------------------------------------------------------


def test_flesch_exact_on_hand_counted_doc(spark, tmp_path):
    """One doc with hand-counted words/sentences/vowel-runs: the micro
    score equals the hand-computed formula."""
    all_queries()
    import os

    text = "the cat sat on the mat. the dog ran far!"
    # words: 10; sentences: 2 ('.'+'!' are separate [.!?]+ runs)
    # vowel runs (lower): e,a,a,o,e,a,e,o,a,a -> 10
    n_words, n_sents, n_syll = 10, 2, 10
    score = 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (n_syll / n_words)
    docs = [(0, text, "en", "handmade", len(text))]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "flesch")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    r = REGISTRY["text_readability_flesch"].fn(spark, out).collect()[0]
    assert r.n_docs == 1
    assert r.mean_flesch_micro == round(1e6 * score), (r.mean_flesch_micro, score)


# ---------------------------------------------------------------------------
# corpus_burstiness_dispersion (batch 3)
# ---------------------------------------------------------------------------


def test_burstiness_ranks_planted_bursty_term_first(spark, tmp_path):
    """A term concentrated in few docs (300 occurrences in 3 docs) must
    out-rank a uniform term (1 occurrence in each of 300 docs)."""
    all_queries()
    import os

    docs = []
    for i in range(300):
        words = ["uniformterm"] + ["filler%d" % (i % 7)] * 3
        if i < 3:
            words += ["burstyterm"] * 100
        docs.append((i, " ".join(words), "en", "syn", 10))
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "burst")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    rows = REGISTRY["corpus_burstiness_dispersion"].fn(spark, out).collect()
    ranks = {r.term: r.rk for r in rows}
    assert "burstyterm" in ranks
    assert "uniformterm" in ranks
    assert ranks["burstyterm"] < ranks["uniformterm"]
    by_term = {r.term: r for r in rows}
    assert by_term["uniformterm"].vmr_r6 == 0.0  # exactly 1 per doc -> var 0


# ---------------------------------------------------------------------------
# shard_pack_partitioned (batch 3)
# ---------------------------------------------------------------------------


def test_partitioned_packing_conserves_tokens_and_bounds_fill(spark, sf_dir):
    """Tokens conserve across partitions; every shard except possibly a
    partition's LAST stays under budget + max-doc overshoot; within one
    partition the packing equals the global packer's greedy rule."""
    all_queries()
    rows = REGISTRY["shard_pack_partitioned"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("t")
    ).collect()[0].t
    assert sum(r.total_tokens for r in rows) == total
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.part for r in rows} <= set(range(8))
    max_doc = docs.select(
        F.max(F.size(F.split("text", " "))).cast("long").alias("m")
    ).collect()[0].m
    for r in rows:
        assert r.max_shard_tokens < 20000 + max_doc, r


# ---------------------------------------------------------------------------
# cdc_apply_changelog (batch 4)
# ---------------------------------------------------------------------------


def test_cdc_apply_matches_bruteforce_replay(spark, sf_dir):
    """Replay the synthesized changelog driver-side and compare the live
    set and balances exactly (delete-wins, latest-seq, new inserts)."""
    all_queries()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("bal")
    ).collect()
    state = {}
    for c in cust:  # seq 0 insert
        state[c.c_custkey] = (c.c_nationkey, c.bal)
    for c in cust:  # seq 1 update
        if c.c_custkey % 3 == 0:
            state[c.c_custkey] = (c.c_nationkey, c.bal + 100000)
    for c in cust:  # seq 2 delete
        if c.c_custkey % 7 == 0:
            state.pop(c.c_custkey, None)
    for c in cust:  # seq 3 insert new key
        if c.c_custkey % 11 == 0:
            state[c.c_custkey + 10000000] = (c.c_nationkey, 555500)
    from collections import defaultdict

    expect = defaultdict(lambda: [0, 0])
    for nat, bal in state.values():
        expect[nat][0] += 1
        expect[nat][1] += bal
    got = {
        r.c_nationkey: (r.n_live, r.sum_bal_centi)
        for r in REGISTRY["cdc_apply_changelog"].fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}


# ---------------------------------------------------------------------------
# audit_constraint_violations (batch 4)
# ---------------------------------------------------------------------------


def test_constraint_audit_zero_on_invariants_nonzero_on_bounds(spark, sf_dir):
    all_queries()
    got = {r.rule: r for r in REGISTRY["audit_constraint_violations"].fn(spark, sf_dir).collect()}
    assert got["key_not_null"].n_violations == 0
    assert got["status_enum"].n_violations == 0
    assert got["date_in_range"].n_violations == 0
    assert got["priority_format"].n_violations == 0
    assert got["price_business_bound"].n_violations > 0  # real data crosses it
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert all(r.n_checked == n for r in got.values())


def test_constraint_audit_detects_planted_violations(spark, tmp_path):
    all_queries()
    import os

    rows = [
        (1, 10, "O", 100.0, "1995-01-01", "1-URGENT", "c1", 0, "x"),
        (2, None, "O", 100.0, "1995-01-01", "1-URGENT", "c1", 0, "x"),  # null key
        (3, 10, "Z", 100.0, "1995-01-01", "1-URGENT", "c1", 0, "x"),    # bad enum
        (4, 10, "F", 100.0, "1890-01-01", "1-URGENT", "c1", 0, "x"),    # bad date
        (5, 10, "P", 999999.0, "1995-01-01", "1-URGENT", "c1", 0, "x"), # bound
        (6, 10, "O", 100.0, "1995-01-01", "URGENT", "c1", 0, "x"),      # bad fmt
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate string, o_orderpriority string, o_clerk string,"
        " o_shippriority long, o_comment string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out = str(tmp_path / "cons")
    df.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "lineitem", "events", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    got = {r.rule: r.n_violations for r in REGISTRY["audit_constraint_violations"].fn(spark, out).collect()}
    assert got == {
        "key_not_null": 1,
        "status_enum": 1,
        "date_in_range": 1,
        "price_business_bound": 1,
        "priority_format": 1,
    }


def test_constraint_audit_single_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "audit_constraint_violations")
    assert p.count("FileScan parquet") == 1, p


# ---------------------------------------------------------------------------
# text_ngram_entropy_rate (batch 4)
# ---------------------------------------------------------------------------


def test_bigram_entropy_zero_when_fully_predictable(spark, tmp_path):
    """'a b a b ...' -> every w1 has exactly one successor -> H = 0;
    mixing successors raises it, bounded by ln(successor fanout)."""
    all_queries()
    import os

    docs = [
        (0, " ".join(["a", "b"] * 50), "en", "s", 10),
        (1, " ".join(["a", "b"] * 30), "en", "s", 10),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "ent2")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    r = REGISTRY["text_ngram_entropy_rate"].fn(spark, out).collect()[0]
    # successors: a->b always; b->a except at doc ends (b ends each doc)
    # so H is tiny but not exactly 0; assert near-zero and bounded
    assert 0 <= r.cond_entropy_micro < int(0.1 * 1e6), r
    assert r.n_bigram_types == 2  # (a,b) and (b,a)


def test_bigram_entropy_bounded_by_ln_vocab_on_fixture(spark, sf_dir):
    all_queries()
    r = REGISTRY["text_ngram_entropy_rate"].fn(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .select("w")
        .distinct()
        .count()
    )
    assert 0 <= r.cond_entropy_micro <= int(math.log(vocab) * 1e6)


# ---------------------------------------------------------------------------
# win_outlier_iqr_fences (batch 4)
# ---------------------------------------------------------------------------


def test_iqr_fences_match_bruteforce(spark, tmp_path):
    all_queries()
    from cassandra_syncer_spark.queries.analytics_r8d import win_outlier_iqr_fences

    rng = random.Random(31)
    rows = [("A", rng.gauss(50, 5)) for _ in range(300)] + [
        ("A", 500.0), ("A", -400.0),  # planted outliers
        ("B", 1.0), ("B", 2.0), ("B", 3.0),
    ]
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    out = str(tmp_path / "iqr")
    df.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    got = {r.l_returnflag: r for r in win_outlier_iqr_fences(spark, out).collect()}

    def brute(vals):
        import statistics

        vals = sorted(round(100 * v) for v in vals)
        n = len(vals)

        def q(p):
            pos = (n - 1) * p
            lo, frac = int(pos), pos - int(pos)
            return vals[lo] + frac * (vals[min(lo + 1, n - 1)] - vals[lo])

        q1, q3 = q(0.25), q(0.75)
        lofence, hifence = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        return sum(1 for v in vals if v < lofence or v > hifence)

    byg = {"A": [v for g, v in rows if g == "A"], "B": [v for g, v in rows if g == "B"]}
    for g, vals in byg.items():
        assert got[g].n_outliers == brute(vals), (g, got[g], brute(vals))
    assert got["A"].n_outliers >= 2  # the planted pair is flagged


# ---------------------------------------------------------------------------
# graph_component_size_histogram (batch 4)
# ---------------------------------------------------------------------------


def test_component_histogram_consistent_with_labels(spark, sf_dir):
    all_queries()
    rows = REGISTRY["graph_component_size_histogram"].fn(spark, sf_dir).collect()
    labels = REGISTRY["dedup_cluster_components"].fn(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == len(labels)
    assert all(r.component_size * r.n_components == r.n_docs for r in rows)
    assert all(r.component_size >= 2 for r in rows)  # singletons never edge in


# ---------------------------------------------------------------------------
# agg_histogram_equidepth (batch 5)
# ---------------------------------------------------------------------------


def test_equidepth_depths_sum_to_n_and_boundaries_are_order_stats(spark, sf_dir):
    all_queries()
    rows = REGISTRY["agg_histogram_equidepth"].fn(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_rows for r in rows) == n
    vals = sorted(
        r2.vc
        for r2 in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"))
        .collect()
    )
    for r in rows:
        lo_pos = (r.bucket * n) // 8 + 1
        hi_pos = ((r.bucket + 1) * n) // 8
        assert r.lo_centi == vals[lo_pos - 1], r
        assert r.hi_centi == vals[hi_pos - 1], r
    assert [r.bucket for r in rows] == list(range(8))


def test_iqr_fences_plan_selection_not_percentile(spark, sf_dir):
    """Round-9 swap (VERDICT r8 #3): the quartiles must come from the
    counting-selection domain window, NOT a sort-buffering percentile()
    aggregate; the fence pass joins the |groups|-row quartile frame back
    by BROADCAST only."""
    p = _plan(spark, sf_dir, "win_outlier_iqr_fences")
    assert "percentile" not in p.lower(), p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_equidepth_no_corpus_sort(spark, sf_dir):
    p = _plan(spark, sf_dir, "agg_histogram_equidepth")
    assert "Join" not in p or "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p
    # the only sort allowed is the domain-window sort + final 8-row sort
    assert p.count("Exchange hashpartitioning") <= 1, p


# ---------------------------------------------------------------------------
# sample_stratified_neyman_draw (batch 5)
# ---------------------------------------------------------------------------


def test_neyman_draw_matches_allocation_and_is_replayable(spark, sf_dir):
    all_queries()
    alloc = {
        r.source: r.alloc
        for r in REGISTRY["sample_neyman_allocation"].fn(spark, sf_dir).collect()
    }
    draw1 = REGISTRY["sample_stratified_neyman_draw"].fn(spark, sf_dir).collect()
    draw2 = REGISTRY["sample_stratified_neyman_draw"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, draw1)) == sorted(map(tuple, draw2))  # replayable
    for r in draw1:
        assert r.n_target == alloc[r.source]
        assert r.n_drawn == min(r.n_target, r.n_drawn)  # never exceeds target
        assert r.n_drawn <= r.n_target


# ---------------------------------------------------------------------------
# events_adstock_decay (batch 5)
# ---------------------------------------------------------------------------


def test_adstock_matches_bruteforce_convolution(spark, sf_dir):
    all_queries()
    daily = sorted(
        (r.d, r.y)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
        .collect()
    )
    decay = [round(1e6 * 0.7**k) for k in range(8)]
    ys = [y for _, y in daily]
    ad = [
        sum(ys[t - k] * decay[k] for k in range(8) if t - k >= 0)
        for t in range(len(ys))
    ]
    r = REGISTRY["events_adstock_decay"].fn(spark, sf_dir).collect()[0]
    assert r.n_days == len(ys)
    assert r.raw_sum_centi == sum(ys)
    assert r.adstock_sum_centi == sum(ad) // 1000000
    assert r.adstock_peak_centi == max(ad) // 1000000


# ---------------------------------------------------------------------------
# sim_ivf_probe_curve (batch 6)
# ---------------------------------------------------------------------------


def test_probe_curve_recall_monotone_and_bounded(spark, sf_dir):
    all_queries()
    rows = REGISTRY["sim_ivf_probe_curve"].fn(spark, sf_dir).collect()
    assert [r.n_probe for r in rows] == [1, 2, 4]
    recalls = [r.recall_micro for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:], strict=False)), recalls
    assert all(0 <= r <= 1_000_000 for r in recalls)
    # at sf0.001 one probe already recalls ~96% — strict improvement is a
    # data property, monotonicity is the operator law; require only that
    # the curve reaches at least the single-probe recall and stays sane
    assert recalls[-1] >= recalls[0]


# ---------------------------------------------------------------------------
# corpus_heaps_fit (batch 6)
# ---------------------------------------------------------------------------


def test_heaps_beta_sane_on_fixture_and_zero_on_closed_vocab(spark, sf_dir, tmp_path):
    all_queries()
    r = REGISTRY["corpus_heaps_fit"].fn(spark, sf_dir).collect()[0]
    assert r.n_points >= 2
    # the synthetic fixture corpus has a CLOSED vocabulary (a few dozen
    # types, all present by the first decile) -> beta is exactly 0 there;
    # the open-vocabulary growth case is asserted below on built data
    assert 0.0 <= r.beta_r6 <= 1.05, r
    # open vocabulary: word r appears ~2048/r times, shuffled across docs
    import os

    words = []
    for rank in range(1, 513):
        words += [f"w{rank}"] * (2048 // rank + 1)
    rng = random.Random(3)
    rng.shuffle(words)
    docs2, chunk = [], 200
    for i in range(0, len(words), chunk):
        docs2.append((i // chunk, " ".join(words[i : i + chunk]), "en", "syn", chunk))
    df2 = spark.createDataFrame(
        docs2, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out2 = str(tmp_path / "heaps_open")
    df2.write.mode("overwrite").parquet(f"{out2}/documents.parquet")
    for tname in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src_p = f"/root/testdata/sf0.001/{tname}.parquet"
        if os.path.exists(src_p):
            spark.read.parquet(src_p).limit(0).write.mode("overwrite").parquet(f"{out2}/{tname}.parquet")
    ro = REGISTRY["corpus_heaps_fit"].fn(spark, out2).collect()[0]
    assert 0.05 < ro.beta_r6 <= 1.05, ro
    # closed vocabulary: every doc uses the same 5 words -> beta ~ 0
    import os

    docs = [(i, "alpha beta gamma delta epsilon " * 10, "en", "s", 50) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "heaps")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for tname in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src = f"/root/testdata/sf0.001/{tname}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{tname}.parquet")
    rc = REGISTRY["corpus_heaps_fit"].fn(spark, out).collect()[0]
    assert abs(rc.beta_r6) < 0.02, rc


# ---------------------------------------------------------------------------
# feat_best_split_gini (batch 6)
# ---------------------------------------------------------------------------


def test_best_split_finds_planted_perfect_separator(spark, tmp_path):
    """Classes perfectly separated at a known threshold: the split
    search must find it with impurity 0, below the baseline."""
    all_queries()
    from cassandra_syncer_spark.queries.analytics_r8f import feat_best_split_gini
    import os

    rows = []
    for i in range(300):
        price = 50.0 + (i % 100)  # 50..149 -> class 0
        rows.append((i, 1, "O", price, "1995-01-01", "1-URGENT", "c", 0, "x"))
    for i in range(300, 500):
        price = 500.0 + (i % 100)  # 500..599 -> class 1 ('F')
        rows.append((i, 1, "F", price, "1995-01-01", "1-URGENT", "c", 0, "x"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate string, o_orderpriority string, o_clerk string,"
        " o_shippriority long, o_comment string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out = str(tmp_path / "split")
    df.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    for tname in ["region", "nation", "customer", "supplier", "part", "lineitem", "events", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{tname}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{tname}.parquet")
    r = feat_best_split_gini(spark, out).collect()[0]
    assert r.impurity_micro == 0, r
    assert 14900 <= r.threshold_centi < 50000, r  # boundary in the gap
    assert (r.n_left, r.n_right) == (300, 200)
    assert r.baseline_micro > 0


def test_best_split_matches_bruteforce_on_random_frame(spark, tmp_path):
    all_queries()
    from cassandra_syncer_spark.queries.analytics_r8f import feat_best_split_gini
    import os

    rng = random.Random(41)
    rows = []
    for i in range(400):
        price = rng.choice([10.0, 20.0, 30.0, 40.0, 50.0]) + rng.random()
        status = "F" if (price > 30 and rng.random() < 0.8) or rng.random() < 0.1 else "O"
        rows.append((i, 1, status, price, "1995-01-01", "1-URGENT", "c", 0, "x"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " o_orderdate string, o_orderpriority string, o_clerk string,"
        " o_shippriority long, o_comment string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    out = str(tmp_path / "split2")
    df.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    for tname in ["region", "nation", "customer", "supplier", "part", "lineitem", "events", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{tname}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{tname}.parquet")
    got = feat_best_split_gini(spark, out).collect()[0]

    data = sorted((round(100 * p), 1 if s == "F" else 0) for _, _, s, p, *_ in rows)
    n = len(data)
    pos = sum(y for _, y in data)
    vals = sorted({v for v, _ in data})
    best = None
    nl = posl = 0
    from collections import Counter

    cnt = Counter()
    posc = Counter()
    for v, y in data:
        cnt[v] += 1
        posc[v] += y
    for v in vals:
        nl += cnt[v]
        posl += posc[v]
        if nl == 0 or nl == n:
            continue
        imp = (2000000 * posl * (nl - posl)) // (nl * n) + (
            2000000 * (pos - posl) * ((n - nl) - (pos - posl))
        ) // ((n - nl) * n)
        cand = (imp, v)
        if best is None or cand < best:
            best = cand
    assert (got.impurity_micro, got.threshold_centi) == best, (got, best)


# ---------------------------------------------------------------------------
# stream_sliding_topk (batch 7)
# ---------------------------------------------------------------------------


def test_sliding_topk_windows_cover_span_and_counts_bound(spark, sf_dir):
    all_queries()
    rows = REGISTRY["stream_sliding_topk"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    assert rows
    starts = [r.window_start_sec for r in rows]
    assert starts == sorted(starts)
    assert all(s % 1800 == 0 for s in starts)
    # each window's top count is at most the events in that hour
    assert all(0 < r.n_events <= n for r in rows)


# ---------------------------------------------------------------------------
# scan_text_lines (batch 7)
# ---------------------------------------------------------------------------


def test_text_lines_roundtrip_conserves_counts(spark, sf_dir):
    all_queries()
    rows = REGISTRY["scan_text_lines"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    assert sum(r.n_lines for r in rows) == ev.count()


# ---------------------------------------------------------------------------
# events_ratio_metric_ci (batch 7)
# ---------------------------------------------------------------------------


def test_ratio_ci_matches_numpy_delta_method(spark, sf_dir):
    all_queries()
    u = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("x"),
            F.sum(
                F.when(
                    F.col("value").isNotNull(),
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    xs = [r.x for r in u]
    ys = [r.y for r in u]
    n = len(xs)
    R = sum(ys) / sum(xs)
    mx = sum(xs) / n
    cyy = sum((y - sum(ys) / n) ** 2 for y in ys)
    cxx = sum((x - mx) ** 2 for x in xs)
    cxy = sum((x - mx) * (y - sum(ys) / n) for x, y in zip(xs, ys, strict=True))
    var_num = (cyy - 2 * R * cxy + R * R * cxx) / (n - 1)
    se = math.sqrt(max(var_num, 0.0)) * math.sqrt(n) / sum(xs)
    r = REGISTRY["events_ratio_metric_ci"].fn(spark, sf_dir).collect()[0]
    assert r.n_users == n
    assert abs(r.ratio_r6 - R / 100) < 1e-6
    assert abs(r.se_r6 - se / 100) < 1e-5, (r.se_r6, se / 100)
    assert r.ci_lo_r6 <= r.ratio_r6 <= r.ci_hi_r6


# ---------------------------------------------------------------------------
# events_anomaly_seasonal_adjusted (batch 8)
# ---------------------------------------------------------------------------


def test_seasonal_anomaly_flags_planted_spike_not_weekly_rhythm(spark, tmp_path):
    """A strong weekly pattern plus one planted spike: the raw-series
    3-MAD rule would flag rhythm days; the adjusted rule flags exactly
    the spike."""
    all_queries()
    import datetime, os

    pattern = [5000, -3000, 0, 2000, -1000, -2000, -1000]
    rows, eid = [], 0
    d0 = datetime.date(2024, 1, 1)
    for day in range(42):
        d = d0 + datetime.timedelta(days=day)
        dow = (d - datetime.date(1970, 1, 1)).days % 7
        centi = 100000 + pattern[dow] + (9 if day % 3 == 0 else -7)  # tiny noise
        if day == 20:
            centi += 70000  # the planted spike
        rows.append((eid, f"{d} 12:00:00", 1, "view", centi / 100.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = str(tmp_path / "sanom")
    df.write.mode("overwrite").parquet(f"{out}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "documents", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    r = REGISTRY["events_anomaly_seasonal_adjusted"].fn(spark, out).collect()[0]
    # the spike distorts trend/seasonal slightly so neighbours can edge
    # over the line; the spike itself MUST be flagged and dominate
    assert r.n_anomalies >= 1, r
    assert r.max_abs_resid_centi > 40000, r  # the spike's residual survives adjustment
    assert r.n_days_scored == 42 - 6  # edges without a full 7-day window drop


# ---------------------------------------------------------------------------
# mix_kl_divergence_target (batch 8)
# ---------------------------------------------------------------------------


def test_kl_zero_on_exact_target_mix_and_positive_off_target(spark, tmp_path):
    all_queries()
    import os

    # exact uniform 20-source mix -> p_micro = 50000 = target -> KL 0
    docs = [(i, "x", "en", f"src{i % 20}", 1) for i in range(2000)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "klu")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    r = REGISTRY["mix_kl_divergence_target"].fn(spark, out).collect()[0]
    assert r.kl_micro == 0 and r.max_share_gap_micro == 0, r
    # skewed mix -> positive KL
    docs2 = [(i, "x", "en", "src0" if i % 2 == 0 else f"src{i % 20}", 1) for i in range(2000)]
    df2 = spark.createDataFrame(docs2, "doc_id long, text string, lang string, source string, n_chars long")
    out2 = str(tmp_path / "kls")
    df2.write.mode("overwrite").parquet(f"{out2}/documents.parquet")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "embeddings"]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).write.mode("overwrite").parquet(f"{out2}/{t}.parquet")
    r2 = REGISTRY["mix_kl_divergence_target"].fn(spark, out2).collect()[0]
    assert r2.kl_micro > 0 and r2.max_share_gap_micro > 100000, r2
