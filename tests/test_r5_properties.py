"""Property tests for round-5 primitives over seeded random frames
(SURVEY.md §5.4): bitmap distinct vs exact, z-order locality on random
keys, full-outer reconciliation partition law, and PageRank mass bounds.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_bitmap_distinct_equals_countdistinct_random(spark):
    """The (bucket, bit_or) partial pattern must equal count(DISTINCT)
    on random key/id frames, including duplicate-heavy and single-key
    layouts and ids straddling many 64-wide buckets."""
    rng = random.Random(11)
    for trial in range(3):
        rows = [
            (f"k{rng.randrange(1, 4)}", rng.randrange(0, 500))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "key string, uid long")
        got = {
            r.key: r.n
            for r in (
                df.select(
                    "key",
                    (F.col("uid") / 64).cast("long").alias("bucket"),
                    F.expr("shiftleft(1L, int(uid % 64))").alias("bit"),
                )
                .groupBy("key", "bucket")
                .agg(F.expr("bit_or(bit)").alias("bm"))
                .groupBy("key")
                .agg(F.sum(F.bit_count("bm")).cast("long").alias("n"))
            ).collect()
        }
        want = {
            r.key: r.n
            for r in df.groupBy("key").agg(F.countDistinct("uid").alias("n")).collect()
        }
        assert got == want, trial


def test_full_outer_reconcile_partition_law(spark):
    """Full-outer reconciliation statuses must PARTITION the key union:
    n_both + n_only_stored + n_only_live == |stored ∪ live|, and the
    both-count equals |stored ∩ live| — on random subsets."""
    rng = random.Random(13)
    keys = list(range(200))
    stored = {k for k in keys if rng.random() < 0.6}
    live = {k for k in keys if rng.random() < 0.6}
    s = spark.createDataFrame([(k,) for k in stored], "k long").alias("s")
    l = spark.createDataFrame([(k,) for k in live], "k long").alias("l")
    joined = s.join(l, F.col("s.k") == F.col("l.k"), "full_outer")
    status = (
        F.when(F.col("s.k").isNull(), "only_live")
        .when(F.col("l.k").isNull(), "only_stored")
        .otherwise("both")
    )
    got = {
        r.status: r.n
        for r in joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got.get("both", 0) == len(stored & live)
    assert got.get("only_stored", 0) == len(stored - live)
    assert got.get("only_live", 0) == len(live - stored)
    assert sum(got.values()) == len(stored | live)


def test_pagerank_scores_bounded_and_complete(spark, sf_dir):
    """graph_pagerank invariants: every graph node gets exactly one
    score; every score >= the damping floor (150000); total mass never
    exceeds nodes x 1e6 (integer division only loses mass, never
    creates it)."""
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs, graph_pagerank

    scores = graph_pagerank(spark, sf_dir).collect()
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    nodes = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert {r.doc_id for r in scores} == nodes
    assert all(r.score_micro >= 150_000 for r in scores)
    assert sum(r.score_micro for r in scores) <= len(nodes) * 1_000_000


def test_zorder_interleave_bijective_on_random_keys(spark):
    """The Morton interleave must be a bijection on (pa, sb) in
    [0,256)^2 — decoding the z-value recovers both dims exactly."""
    from cassandra_syncer_spark.queries.analytics_r5e import _z_expr

    rng = random.Random(17)
    rows = [(rng.randrange(0, 256), rng.randrange(0, 256)) for _ in range(300)]
    df = spark.createDataFrame(rows, "pa long, sb long")
    z = df.select("pa", "sb", F.expr(_z_expr("pa", "sb", duck=False)).alias("zval"))
    # decode: even bits -> pa, odd bits -> sb
    dec_a = " + ".join(
        f"(shiftleft(shiftright(zval, {2 * i}) & 1, {i}))" for i in range(8)
    )
    dec_b = " + ".join(
        f"(shiftleft(shiftright(zval, {2 * i + 1}) & 1, {i}))" for i in range(8)
    )
    bad = z.filter(
        (F.expr(dec_a) != F.col("pa")) | (F.expr(dec_b) != F.col("sb"))
    ).count()
    assert bad == 0


def test_all_queries_survive_empty_tables(spark, tmp_path):
    """Robustness law: every registered query must execute cleanly on
    EMPTY input tables (same schemas, zero rows) — empty partitions,
    empty days, and empty sources are routine at 100 TB, and an engine
    that throws on them fails its operators' composability.  Guards this
    round's fixes: explicit-schema read-back on partitioned sinks,
    MLlib fit guards, division-by-zero in ratio reports."""
    import os

    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import FIXTURE_TABLES

    all_queries()
    out = str(tmp_path / "empty_sf")
    os.makedirs(out, exist_ok=True)
    for t in FIXTURE_TABLES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
    failures = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, out).collect()
        except Exception as e:  # noqa: BLE001 — collecting all offenders
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)


def test_order_sensitive_queries_partition_invariant(spark, sf_dir):
    """Determinism law behind the driver's value hash: results must not
    depend on the shuffle partition count.  Exercises the query shapes
    where partition layout COULD leak into results — collect_list,
    hash-quota sampling, ntile, window top-k, greedy packing — under
    shuffle_partitions=3 vs the default."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    names = [
        "agg_string_agg",
        "agg_collect_snapshot",
        "sample_reservoir_perkey",
        "sample_stratified_exact",
        "sample_negative_pairs",
        "sample_hash",
        "mix_temperature_sampling",
        "mix_sample_weighted",
        "split_train_valid_test",
        "shard_pack_tokens",
        "win_ntile_bucket",
        "events_rfm_segmentation",
        "agg_weighted_median",
        # round-7 selection/windowed ops
        "sample_balanced_classes",
        "sample_balanced_threshold",
        "win_rolling_median",
        "win_rolling_slope",
        "graph_common_neighbors",
        # round-7 batch 11-18: collect_list folds, rank windows, greedy
        # selection, file-splitting sinks — every place partition layout
        # COULD leak into values
        "sim_mmr_rerank",
        "graph_kcore",
        "graph_bfs_hops",
        "tokenizer_bpe_pair_step",
        "dedup_candidate_degree_hist",
        "dedup_keep_best_quality",
        "agg_mannwhitney_u",
        "agg_spearman_corr",
        "sink_nested_struct_roundtrip",
        "sink_max_records_per_file",
        "events_peak_concurrency",
        "win_rolling_corr",
        # round-7 batch 20: journey collect_list fold, stacked running
        # windows with tie-broken ordering, banded pair self-join
        "events_pattern_match",
        "events_max_drawdown",
        "dedup_media_chunkhash",
        # batch 21: rank windows + broadcast-rank ANN
        "sample_systematic_stride",
        "sim_pq_adc_topk",
        # batch 22: bounded-frame collect, file-splitting sink layout,
        # snapshot windows
        "win_hampel_filter",
        "scan_file_metadata_audit",
        "events_bitemporal_correction",
    ]

    def rows(name):
        return sorted(
            tuple(str(x) for x in r) for r in REGISTRY[name].fn(spark, sf_dir).collect()
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {n: rows(n) for n in names}
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        for n in names:
            assert rows(n) == baseline[n], f"{n}: result depends on partition count"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
