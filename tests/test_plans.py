"""Plan-shape regression tests — the 100 TB posture, asserted.

These fail if a future edit silently loses predicate pushdown, column
pruning, broadcast joins, top-k short-circuit, or whole-stage codegen —
regressions that are invisible at fixture scale but fatal at 100 TB.
"""

from __future__ import annotations

import pytest

from cassandra_syncer_spark.registry import REGISTRY, all_queries


@pytest.fixture(scope="module", autouse=True)
def _load():
    all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_columns(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_parquet")
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>" in p


def test_filters_push_to_parquet(spark, sf_dir):
    p = plan_of(spark, sf_dir, "scan_glob_filter")
    assert "StringStartsWith(p_type,PROMO)" in p
    assert "Not(StringContains" in p

    p = plan_of(spark, sf_dir, "agg_group_sum")
    assert "LessThanOrEqual(l_shipdate" in p  # shipdate predicate reaches the scan


def test_dimension_joins_broadcast(spark, sf_dir):
    for name, min_bc in [
        ("join_inner_hash", 2),
        ("join_multiway", 4),
        ("join_semi_manifest", 1),
    ]:
        p = plan_of(spark, sf_dir, name)
        assert p.count("BroadcastHashJoin") >= min_bc, f"{name} lost broadcast"
        assert "SortMergeJoin" not in p, f"{name} fell back to sort-merge at fixture scale"


def test_topk_short_circuits(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, "topk_limit")


def test_flagship_stays_in_codegen(spark, sf_dir):
    # '*(n)' prefixes mark whole-stage-codegen stages; with AQE the final
    # plan only materializes after THIS dataframe's own execution (a .write
    # would spawn a separate query execution), so force via collect
    df = REGISTRY["agg_group_sum"].fn(spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in p
    assert "*(" in p, "flagship aggregation fell out of whole-stage codegen"


def test_banded_range_join_is_equi_large_x_large(spark, sf_dir):
    """The banded rewrite must stay an equi join even when NOTHING is
    broadcast-able — the large×large posture.  With auto-broadcast
    disabled the plan must contain a shuffle-based equi join (sort-merge
    or shuffled-hash) and no BroadcastNestedLoopJoin/CartesianProduct."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "join_range_banded")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in p, "banded join fell back to BNLJ"
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p), p
    # and the non-banded theta query IS the nested-loop shape (dimension-
    # sized side broadcast) — the two queries document the two regimes
    p_theta = plan_of(spark, sf_dir, "join_theta_range")
    assert "BroadcastNestedLoopJoin" in p_theta


def test_banded_anti_join_is_equi_large_x_large(spark, sf_dir):
    """The banded ANTI (prune) flow must also survive large×large: equi
    anti join on the band key, range residual inside the join — no BNLJ
    even with broadcast disabled."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "join_range_banded_anti")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in p, "banded anti fell back to BNLJ"
    assert "CartesianProduct" not in p
    assert "LeftAnti" in p, p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p), p


def test_interval_overlap_is_prefix_sum_not_pair_join(spark, sf_dir):
    """join_interval_overlap (round-7 prefix-sum rewrite) must never
    materialize overlap pairs: the lineitem side joins ONLY the broadcast
    cumulative histograms — the plan carries broadcast hash joins for the
    two date-keyed lookups, no cartesian product, and no band-explode
    generator feeding a join (the round-3 pair-join shape this replaced,
    measured 40.5 s vs 2.1 s at sf0.1)."""
    p = plan_of(spark, sf_dir, "join_interval_overlap")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p, "histogram lookups must stay broadcast"
    # the old form exploded each interval into covered bands and joined on
    # the band id; the only generator allowed now is the day-calendar
    # sequence (a dimension build), never an explode on the lineitem side
    assert p.count("Generate explode") <= 1, p


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    """The hive-partitioned read-back must push the partition predicate
    into PartitionFilters (directory-level pruning — the non-'R'
    partitions are never listed into the scan), not just DataFilters."""
    p = plan_of(spark, sf_dir, "sink_partitioned_prune")
    assert "PartitionFilters" in p
    assert "l_returnflag" in p.split("PartitionFilters", 1)[1][:200], p


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    """Both sides bucketed on the join key: the sort-merge join must
    consume the bucket layout directly — no shuffle exchange on either
    join input (the only hashpartitioning exchange left is the small
    post-join aggregation)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "join_bucketed_colocated")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in p, p
    assert "Exchange hashpartitioning(l_orderkey" not in p, "left side shuffled"
    assert "Exchange hashpartitioning(o_orderkey" not in p, "right side shuffled"
    # bucketed scans are visible in the plan
    assert "Bucketed: true" in p, p


def test_winsorize_broadcasts_cuts(spark, sf_dir):
    """feat_winsorize's clamp pass must broadcast the per-group cuts
    table back onto the corpus — a shuffled join here would re-shuffle
    the full fact for a group-count-sized dimension."""
    p = plan_of(spark, sf_dir, "feat_winsorize")
    assert "BroadcastHashJoin" in p, p


def test_range_interval_single_shuffle(spark, sf_dir):
    """The trailing-hour RANGE frame is one shuffle on user_id and a
    window over the sorted runs — no join anywhere in the plan (the
    naive self-join formulation would BNLJ)."""
    p = plan_of(spark, sf_dir, "win_range_interval")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_pii_scrub_is_shuffle_free(spark, sf_dir):
    """PII scrubbing is a pure per-row map — any Exchange in this plan
    means something is forcing a shuffle onto an embarrassingly parallel
    scan."""
    p = plan_of(spark, sf_dir, "text_pii_scrub")
    assert "Exchange" not in p, p
    # '*(n)' prefixes mark whole-stage-codegen stages in the string form
    assert "*(1)" in p, p


def test_runtime_bloom_filter_injects(spark, sf_dir):
    """Runtime bloom-filter pruning — the 100 TB shuffle-reduction lever:
    when one join side carries a selective filter, Spark builds a bloom
    filter from it at runtime and applies it to the big side's scan,
    shrinking shuffle input before the join.  Local fixtures sit under the
    default 10 GB application-side threshold, so the test lowers it to
    prove the rewrite fires on our join shape; at production scale the
    defaults trigger it with no code change (the engine never disables
    runtime filtering)."""
    from cassandra_syncer_spark.session import load_table
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_might_contain" in p.lower() or "bloomfilter" in p.lower(), p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Dynamic partition pruning — the partition-level counterpart of the
    bloom-filter test above: joining a hive-partitioned fact on its
    partition column against a filtered dimension must inject a
    dynamicpruningexpression into PartitionFilters, so only the
    dimension-selected partitions are listed and read.  At 100 TB this is
    the difference between scanning one date/flag partition and scanning
    the table."""
    from cassandra_syncer_spark.session import load_table
    from pyspark.sql import functions as F

    out = str(tmp_path / "dpp_fact")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .write.partitionBy("l_returnflag")
        .mode("overwrite")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("R", "returned"), ("N", "kept")], "flag string, label string"
    ).filter(F.col("label") == "returned")
    j = fact.join(dim, fact.l_returnflag == dim.flag).groupBy("flag").count()
    p = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in p.lower(), p


def test_tpch_r4_star_joins_broadcast_dims(spark, sf_dir):
    """q7/q8/q9: every dimension side must resolve to a broadcast hash
    join at fixture scale — a lost hint here means a full dim shuffle per
    join at 100 TB."""
    for name, min_bc in [
        ("q7_volume_shipping", 4),
        ("q8_market_share", 6),
        ("q9_product_profit", 3),
    ]:
        p = plan_of(spark, sf_dir, name)
        assert p.count("BroadcastHashJoin") >= min_bc, f"{name} lost dim broadcasts"


def test_q21_quantifiers_are_one_aggregation(spark, sf_dir):
    """q21's EXISTS/NOT-EXISTS are per-ORDER facts, so they must fold into
    ONE orderkey aggregation over a SINGLE pass of the lineitem⋈orders
    frame (round-9 rewrite).  The old semi/anti spelling re-derived that
    join three times — the sf10 sweep measured it trending adverse
    (1.06× at sf0.1 → 1.9× at sf10).  Laws: lineitem is scanned exactly
    once, no semi/anti self-joins survive, and nothing falls to a
    nested-loop over the fact."""
    p = plan_of(spark, sf_dir, "q21_late_suppliers")
    # physical scans print as 'FileScan parquet [...] ... Location: ...
    # lineitem.parquet' — count THOSE lines (the old 'Relation [l_orderkey'
    # pattern never occurs in executedPlan().toString(), so the law was
    # vacuously true; round-10 ADVICE fix)
    n_li_scans = sum(
        1 for ln in p.splitlines() if "FileScan" in ln and "lineitem" in ln
    )
    assert n_li_scans == 1, f"q21 scans lineitem {n_li_scans}x, not once"
    assert "LeftSemi" not in p and "LeftAnti" not in p, "q21 kept the self-join spelling"
    assert "BroadcastNestedLoopJoin" not in p, "q21 quantifier fell to nested-loop"


def test_q2_correlated_min_is_window(spark, sf_dir):
    """q2's per-part min-cost subquery must be a window min sharing the
    partkey partitioning — not a re-aggregated self-join of the cost
    frame (two shuffles + a join at scale)."""
    p = plan_of(spark, sf_dir, "q2_min_cost_supplier")
    assert "Window" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q11_threshold_is_scalar_broadcast(spark, sf_dir):
    """q11's fraction-of-total threshold must reach the per-part rows as
    a 1-row broadcast (BroadcastNestedLoopJoin over a single scalar row is
    the intended cheap shape), never a shuffled join or a second scan of
    lineitem."""
    p = plan_of(spark, sf_dir, "q11_important_stock")
    # val frame + its scalar agg = 2 physical lineitem scans, never a 3rd
    # (same FileScan-line counting as the q21 law — the old 'Relation ['
    # pattern was vacuous against executedPlan strings)
    n_li_scans = sum(
        1 for ln in p.splitlines() if "FileScan" in ln and "lineitem" in ln
    )
    assert n_li_scans <= 2, f"q11 scans lineitem {n_li_scans}x"


def test_simhash_pairs_join_not_bucket_materialization(spark, sf_dir):
    """dedup_simhash must expand candidate pairs via the bucket-local
    self-join, never a per-bucket collect_list (a hot band value would
    pack into ONE unbounded array row → single-task OOM at 100 TB).  The
    two join inputs are the identical banded subplan shuffled on the same
    key, so Spark must also plan the signature stage once (ReusedExchange
    on the other side — only visible in the post-execution AQE final
    plan, so force via collect like test_flagship_stays_in_codegen)."""
    df = REGISTRY["dedup_simhash"].fn(spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in p, "simhash pairs regressed to bucket materialization"
    assert "ReusedExchange" in p, "signature stage computed twice — exchange reuse lost"


def test_minhash_pairs_join_not_bucket_materialization(spark, sf_dir):
    """Same posture as the simhash test for the MinHash family: every
    query fed by ``_minhash_pairs`` must expand candidate pairs via the
    bucket-local self-join, never a per-bucket collect_list (agg_collect
    in the plan).  The banded subplan must also be planned once with a
    ReusedExchange for the join's other side."""
    for name in (
        "text_minhash_dedup",
        "dedup_cluster_components",
        "dedup_apply_clusters",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in p, f"{name} regressed to bucket materialization"
    # the pair front end itself: one signature pass, exchange reused
    df = REGISTRY["text_minhash_dedup"].fn(spark, sf_dir)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p, "minhash band stage computed twice — exchange reuse lost"


def test_contamination_prefilter_broadcasts_eval_grams(spark, sf_dir):
    """text_contamination_prefiltered: the eval gram side and the verify
    join-back must both be broadcasts (the corpus gram stream never
    shuffles on the prefilter key), and the plan must contain no
    BroadcastNestedLoopJoin — that's exactly the shape this query
    replaces."""
    p = plan_of(spark, sf_dir, "text_contamination_prefiltered")
    assert p.count("BroadcastHashJoin") >= 1, p
    assert "BroadcastNestedLoopJoin" not in p, "prefilter degenerated to the exact NL shape"
    # the retired exact demo IS the broadcast nested-loop (documented regime)
    from cassandra_syncer_spark.queries.analytics_r4 import (
        text_contamination_exact_demo,
    )

    p_exact = (
        text_contamination_exact_demo(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in p_exact


def test_verify_jaccard_no_cartesian_no_collect(spark, sf_dir):
    """dedup_verify_jaccard: candidates come from the minhash pair join
    (no collect_list bucket materialization) and the verify stage is
    equi-join only."""
    p = plan_of(spark, sf_dir, "dedup_verify_jaccard")
    assert "collect_list" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_nearest_join_is_one_window_no_joins(spark, sf_dir):
    """join_asof_nearest: both directions must ride ONE window sort
    (two frames over the same spec), with no join operator anywhere —
    a second Window or any *Join means the fused union+window shape
    regressed to a per-direction pass or a range join."""
    p = plan_of(spark, sf_dir, "join_asof_nearest")
    assert p.count("Window ") == 1, p
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "ShuffledHashJoin"):
        assert op not in p, f"join_asof_nearest grew a {op}:\n{p}"


def test_bigram_lm_count_tables_broadcast(spark, sf_dir):
    """corpus_bigram_lm_score: the bigram/prefix count tables are
    vocabulary-bounded and must join the token stream as broadcasts at
    fixture scale (hash joins at worst at 100 TB) — never a nested
    loop; the stream itself must not shuffle on doc_id more than once."""
    p = plan_of(spark, sf_dir, "corpus_bigram_lm_score")
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "BroadcastNestedLoopJoin" not in p


def test_chunk_dedup_is_pure_hash_agg(spark, sf_dir):
    """dedup_chunk_exact: chunk explode is scan-fused and identity is a
    hash agg — no joins, no windows, no collect_list buckets."""
    p = plan_of(spark, sf_dir, "dedup_chunk_exact")
    assert "Join" not in p and "Window" not in p and "collect_list" not in p, p


def test_no_cartesian_anywhere(spark, sf_dir):
    offenders = []
    for name in REGISTRY:
        p = plan_of(spark, sf_dir, name)
        if "CartesianProduct" in p:
            offenders.append(name)
    assert not offenders, f"cartesian product in: {offenders}"


def _split_inside_lambda(p: str) -> bool:
    """True if any higher-order-function lambda in the plan re-evaluates
    split() per element — Spark performs no common-subexpression
    elimination across lambda boundaries, so `transform(seq, i ->
    f(split(text), i))` re-splits the document for EVERY element:
    O(tokens²) per doc, measured 9× slower on the gram kernel at sf0.1
    (SCALING.md round-5 lesson).  Project the array first instead."""
    i = 0
    while True:
        j = p.find("lambdafunction(", i)
        if j < 0:
            return False
        k = j + len("lambdafunction(")
        depth = 1
        while k < len(p) and depth:
            if p[k] == "(":
                depth += 1
            elif p[k] == ")":
                depth -= 1
            k += 1
        if "split(" in p[j:k]:
            return True
        i = k


def test_no_split_inside_lambda(spark, sf_dir):
    offenders = []
    for name in REGISTRY:
        p = plan_of(spark, sf_dir, name)
        if _split_inside_lambda(p):
            offenders.append(name)
    assert not offenders, f"split() re-evaluated inside a lambda in: {offenders}"


def test_q5_star_join_broadcasts_dims(spark, sf_dir):
    # region/nation/supplier broadcast by hint; customer is unhinted so
    # Catalyst/AQE is free to pick SMJ when it outgrows the threshold —
    # at fixture scale everything resolves to broadcast and the only
    # shuffle is lineitem ⋈ orders + the final agg
    p = plan_of(spark, sf_dir, "q5_local_volume")
    assert p.count("BroadcastHashJoin") >= 4, "q5 lost dimension broadcast"
    assert "CartesianProduct" not in p


def test_q19_disjunction_pushes_per_side_conjuncts(spark, sf_dir):
    # the OR-of-ANDs must split: the quantity-only disjunction reaches the
    # lineitem scan and the brand/size disjunction reaches the part scan,
    # so the join sees pre-pruned inputs (the Q19 benchmark property)
    p = plan_of(spark, sf_dir, "q19_disjunctive_pushdown")
    assert "OR ((l_quantity#" in p, "quantity disjunction not pushed to lineitem scan"
    assert "= Brand#12)" in p and "p_size#" in p, "brand/size disjunction not pushed to part scan"


def test_q10_q18_topk_short_circuit(spark, sf_dir):
    for name in ["q10_returned_items", "q18_large_orders"]:
        assert "TakeOrderedAndProject" in plan_of(spark, sf_dir, name), name


def test_tpch_batch4_plan_shapes(spark, sf_dir):
    # q13: left outer keeps zero-order customers, no cartesian
    p = plan_of(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in p or "BroadcastHashJoin LeftOuter".lower() in p.lower()
    # q16/q22: exclusion must be an anti join, not a filter over a cross
    assert "LeftAnti" in plan_of(spark, sf_dir, "q16_supplier_part_counts")
    assert "LeftAnti" in plan_of(spark, sf_dir, "q22_dormant_customers")
    # q15: the view's max must come back as a broadcast — Catalyst turns the
    # equality filter into an equi BroadcastHashJoin on the 1-row max
    p15 = plan_of(spark, sf_dir, "q15_top_supplier")
    assert p15.count("BroadcastHashJoin") >= 2 and "CartesianProduct" not in p15
    # q17: the decorrelated per-part agg must not produce a cartesian
    assert "CartesianProduct" not in plan_of(spark, sf_dir, "q17_small_quantity_revenue")


def test_bloom_prefilter_filters_before_broadcast_semi(spark, sf_dir):
    """join_bloom_prefilter: the bloom predicate must sit scan-side
    (a Filter containing the md5 probe below the join), and the exact
    join must be a broadcast LEFT SEMI — never a shuffle of the fact."""
    p = plan_of(spark, sf_dir, "join_bloom_prefilter")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    assert "SortMergeJoin" not in p
    j = p.find("BroadcastHashJoin")
    assert "md5" in p[j:], "bloom probe filter lost below the semi join"


def test_hamming_ann_broadcasts_probes(spark, sf_dir):
    """sim_hamming_ann: probe side broadcast (BNLJ on the != predicate);
    the corpus scan reads only vec_id + embedding."""
    p = plan_of(spark, sf_dir, "sim_hamming_ann")
    assert "BroadcastNestedLoopJoin" in p, p
    assert p.count("ReadSchema: struct<vec_id:bigint,embedding") >= 1, p


def test_bitmap_distinct_has_no_expand(spark, sf_dir):
    """agg_distinct_bitmap: the whole point is avoiding the
    count(DISTINCT) Expand — the plan must be two plain hash aggregates
    with a partial bit_or combine, no Expand node."""
    p = plan_of(spark, sf_dir, "agg_distinct_bitmap")
    assert "Expand" not in p, p
    assert "partial_bit_or" in p or "bit_or" in p, p
    assert p.count("HashAggregate") >= 4, p  # partial+final per stage


def test_reservoir_perkey_single_hash_exchange(spark, sf_dir):
    """sample_reservoir_perkey: exactly one hash shuffle (on the key);
    the final orderBy adds a range exchange but nothing else."""
    p = plan_of(spark, sf_dir, "sample_reservoir_perkey")
    assert p.count("hashpartitioning") == 1, p


def test_embed_simhash_banded_join_carries_codes_not_vectors(spark, sf_dir):
    """dedup_embed_simhash: the banded candidate join must touch only
    8-byte codes — the 256-byte float vectors join back in for surviving
    candidates only (the 32x shuffle-width saving at 100 TB)."""
    p = plan_of(spark, sf_dir, "dedup_embed_simhash")
    assert "CartesianProduct" not in p
    assert "band_id" in p and "band_val" in p
    # vectors appear only in the two post-candidate hash joins by vec_id
    assert p.count("embedding") >= 2  # the verify-side scans


def test_sliding_distinct_no_expand_no_fact_rescan(spark, sf_dir):
    """win_sliding_distinct: one events fold to bitmap partials (no
    count-DISTINCT Expand), pane fan-out over partials only — the events
    scan appears for partials + the tiny hours frame, never per pane."""
    p = plan_of(spark, sf_dir, "win_sliding_distinct")
    assert "Expand" not in p, p
    assert "bit_or" in p, p
    assert p.count("events.parquet") <= 2, p  # partials scan + hours scan


def test_zorder_stats_single_agg_no_joins(spark, sf_dir):
    """layout_zorder_cluster: plan-time shift/mask arithmetic fused into
    the scan, one tiny-key agg, no joins."""
    p = plan_of(spark, sf_dir, "layout_zorder_cluster")
    assert "Join" not in p, p
    assert p.count("hashpartitioning") == 1, p


def test_pq_quantize_scan_fused_no_joins(spark, sf_dir):
    """embed_pq_quantize: codebook folds in as literals — no joins, no
    hash shuffles; the only exchange is the final presentation sort."""
    p = plan_of(spark, sf_dir, "embed_pq_quantize")
    assert "Join" not in p, p
    assert p.count("hashpartitioning") == 0, p


def test_cooccurrence_lift_shrinks_before_pairing(spark, sf_dir):
    """events_cooccurrence_lift: the pair join's inputs are the distinct
    (user,type) AGGREGATE, never raw events — and the tiny count frames
    broadcast."""
    p = plan_of(spark, sf_dir, "events_cooccurrence_lift")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastExchange") >= 3, p  # ta, tb, n_users
    # the distinct (user,type) shrink exists: its hash agg + the pair
    # count + the two type counts + n_users => many HashAggregates
    assert p.count("HashAggregate") >= 6, p


def test_ngram_novelty_gram_keyed_shuffles_only(spark, sf_dir):
    """text_ngram_novelty in the large×large regime (broadcast disabled,
    the 100 TB shape): the join-back is a shuffle equi join on the gram
    hash, and total shuffle count stays bounded — distinct, the two
    gh-keyed join inputs, the final doc_id agg, nothing else."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "text_ngram_novelty")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert ("SortMergeJoin [gh" in p) or ("ShuffledHashJoin [gh" in p), p
    assert "CartesianProduct" not in p
    assert p.count("hashpartitioning") <= 5, p


def test_dau_wau_no_expand_no_fact_rescan(spark, sf_dir):
    """events_dau_wau: one bitmap fold serves all three horizons — no
    count-DISTINCT Expand from the distinct logic (the rollup-free kind),
    and the events scan appears at most twice (partials + the distinct
    days frame), never once per window length."""
    p = plan_of(spark, sf_dir, "events_dau_wau")
    assert "bit_or" in p, p
    assert p.count("events.parquet") <= 2, p


def test_gopher_gate_single_scan_no_shuffle(spark, sf_dir):
    """text_gopher_gate: all four rules fuse into the scan; the only
    exchange is the presentation sort."""
    p = plan_of(spark, sf_dir, "text_gopher_gate")
    assert "Join" not in p, p
    assert p.count("hashpartitioning") == 0, p


def test_interarrival_single_window_shuffle(spark, sf_dir):
    """events_interarrival_stats: one user_id hash exchange for the lag
    window; the percentile agg adds only the tiny-key exchange."""
    p = plan_of(spark, sf_dir, "events_interarrival_stats")
    assert p.count("hashpartitioning(user_id") == 1, p


def test_cume_dist_approx_windows_bins_not_rows(spark, sf_dir):
    """win_cume_dist_approx: the only Window must run over the binned
    HISTOGRAM aggregate (<=1024 counters per segment), never the row
    stream — the exact form's single-task per-segment sort is the scale
    hazard this query exists to remove.  Row-level dataflow reaches the
    output via broadcast joins only."""
    p = plan_of(spark, sf_dir, "win_cume_dist_approx")
    lines = p.splitlines()
    widx = [i for i, l in enumerate(lines) if "Window [" in l]
    assert len(widx) == 1, p
    below = "\n".join(lines[widx[0] : widx[0] + 4])
    assert "HashAggregate" in below, (
        "Window input is not the histogram aggregate:\n" + below
    )
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p


def test_sessionize_one_user_shuffle(spark, sf_dir):
    """events_sessionize_gap: the lag flag and the running session id must
    ride ONE user_id exchange + one sort (two Window operators stacked);
    the only other exchange is the 1-row global agg's SinglePartition."""
    p = plan_of(spark, sf_dir, "events_sessionize_gap")
    assert p.count("Window [") == 2, p
    assert p.count("Exchange hashpartitioning(user_id") == 1, p
    assert p.count("Sort [") == 1, p


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """join_dynamic_partition_prune: the fact scan's PartitionFilters must
    carry a dynamicpruningexpression injected from the filtered dim side —
    runtime pruning, not a static predicate."""
    p = plan_of(spark, sf_dir, "join_dynamic_partition_prune")
    assert "dynamicpruningexpression" in p.lower(), p
    assert "BroadcastHashJoin" in p, p


def test_minmax_prune_pushes_range_to_sorted_layout(spark, sf_dir):
    """scan_minmax_prune: the key-range predicate must reach the re-read
    parquet scan as footer-evaluable pushed filters (on the sorted layout
    these skip whole files/row groups), and the scan must read only the
    two projected columns."""
    p = plan_of(spark, sf_dir, "scan_minmax_prune")
    assert "GreaterThanOrEqual(o_orderkey,1000)" in p, p
    assert "LessThanOrEqual(o_orderkey,3000)" in p, p
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in p, p


def test_cohort_matrix_single_fact_scan(spark, sf_dir):
    """events_cohort_matrix: the cohort week must derive from the deduped
    user-week rows (min-window), never a second scan of events — the
    naive self-join form scans the fact twice."""
    p = plan_of(spark, sf_dir, "events_cohort_matrix")
    assert p.count("FileScan") == 1, p
    assert "Join" not in p, p
    assert p.count("Window [") == 1, p


def test_normalized_dedup_scan_fused_no_join(spark, sf_dir):
    """dedup_normalized / text_code_detect: one document scan, regex +
    hash fused into the scan projection, one grouping shuffle, no joins."""
    for name in ("dedup_normalized", "text_code_detect"):
        p = plan_of(spark, sf_dir, name)
        assert p.count("FileScan") == 1, (name, p)
        assert "Join" not in p, (name, p)
        assert "Generate" not in p, (name, p)  # no tokenize-explode


def test_variance_prune_one_dim_shuffle(spark, sf_dir):
    """embed_variance_prune: one posexplode, one dim-keyed aggregation
    shuffle with map-side partials; the rank window runs on |dims| rows
    behind a SinglePartition exchange (64 rows — free)."""
    p = plan_of(spark, sf_dir, "embed_variance_prune")
    assert p.count("Generate posexplode") == 1, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "partial_sum" in p, p
    assert "Join" not in p, p


def test_label_propagation_no_cartesian_bounded_rounds(spark, sf_dir):
    """graph_label_propagation: both rounds are node-keyed joins + per-node
    top-1 windows — no cartesian anywhere, exactly two vote windows, and
    the adjacency comes from the banded pair join (localCheckpoint scans),
    never a corpus self-join."""
    p = plan_of(spark, sf_dir, "graph_label_propagation")
    assert "CartesianProduct" not in p, p
    assert p.count("Window [row_number()") == 2, p
    # rank-1 vote selection short-circuits via WindowGroupLimit (top-1
    # kept per node map-side — never a full per-node sort materialized)
    assert "WindowGroupLimit" in p, p


def test_pca_power_broadcast_v_no_smj(spark, sf_dir):
    """embed_pca_power: the 64-row v vector must broadcast into both
    per-iteration joins (never a sort-merge against the exploded rows),
    the quantized (vec,dim) rows materialize ONCE (localCheckpoint —
    no re-explode per iteration), and nothing is cartesian except the
    1-row max-abs normalizer broadcast."""
    p = plan_of(spark, sf_dir, "embed_pca_power")
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p
    assert p.count("Generate") == 0, p  # explode happened once, pre-checkpoint


def test_survival_curve_single_scan_window_total(spark, sf_dir):
    """events_survival_curve: one fact scan; the grand total must be a
    window over the dimension-sized histogram, not an agg + crossJoin
    (which re-expands lineage into a second fact scan)."""
    p = plan_of(spark, sf_dir, "events_survival_curve")
    assert p.count("FileScan") == 1, p
    assert "Join" not in p, p
    assert p.count("Window [") == 2, p


def test_tokenizer_fertility_scan_fused(spark, sf_dir):
    """tokenizer_fertility: token counts are scan-fused split/regex
    lengths — no explode, no join, one grouping shuffle."""
    p = plan_of(spark, sf_dir, "tokenizer_fertility")
    assert p.count("FileScan") == 1, p
    assert "Generate" not in p, p
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_skyline_broadcast_prune_no_global_sort(spark, sf_dir):
    """select_pareto_skyline: the coarse prune bound joins back by
    BROADCAST (bucket-dim table), refinement windows are bucket-local,
    and the only SinglePartition exchange feeds the bucket-maxima
    cumulative window (dimension-sized) — never a corpus-wide sort."""
    p = plan_of(spark, sf_dir, "select_pareto_skyline")
    assert p.count("BroadcastHashJoin") == 1, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    # fact scans carry only the three projected columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double,o_orderdate" in p, p


def test_ab_srm_single_scan_two_aggs(spark, sf_dir):
    """sample_ab_srm: one events scan, the distinct + count pipeline is
    two hash aggs (map-side combined), chi-square is computed on the
    dimension-sized segment table — no joins, no windows."""
    p = plan_of(spark, sf_dir, "sample_ab_srm")
    assert p.count("FileScan") == 1, p
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_ks_test_prefix_sum_shape(spark, sf_dir):
    """agg_ks_test: the fact table is scanned ONCE (the distinct-value
    count table localCheckpoints; every branch — bounds, bucket
    partials, totals, ECDF walk — reads the checkpoint), the only
    windows are the dimension-sized bucket cumsum and the bucket-local
    running sums, and nothing is a sort-merge or cartesian join."""
    p = plan_of(spark, sf_dir, "agg_ks_test")
    assert p.count("FileScan") == 0, p  # fact consumed pre-checkpoint
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("Window [") == 2, p


def test_cuped_single_scan_single_row(spark, sf_dir):
    """events_uplift_cuped: one fact scan, one user-keyed agg shuffle,
    one single-row global agg — no joins, no windows."""
    p = plan_of(spark, sf_dir, "events_uplift_cuped")
    assert p.count("FileScan") == 1, p
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_boundary_overlap_hash_once_equi_join(spark, sf_dir):
    """dedup_boundary_overlap: heads/tails hash once (checkpoint; the
    tail→head self-join reads it twice, never re-scanning documents),
    and the join is a hash EQUI join on the gram hash — collision-
    bounded, not all-pairs."""
    p = plan_of(spark, sf_dir, "dedup_boundary_overlap")
    assert p.count("FileScan") == 0, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_substring_spans_single_corpus_shuffle(spark, sf_dir):
    """dedup_substring_spans: gram explode fuses into the scan stage (one
    FileScan, Generate before any exchange), exactly one corpus-sized
    exchange (the count window on the span key) plus the per-doc agg and
    final sort — no joins of any kind."""
    p = plan_of(spark, sf_dir, "dedup_substring_spans")
    assert p.count("FileScan") == 1, p
    assert "Join" not in p, p
    assert p.count("Window [") == 1, p
    assert p.count("Exchange hashpartitioning") == 2, p  # span window + doc agg


def test_cosine_histogram_broadcast_pair_expansion(spark, sf_dir):
    """embed_cosine_histogram: the sampled side broadcasts, so the pair
    expansion is a shuffle-free BroadcastNestedLoopJoin (the `<` pair
    condition is not an equi key) — never a cartesian of the full table
    or a sort-merge.  The modulus-deriving count scans are column-pruned
    to an empty ReadSchema (footer-count only)."""
    p = plan_of(spark, sf_dir, "embed_cosine_histogram")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "ReadSchema: struct<>" in p, p  # the count leg reads no columns


def test_cross_source_matrix_distinct_before_join(spark, sf_dir):
    """dedup_cross_source_matrix: distinct(span, source) collapses BEFORE
    the self-join (two aggregate legs feed the join), and the join is a
    hash EQUI join on the span — bucket-local, not all-pairs."""
    p = plan_of(spark, sf_dir, "dedup_cross_source_matrix")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_substring_cut_no_joins_shared_partitioning(spark, sf_dir):
    """dedup_substring_cut: detect + island merge + per-doc agg with NO
    joins; exactly two hash exchanges (span-key count window, then the
    doc key — the island windows and both doc-level aggs all reuse the
    doc partitioning)."""
    p = plan_of(spark, sf_dir, "dedup_substring_cut")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_ctr_wilson_single_agg_no_joins(spark, sf_dir):
    """events_ctr_wilson: one scan, one item-keyed agg exchange, scalar
    Wilson math — no joins, no windows."""
    p = plan_of(spark, sf_dir, "events_ctr_wilson")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_chi_square_windows_on_cell_table(spark, sf_dir):
    """agg_chi_square: ONE corpus-keyed exchange (the lang×source cell
    agg); all three marginal windows run on the dimension-sized cell
    table downstream of it — no joins, no second corpus shuffle.  The
    single-partition global-sum window is over O(|langs|·|sources|)
    rows, never the corpus."""
    p = plan_of(spark, sf_dir, "agg_chi_square")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_freq_spectrum_vocab_bounded(spark, sf_dir):
    """corpus_freq_spectrum: token explode is scan-side (Generate below
    the first exchange); two hash exchanges total (vocab agg, then the
    ≤~12-row decade agg); the global-share window runs on the decade
    table.  No joins anywhere."""
    p = plan_of(spark, sf_dir, "corpus_freq_spectrum")
    assert "Join" not in p, p
    assert "Generate" in p, p
    assert p.count("Exchange hashpartitioning") == 2, p
    # the explode feeds the first aggregate directly — no pre-explode shuffle
    assert p.index("Generate") > p.index("Exchange hashpartitioning"), p


def test_hourly_profile_combiner_friendly(spark, sf_dir):
    """events_hourly_profile: one scan, partial-agg before the exchange
    (the 168-cell key space makes map-side combine collapse each
    partition to ≤168 rows), distinct-user expand keyed on (cell,user).
    No joins, no windows."""
    p = plan_of(spark, sf_dir, "events_hourly_profile")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert "partial" in p.lower(), p  # map-side combine present


def test_kcore_rounds_materialized_join_free_tail(spark, sf_dir):
    """graph_kcore: each round's residual edge list is localCheckpoint-
    materialized, so the FINAL unioned counts plan reads three
    checkpointed tables — no joins, no lineage re-derivation (without
    the checkpoints the 3-round union re-derived the scan+distinct
    combinatorially: 78 exchanges; with them the tail plan holds six —
    the two distinct-count aggs per round)."""
    p = plan_of(spark, sf_dir, "graph_kcore")
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("Exchange hashpartitioning") <= 6, p


def test_mmr_broadcast_probe_single_fold(spark, sf_dir):
    """sim_mmr_rerank: stage 1 is the cosine-topk shape — probes
    broadcast against the corpus scan (BroadcastNestedLoopJoin on the
    non-equi q_id<>vec_id condition; the corpus NEVER shuffles for the
    join) — and the greedy fold is one projection over the per-probe
    candidate array: no per-step jobs, no UDF (no BatchEvalPython /
    ArrowEvalPython), no extra exchange beyond the probe-keyed top-C
    window + collect."""
    p = plan_of(spark, sf_dir, "sim_mmr_rerank")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "EvalPython" not in p, p


def test_anova_two_agg_cascade_no_joins(spark, sf_dir):
    """agg_anova_f: one source-keyed exchange (the group agg) + one
    single-partition exchange (the |sources|-row total agg) — the
    CUPED/stats_corr cascade shape.  No joins, no windows, partial
    aggregation present (map-side combine on the fact scan)."""
    p = plan_of(spark, sf_dir, "agg_anova_f")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Exchange SinglePartition") == 1, p
    assert "partial" in p.lower(), p


def test_langid_confusion_scan_fused_dimension_windows(spark, sf_dir):
    """text_langid_confusion: marker scoring is scan-fused (no Generate
    — the classifier filters the split array in place, never explodes),
    one corpus exchange to the cell table, P/R windows on the dimension
    table.  No joins."""
    p = plan_of(spark, sf_dir, "text_langid_confusion")
    assert "Join" not in p, p
    assert "Generate" not in p, p
    assert p.count("Exchange hashpartitioning") <= 3, p


def test_benford_digit_dimension_broadcast(spark, sf_dir):
    """agg_benford_digits: the 9-row digit dimension joins BROADCAST
    against the aggregated observation table (never a shuffle join), and
    the fact scan feeds one 9-key hash agg with map-side combine."""
    p = plan_of(spark, sf_dir, "agg_benford_digits")
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "partial" in p.lower(), p


def test_histogram_minmax_broadcast_not_window(spark, sf_dir):
    """agg_histogram_equiwidth: the min/max single-row agg comes back as
    a BROADCAST nested-loop against the value scan — NOT a global window
    (which would shuffle the whole fact table to one partition).  One
    bin-keyed hash exchange, map-side combined."""
    p = plan_of(spark, sf_dir, "agg_histogram_equiwidth")
    assert "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_bfs_hops_checkpointed_frontier_tail(spark, sf_dir):
    """graph_bfs_hops: frontiers and visited sets are checkpointed per
    hop, so the final 3-row union plan is three count-aggs over
    materialized tables — join-free, no lineage re-derivation."""
    p = plan_of(spark, sf_dir, "graph_bfs_hops")
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p


def test_bpe_pair_step_vocab_collapsed_first(spark, sf_dir):
    """tokenizer_bpe_pair_step: pair expansion runs over the FREQUENCY-
    COLLAPSED vocabulary (the word agg exchange comes before the pair
    Generate), never the raw token stream — a word occurring 1e9 times
    costs one row.  Two hash exchanges (vocab, pair counts); the top-k
    window runs on the alphabet²-bounded pair table."""
    p = plan_of(spark, sf_dir, "tokenizer_bpe_pair_step")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 2, p
    # token explode (first Generate) is scan-side; the PAIR Generate sits
    # above the vocab exchange — i.e. some Generate appears after the
    # first exchange in the plan tree string
    assert p.count("Generate") == 2, p


def test_hhi_two_agg_cascade(spark, sf_dir):
    """agg_hhi_concentration: (type,user) agg then type agg — two hash
    exchanges, no joins, no windows; partial aggregation on the scan."""
    p = plan_of(spark, sf_dir, "agg_hhi_concentration")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "partial" in p.lower(), p


def test_rolling_corr_one_shuffle_shared_sort(spark, sf_dir):
    """win_rolling_corr: ONE user-keyed exchange feeds both the lag
    window and the rolling-frame window (identical partitioning +
    ordering → Spark plans a single sort for both); the tracked-user
    filter reaches the parquet scan."""
    p = plan_of(spark, sf_dir, "win_rolling_corr")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Window") == 2, p
    assert "LessThan(user_id,5)" in p or "user_id#" in p, p


def test_dyn_overwrite_readback_single_agg(spark, sf_dir):
    """sink_dynamic_partition_overwrite: the read-back is one
    partition-discovering scan + one flag-keyed agg — no joins (the
    overwrite semantics live in the write path, proven by the oracle)."""
    p = plan_of(spark, sf_dir, "sink_dynamic_partition_overwrite")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_degree_hist_no_smj_no_cartesian(spark, sf_dir):
    """dedup_candidate_degree_hist: the banded self-join is the same
    bucket-local equi join as text_minhash_dedup (hash or broadcast,
    never sort-merge on the fixture, never cartesian); the only
    nested-loop is the 1-row×1-row zero-degree count join."""
    p = plan_of(spark, sf_dir, "dedup_candidate_degree_hist")
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastNestedLoopJoin") <= 1, p


def test_welch_two_agg_cascade(spark, sf_dir):
    """events_welch_ttest: user agg → single-row agg → scalar math; no
    joins, no windows, map-side combine present."""
    p = plan_of(spark, sf_dir, "events_welch_ttest")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Exchange SinglePartition") == 1, p


def test_max_records_sink_readback_single_agg(spark, sf_dir):
    """sink_max_records_per_file: read-back is one scan + one global agg
    (file-name projection then distinct counts) — no joins."""
    p = plan_of(spark, sf_dir, "sink_max_records_per_file")
    assert "Join" not in p, p


def test_assortativity_equi_joins_only(spark, sf_dir):
    """graph_degree_assortativity: edge list joins two node-bounded
    degree tables on equi keys (hash/broadcast, never cartesian or a
    nested loop); single-row finale."""
    p = plan_of(spark, sf_dir, "graph_degree_assortativity")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert p.count("Exchange SinglePartition") == 1, p


def test_mwu_value_domain_window(spark, sf_dir):
    """agg_mannwhitney_u: one corpus exchange (the per-distinct-value
    arm-count agg); the midrank prefix window and the finale run on the
    value-domain table.  No joins; map-side combine present."""
    p = plan_of(spark, sf_dir, "agg_mannwhitney_u")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "partial" in p.lower(), p


def test_sampled_duprate_no_joins_scan_filter(spark, sf_dir):
    """dedup_rate_sampled_estimate: the md5-mod sample filter sits in
    the scan stage (only sample rows reach the distinct agg); no joins,
    no windows."""
    p = plan_of(spark, sf_dir, "dedup_rate_sampled_estimate")
    assert "Join" not in p, p
    assert "Window" not in p, p


def test_nested_roundtrip_no_joins(spark, sf_dir):
    """sink_nested_struct_roundtrip: build is one order-keyed
    collect_list agg; read-back is a single scan + global agg over the
    nested column (the per-array fold is scan-side).  No joins."""
    p = plan_of(spark, sf_dir, "sink_nested_struct_roundtrip")
    assert "Join" not in p, p
    assert "Generate" not in p, p  # fold over items, no explode needed


def test_jackknife_single_pass(spark, sf_dir):
    """agg_jackknife_groups: ONE corpus exchange — all leave-one-out
    estimates come from group sums + a dimension-table window, never G
    re-aggregations.  No joins."""
    p = plan_of(spark, sf_dir, "agg_jackknife_groups")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "partial" in p.lower(), p


def test_drift_dim_keyed_agg(spark, sf_dir):
    """embed_drift_centroids: scan-side dim explode feeds one 64-key
    hash agg (map-side combine collapses partitions to ≤64 rows) + a
    single-row finale.  No joins, no windows."""
    p = plan_of(spark, sf_dir, "embed_drift_centroids")
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Generate" in p, p


def test_peak_concurrency_domain_windows(spark, sf_dir):
    """events_peak_concurrency: boundary deltas collapse to minute keys
    BEFORE the prefix window (the window input is the minute-domain
    table); the peak/argmin join is hash/broadcast on the domain table,
    never sort-merge or cartesian."""
    p = plan_of(spark, sf_dir, "events_peak_concurrency")
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("Window") == 2, p  # prefix sum planned once per join branch


def test_keep_best_no_cartesian_cluster_window(spark, sf_dir):
    """dedup_keep_best_quality: label join + quality join are equi
    joins; the keeper window partitions by component (cluster-bounded).
    No cartesian, no sort-merge on the fixture."""
    p = plan_of(spark, sf_dir, "dedup_keep_best_quality")
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_spearman_domain_rank_joins(spark, sf_dir):
    """agg_spearman_corr: midranks come from value-DOMAIN windows (two
    domain aggs), joined back on the value keys — no corpus-sized
    single-partition sort of rows; no cartesian."""
    p = plan_of(spark, sf_dir, "agg_spearman_corr")
    assert "CartesianProduct" not in p, p
    assert p.count("Window") == 2, p


def test_vocab_jaccard_distinct_before_join(spark, sf_dir):
    """text_jaccard_source_similarity: the (source, token) distinct
    collapses BEFORE the token self-join; size tables broadcast; no
    cartesian anywhere."""
    p = plan_of(spark, sf_dir, "text_jaccard_source_similarity")
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p


def test_acf_domain_collapse_first(spark, sf_dir):
    """events_autocorr_lags: ONE corpus-sized exchange (the minute agg);
    lag joins and per-lag sums run on the domain table; the only
    nested-loop is the broadcast 5-row lag dimension."""
    p = plan_of(spark, sf_dir, "events_autocorr_lags")
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_upsert_partitioned_readback_single_agg(spark, sf_dir):
    """merge_upsert_partitioned: the read-back is one partition-
    discovering scan + one status-keyed agg; merge semantics live in the
    write path (proven by the oracle).  No joins in the returned plan."""
    p = plan_of(spark, sf_dir, "merge_upsert_partitioned")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_kendall_grid_join_not_row_pairs(spark, sf_dir):
    """agg_kendall_tau: the pair join's inputs are the aggregated
    contingency CELLS (both join children contain the cell aggregate),
    never raw rows — the plan has exactly one corpus-sized exchange (the
    cell agg; reused for both sides and the tie tables)."""
    p = plan_of(spark, sf_dir, "agg_kendall_tau")
    assert "CartesianProduct" not in p or "BroadcastNestedLoopJoin" in p, p
    # the a.x < b.x non-equi join over ~550 cells broadcasts; row-level
    # inputs would show a SortMergeJoin over the fact table
    assert "SortMergeJoin" not in p, p


def test_pattern_match_single_event_exchange(spark, sf_dir):
    """events_pattern_match: the journey build is ONE user-keyed hash
    agg — the plan carries no joins at all, and the only exchanges are
    the user agg plus the |distinct match counts| histogram re-agg."""
    p = plan_of(spark, sf_dir, "events_pattern_match")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 2, p


def test_ols_fit_single_pass(spark, sf_dir):
    """agg_ols_fit: all six moments come from ONE scan + one hash agg
    (algebraic, map-side combined); the closed-form finale adds no
    second corpus pass and no join."""
    p = plan_of(spark, sf_dir, "agg_ols_fit")
    assert "Join" not in p, p
    assert p.count("Scan parquet") == 1, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_referential_audit_joins_stay_equi(spark, sf_dir):
    """audit_referential_integrity: every FK edge is a key-equi join
    between the child's fk-count agg and the parent key set — never a
    nested loop; the child agg shrinks row volume BEFORE each join
    (HashAggregate appears below the join in every branch)."""
    p = plan_of(spark, sf_dir, "audit_referential_integrity")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    # 4 edges: each has a full-outer equi join (SMJ at fixture stats is
    # fine — full outer can't broadcast both sides)
    n_joins = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
    assert n_joins == len(
        __import__(
            "cassandra_syncer_spark.queries.analytics_r7t", fromlist=["_EDGES"]
        )._EDGES
    ), p


def test_drawdown_windows_share_one_shuffle(spark, sf_dir):
    """events_max_drawdown: the running sum, the running peak, and the
    per-user agg all reuse ONE user_id partitioning — a single
    corpus-sized exchange, one Window stage, and a TakeOrderedAndProject
    top-k (never a global sort)."""
    p = plan_of(spark, sf_dir, "events_max_drawdown")
    assert p.count("Exchange hashpartitioning") == 1, p
    # two Window operators (running sum, running peak) but ONE sort —
    # they stack on the same partitioning/ordering with no re-exchange
    assert p.count("+- Sort") == 1, p
    assert "TakeOrderedAndProject" in p, p


def test_media_chunkhash_band_join_is_equi(spark, sf_dir):
    """dedup_media_chunkhash: candidates come from a bucket-local
    band-key SELF-JOIN (equi on band_id/band_val/media_type) with the
    code carried on the band rows — no collect_list bucket
    materialization, no nested loop, and no join back to the corpus
    after pairing (exactly one join in the whole plan)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "dedup_media_chunkhash")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "collect_list" not in p, p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p), p


def test_clustering_coeff_no_cartesian_wedges_equi(spark, sf_dir):
    """graph_clustering_coeff: the wedge and closure joins are key-equi
    over the ORIENTED edge table (no nested loop anywhere), and the
    triangle→node attribution is a union-explode of the triangle table,
    never a corpus-side pass."""
    p = plan_of(spark, sf_dir, "graph_clustering_coeff")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_covariance_matrix_single_moment_pass(spark, sf_dir):
    """agg_covariance_matrix: the corpus is read ONCE into the moments
    row (checkpointed); the 6 matrix cells are selects over that row —
    the returned plan has no parquet scan and no join at all."""
    p = plan_of(spark, sf_dir, "agg_covariance_matrix")
    assert "Scan parquet" not in p, p
    assert "Join" not in p, p


def test_pq_adc_probes_broadcast_corpus_stationary(spark, sf_dir):
    """sim_pq_adc_topk: the probe LUTs broadcast (8 rows); the corpus
    code table NEVER shuffles before scoring — the only exchange is the
    per-query rank window over scored candidates."""
    p = plan_of(spark, sf_dir, "sim_pq_adc_topk")
    assert "BroadcastNestedLoopJoin" in p, p  # probes × codes, probe side broadcast
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_theil_sen_pairs_on_day_domain(spark, sf_dir):
    """events_theil_sen_trend: the O(days²) pair join runs on the
    checkpointed DAY table (no parquet rescans in the returned plan),
    and the pair join is the broadcast nested-loop over the tiny domain
    — corpus rows never appear past the daily agg."""
    p = plan_of(spark, sf_dir, "events_theil_sen_trend")
    assert "Scan parquet" not in p, p


def test_systematic_stride_one_shuffle(spark, sf_dir):
    """sample_systematic_stride: ONE source-keyed exchange feeds both
    the rank window and the per-source audit agg."""
    p = plan_of(spark, sf_dir, "sample_systematic_stride")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p, p


def test_file_metadata_audit_reads_metadata_only(spark, sf_dir):
    """scan_file_metadata_audit: the read-back scans partition columns
    + _metadata only (no data columns in ReadSchema beyond the struct),
    and the audit agg is the only exchange."""
    p = plan_of(spark, sf_dir, "scan_file_metadata_audit")
    assert "_metadata" in p, p
    assert "Join" not in p, p


def test_bitemporal_snapshot_join_broadcasts(spark, sf_dir):
    """events_bitemporal_correction: the snapshot fan-out is a 2-row
    broadcast theta join (BNLJ with the snapshot dim broadcast) — the
    version stream itself never shuffles until the latest-wins
    window."""
    p = plan_of(spark, sf_dir, "events_bitemporal_correction")
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


def test_hashing_trick_collapses_vocab_first(spark, sf_dir):
    """feat_hashing_trick: one md5 per DISTINCT word — the plan hashes
    after the word-count agg, so exactly two hashpartitioning exchanges
    exist (word agg, bucket agg) and no join."""
    p = plan_of(spark, sf_dir, "feat_hashing_trick")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_hampel_bounded_frame_no_unbounded_collect(spark, sf_dir):
    """win_hampel_filter: the collect_list rides a BOUNDED rows frame
    (4 preceding..current) inside one user-keyed window — one exchange,
    one sort, no join, no unbounded frame."""
    p = plan_of(spark, sf_dir, "win_hampel_filter")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "unboundedpreceding" not in p.lower(), p


def test_time_to_convert_joins_on_user_dimension(spark, sf_dir):
    """events_time_to_convert: the purchase probe joins the per-user
    first-view table (|users| rows, checkpointed) — an equi join on
    user_id, never a theta explosion."""
    p = plan_of(spark, sf_dir, "events_time_to_convert")
    assert "CartesianProduct" not in p, p
    # the purchase probe is a user_id equi hash join with the time bound
    # riding inside; the only nested loop is the 1-row × 1-row final
    # stat assembly (the broadcast cross of two scalar aggregates)
    assert "BroadcastHashJoin [user_id" in p, p
    assert p.count("BroadcastNestedLoopJoin") == 1, p


def test_interarrival_hdr_one_window_shuffle(spark, sf_dir):
    """events_interarrival_hdr: one user-keyed exchange for the lag
    window, then map-side-combinable histogram aggs — no joins."""
    p = plan_of(spark, sf_dir, "events_interarrival_hdr")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 2, p


def test_did_collapses_to_cells_before_math(spark, sf_dir):
    """events_did_lift: the corpus collapses to the 2×2 cell agg in one
    pass — a single parquet scan, no joins, purchase filter pushed to
    the scan."""
    p = plan_of(spark, sf_dir, "events_did_lift")
    assert "Join" not in p, p
    assert p.count("Scan parquet") == 1, p
    assert "EqualTo(event_type,purchase)" in p, p


def test_bot_gate_signals_share_user_partitioning(spark, sf_dir):
    """events_bot_gate: the three signal frames join at |users| grain
    with no nested loop; sub-aggs collapse before every join."""
    p = plan_of(spark, sf_dir, "events_bot_gate")
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_null_safe_join_is_hash_not_nested_loop(spark, sf_dir):
    """join_null_safe_keys: Spark must plan the <=> join as a HASH join
    (EqualNullSafe is a supported hash key) — a nested loop here means
    the null-safe predicate fell out of the equi-join path.  The only
    BNLJ allowed is the 1-row stat assembly crosses."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "join_null_safe_keys")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "CartesianProduct" not in p, p
    # two data joins (equi + null-safe) both shuffle-hash/sort-merge
    n_hash_joins = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
    assert n_hash_joins == 2, p


def test_null_safe_split_has_no_null_bucket(spark, sf_dir):
    """join_null_safe_split: the registered split-null-partition rewrite
    must contain NO EqualNullSafe operator (the single-bucket null skew
    `<=>` plans) — the only data join is a plain equi join over keys
    pre-filtered isnotnull, with the filter pushed to the parquet scan;
    the 1-row stat assembly crosses stay broadcast."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "join_null_safe_split")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "EqualNullSafe" not in p and "<=>" not in p, p
    assert "CartesianProduct" not in p, p
    # exactly ONE data join (the non-null equi join)
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") == 1, p
    # the null filter reaches both scans (CASE output filtered isnotnull —
    # visible as isnotnull in the post-scan filter at minimum)
    assert p.lower().count("isnotnull") >= 2, p


def test_null_safe_rows_no_null_bucket_and_broadcast_null_cross(spark, sf_dir):
    """join_null_safe_rows: the ROW-returning split rewrite must keep the
    count form's laws — no EqualNullSafe operator anywhere, exactly one
    shuffled data join (the isnotnull-prefiltered equi join) — and its
    null×null block must be a BROADCAST cross of the smaller null spool
    (partition-local, no shuffle of null keys, no CartesianProduct)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_of(spark, sf_dir, "join_null_safe_rows")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "EqualNullSafe" not in p and "<=>" not in p, p
    assert "CartesianProduct" not in p, p
    # one shuffled equi join over the non-null remainder ...
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") == 1, p
    # ... and exactly one broadcast cross for the null partition (explicit
    # F.broadcast survives the disabled auto-threshold)
    n_bc_cross = sum(
        1
        for ln in p.splitlines()
        if "BroadcastNestedLoopJoin" in ln and "Cross" in ln
    )
    assert n_bc_cross == 1, p
    # the null pre-filters reach the scans/post-scan filters on both sides
    assert p.lower().count("isnotnull") >= 2, p
    assert p.lower().count("isnull") >= 2, p


def test_session_bounce_single_event_sort(spark, sf_dir):
    """events_session_bounce: session build + per-session reduce +
    entry-type rollup ride ONE user-keyed sort; the event stream is
    exchanged exactly once."""
    p = plan_of(spark, sf_dir, "events_session_bounce")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 3, p
    assert p.count("+- Sort") <= 2, p
