"""Round-11 block-chunked NULL×NULL escape for ``join_null_safe_rows``.

Round 10 broadcast the smaller null spool unconditionally; when BOTH
spools outgrow the broadcast cap the cross must block-chunk (split the
smaller spool into key-modulus chunks of <= cap rows, broadcast each
chunk) instead of either overflowing executor memory or regressing to a
single-bucket null shuffle.  Laws:

1. output identity — the chunked plan returns exactly the whole-broadcast
   plan's rows (the cap is a physical knob, never a semantic one);
2. plan shape — with the cap forced below both spool sizes, the plan
   holds one BroadcastNestedLoopJoin cross PER CHUNK, still zero
   EqualNullSafe / CartesianProduct operators, and still exactly one
   shuffled data join (the isnotnull-prefiltered equi remainder): no
   shuffle hashes the null key at ANY spool size;
3. chunking arithmetic — ceil division and the key-modulus partition
   cover every spool row exactly once (unique surrogate keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_syncer_spark.registry import REGISTRY, all_queries


def _plan(spark, sf_dir):
    df = REGISTRY["join_null_safe_rows"].fn(spark, sf_dir)
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_chunked_cross_output_identical(spark, sf_dir, monkeypatch):
    all_queries()
    base = sorted(
        map(tuple, REGISTRY["join_null_safe_rows"].fn(spark, sf_dir).collect())
    )
    monkeypatch.setenv("SPARK_GRAFT_NULL_SPOOL_MAX", "4")
    chunked = sorted(
        map(tuple, REGISTRY["join_null_safe_rows"].fn(spark, sf_dir).collect())
    )
    assert base == chunked
    assert len(base) > 0


def test_chunked_cross_plan_no_null_bucket(spark, sf_dir, monkeypatch):
    """Cap forced below BOTH spool sizes: one broadcast cross per chunk,
    no EqualNullSafe, no CartesianProduct, one shuffled equi join."""
    all_queries()
    from cassandra_syncer_spark.queries.analytics_r7w import _NULL_L, _NULL_R
    from cassandra_syncer_spark.queries.relational import T

    n_l = T(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % _NULL_L == 0
    ).count()
    n_r = T(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % _NULL_R == 0
    ).count()
    cap = 1
    assert n_l > cap and n_r > cap, (n_l, n_r)
    n_small = min(n_l, n_r)
    n_chunks = -(-n_small // cap)

    monkeypatch.setenv("SPARK_GRAFT_NULL_SPOOL_MAX", str(cap))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df, p = _plan(spark, sf_dir)
        df.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "EqualNullSafe" not in p and "<=>" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") == 1, p
    n_bc_cross = sum(
        1
        for ln in p.splitlines()
        if "BroadcastNestedLoopJoin" in ln and "Cross" in ln
    )
    assert n_bc_cross == n_chunks, (n_bc_cross, n_chunks, p)


def test_chunk_modulus_partitions_cover_spool(spark, sf_dir):
    """Key-modulus chunking is a partition: each null-spool row lands in
    exactly one chunk, and chunk sizes never exceed ~spool/chunks + skew
    from key residues (sanity for the cap arithmetic, not a uniformity
    claim)."""
    from cassandra_syncer_spark.queries.analytics_r7w import _NULL_R
    from cassandra_syncer_spark.queries.relational import T

    rn = T(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % _NULL_R == 0
    ).select("c_custkey")
    n = rn.count()
    cap = 1
    n_chunks = -(-n // cap)
    sizes = [
        rn.filter(F.col("c_custkey") % n_chunks == i).count()
        for i in range(n_chunks)
    ]
    assert sum(sizes) == n, (sizes, n)
