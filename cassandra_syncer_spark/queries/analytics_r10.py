"""Round-10 batch 1 — the ROW-RETURNING split-null-partition join.

`join_null_safe_split` (analytics_r9.py) registered the COUNT form of the
null-skew rewrite, where the null×null block is a metadata multiply; the
production MERGE path needs the null partition as a real dataflow.  This
module registers that form: the output is the joined ROWS under `<=>`
semantics, produced with no EqualNullSafe operator and no single-bucket
null shuffle anywhere in the plan.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); exact integer keys on both engines per the
registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r7w import _NULL_L, _NULL_R
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# join_null_safe_rows — the row-returning form of the split-null rewrite
# ---------------------------------------------------------------------------

#: Row cap for broadcasting a null-key spool whole.  Under it the null
#: block is one BroadcastNestedLoopJoin (the round-10 plan); past it the
#: cross block-chunks: the smaller spool splits into ceil(n/cap)
#: deterministic key-modulus chunks, each broadcast against the bigger
#: spool partition-locally, unioned.  Env-overridable so the skew stress
#: can force the chunked path with realistic (not 10^12-row) spools.
_NULL_SPOOL_BROADCAST_MAX_ROWS = 4_000_000


def _null_spool_cap() -> int:
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_NULL_SPOOL_MAX", _NULL_SPOOL_BROADCAST_MAX_ROWS
        )
    )


def _chunked_null_cross(
    big: DataFrame, small: DataFrame, small_key: str, n_small: int, cap: int
) -> DataFrame:
    """NULL×NULL block when BOTH spools outgrow the broadcast cap: split
    the smaller spool into deterministic key-modulus chunks of <= cap
    rows, broadcast each chunk, cross it with the bigger spool
    partition-locally, union.  No shuffle ever hashes the (single) null
    key, so the one-bucket straggler stays structurally impossible at ANY
    spool size; the cost is ceil(n_small/cap) re-reads of the bigger
    spool's scan-fused filter (the count form's metadata multiply is the
    degenerate chunk size).  Chunk membership keys on the spool's unique
    surrogate key — uniform by construction, no hash needed."""
    n_chunks = -(-n_small // cap)
    parts = [
        big.crossJoin(
            F.broadcast(small.filter(F.col(small_key) % n_chunks == i))
        )
        for i in range(n_chunks)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "join_null_safe_rows",
    oracle=f"""
    WITH l AS (
      SELECT CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL
                  ELSE o_custkey END AS k,
             o_orderkey
      FROM orders
    ),
    r AS (
      SELECT CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL
                  ELSE c_custkey END AS rk,
             c_custkey
      FROM customer
    )
    SELECT l.o_orderkey AS o_orderkey,
           r.c_custkey AS c_custkey,
           CAST(COALESCE(l.k, -1) AS BIGINT) AS join_key
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.rk
    ORDER BY o_orderkey, c_custkey
    """,
)
def join_null_safe_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-RETURNING split-null-partition join — the production MERGE
    dataflow `join_null_safe_split` only counted: the full joined row
    set under `<=>` semantics (null keys match null keys), hash-checked
    against DuckDB's IS NOT DISTINCT FROM join, with the null partition
    handled as a REAL row-producing stage instead of a metadata multiply.

    The rewrite (same algebra as the count form):

      * non-null remainder — plain equi join on keys pre-filtered
        ``isnotnull`` (the filter reaches both parquet scans), so the
        shuffle sees only well-distributed keys;
      * null partition — the null-keyed LEFT rows cross the null-keyed
        RIGHT spool partition-locally, with the SMALLER null spool
        broadcast (here customer's ~1/{_NULL_R} slice).  No shuffle ever
        hashes a NULL key, so the one-bucket straggler `<=>` plans is
        structurally impossible (plan-asserted: no EqualNullSafe, exactly
        one shuffled data join, one broadcast cross for the null block).

    At 100 TB the broadcast bound is the null-key row count of the
    SMALLER spool; the strategy is picked from driver-side metadata
    counts (scan-fused, null-slice only): whole-spool broadcast while
    either side fits the cap, else the BLOCK-CHUNKED cross
    (``_chunked_null_cross``): the smaller spool splits into
    deterministic key-modulus chunks of <= cap rows, each broadcast
    against the bigger spool partition-locally — no shuffle ever hashes
    the null key at ANY spool size (plan-asserted in
    tests/test_r11_nullsafe_chunks.py, stress-measured with both spools
    forced past the cap in scripts/skew_stress_nullsafe.py).
    Null keys are surfaced as join_key = -1 (COALESCE sentinel) so both
    engines order and hash the sentinel identically.

    Measured on the 8M-row 40%-null stress (scripts/
    skew_stress_nullsafe.py): the row form keeps the split rewrite's
    advantage over the naive `<=>` plan — SCALING.md "null-key skew".
    """
    l = T(spark, sf_dir, "orders").select(
        F.expr(
            f"CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL ELSE o_custkey END"
        ).alias("k"),
        "o_orderkey",
    )
    r = T(spark, sf_dir, "customer").select(
        F.expr(
            f"CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL ELSE c_custkey END"
        ).alias("rk"),
        "c_custkey",
    )
    equi = (
        l.filter(F.col("k").isNotNull())
        .join(r.filter(F.col("rk").isNotNull()), F.col("k") == F.col("rk"))
        .select(
            "o_orderkey",
            "c_custkey",
            F.col("k").cast("long").alias("join_key"),
        )
    )
    ln = l.filter(F.col("k").isNull()).select("o_orderkey")
    rn = r.filter(F.col("rk").isNull()).select("c_custkey")
    # spool sizing is driver-side METADATA (scan-fused count of the
    # null-key slice, the bloom_bitmap precedent) — it picks the null
    # block's physical strategy, never moves data through the driver
    cap = _null_spool_cap()
    n_r = rn.count()
    if n_r <= cap:
        crossed = ln.crossJoin(F.broadcast(rn))  # the round-10 plan
    else:
        n_l = ln.count()
        if n_l <= cap:
            crossed = rn.crossJoin(F.broadcast(ln))
        elif n_r <= n_l:
            crossed = _chunked_null_cross(ln, rn, "c_custkey", n_r, cap)
        else:
            crossed = _chunked_null_cross(rn, ln, "o_orderkey", n_l, cap)
    null_rows = crossed.select(
        "o_orderkey",
        "c_custkey",
        F.lit(-1).cast("long").alias("join_key"),
    )
    return equi.unionByName(null_rows).orderBy("o_orderkey", "c_custkey")
