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

    At 100 TB the broadcast bound is the null-key cardinality of the
    SMALLER side, not its row count; if both null spools outgrow the
    broadcast threshold, the cross block-chunks the bigger spool
    (repartition one side, broadcast fixed-size chunks of the other) —
    the count form's metadata multiply is the degenerate chunk size.
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
    null_rows = (
        l.filter(F.col("k").isNull())
        .select("o_orderkey")
        .crossJoin(
            F.broadcast(r.filter(F.col("rk").isNull()).select("c_custkey"))
        )
        .select(
            "o_orderkey",
            "c_custkey",
            F.lit(-1).cast("long").alias("join_key"),
        )
    )
    return equi.unionByName(null_rows).orderBy("o_orderkey", "c_custkey")
