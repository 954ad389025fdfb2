"""Round-7 batch 19 — partition-scoped upsert merge and Kendall's tau-b.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r3 import _scratch
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# merge_upsert_partitioned — upsert that rewrites ONLY touched partitions
# ---------------------------------------------------------------------------


@register(
    "merge_upsert_partitioned",
    oracle="""
    WITH new_keys AS (
      SELECT o_orderkey + 1000000000 AS k, o_totalprice
      FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_orderkey LIMIT 3
    )
    SELECT o_orderstatus,
           CAST(count(*) + CASE WHEN o_orderstatus = 'O'
                                THEN (SELECT count(*) FROM new_keys)
                                ELSE 0 END AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_orderstatus = 'O' AND o_orderkey % 10 = 0
                         THEN 2 * CAST(round(o_totalprice * 100.0) AS BIGINT)
                         ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END)
                + CASE WHEN o_orderstatus = 'O'
                       THEN (SELECT CAST(sum(CAST(round(o_totalprice * 100.0)
                                               AS BIGINT)) AS BIGINT)
                             FROM new_keys)
                       ELSE 0 END AS BIGINT) AS price_centi
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def merge_upsert_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SCOPED UPSERT without a table format: an update batch
    touching only the 'O' partition (price-doubled updates for keys
    %10==0 plus three brand-new keys) merges latest-wins into the
    partitioned table by rewriting ONLY that partition (dynamic
    partition overwrite) — the incremental-merge pattern for plain
    parquet at 100 TB: anti-join the touched partition against the
    update keys, union the updates, swap the one directory; every other
    partition is untouched bytes.

    Documented constraint: the upsert is PARTITION-STABLE (an update may
    not move a key between partitions — the production shape where the
    partition column is a date or stable shard).  Key-moving merges need
    the touched-set union of old and new partitions; that variant is the
    table-format's job (`scan_time_travel` models the manifest side).

    The oracle computes the expected final state straight from the raw
    table — equality proves updates applied, inserts landed, untouched
    partitions survived, and no row duplicated (a failed anti-join would
    double the updated keys; a static overwrite would drop 'P'/'F').
    """
    out = _scratch(sf_dir, "upsertpart")
    base = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias("price_centi"),
    )
    base.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)

    o_part = base.filter(F.col("o_orderstatus") == "O")
    upd_existing = o_part.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "price_centi", F.col("price_centi") * 2
    )
    upd_new = (
        o_part.orderBy("o_orderkey")
        .limit(3)
        .select(
            (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
            "o_orderstatus",
            "price_centi",
        )
    )
    updates = upd_existing.unionByName(upd_new)

    # merge = (existing 'O' rows minus updated keys) + updates — computed
    # BEFORE the overwrite (localCheckpoint materializes the read so the
    # rewrite doesn't race its own input)
    existing = (
        spark.read.schema("o_orderkey long, price_centi long, o_orderstatus string")
        .parquet(out)
        .filter(F.col("o_orderstatus") == "O")
    )
    merged = (
        existing.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(updates.select("o_orderkey", "price_centi", "o_orderstatus"))
        .localCheckpoint()
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.schema(
        "o_orderkey long, price_centi long, o_orderstatus string"
    ).parquet(out)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("price_centi").cast("long").alias("price_centi"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# agg_kendall_tau — tau-b from the 2D contingency grid
# ---------------------------------------------------------------------------

#: shared tau-b finale: (C − D)/sqrt((n0 − n1)(n0 − n2)), exact BIGINT inputs
_TAU_EXPR = (
    "round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))"
    " / nullif(sqrt((CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE))"
    " * (CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE))), 0.0), 6)"
)


@register(
    "agg_kendall_tau",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(round(100 * l_quantity) AS BIGINT) AS x,
             CAST(round(10000 * l_discount) AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    cd AS (
      SELECT CAST(sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c
                           ELSE 0 END) AS BIGINT) AS cc,
             CAST(sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c
                           ELSE 0 END) AS BIGINT) AS dd
      FROM cells a JOIN cells b ON a.x < b.x
    ),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
    tx AS (
      SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1)) // 2 AS BIGINT) AS n1
      FROM (SELECT x, sum(c) AS s FROM cells GROUP BY x)
    ),
    ty AS (
      SELECT CAST(sum(CAST(s AS HUGEINT) * (s - 1)) // 2 AS BIGINT) AS n2
      FROM (SELECT y, sum(c) AS s FROM cells GROUP BY y)
    ),
    f AS (
      SELECT t.n, cd.cc, cd.dd, tx.n1, ty.n2,
             CAST(CAST(t.n AS HUGEINT) * (t.n - 1) // 2 AS BIGINT) AS n0
      FROM t, cd, tx, ty
    )
    SELECT n AS n_rows, cc AS n_concordant, dd AS n_discordant,
           {_TAU_EXPR} AS tau_b_r6
    FROM f WHERE n >= 2
    """,
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between quantity and discount — the third rank
    statistic completing the correlation kit (Pearson `agg_stats_corr`
    for linearity, Spearman for monotonicity, Kendall for concordance
    robustness with a clean tie treatment).

    The scale trick: concordant/discordant pairs come from the 2D
    CONTINGENCY GRID, not row pairs — the corpus collapses to
    |x-domain|×|y-domain| cells (50×11 here; value-domain-bounded like
    ``agg_ks_test``), and C/D are one grid self-join on ``a.x < b.x``
    with cell-count products (≤ grid² pairs, trivially small) — the
    naive row-pair formulation is O(n²) and impossible at 100 TB.  All
    pair counts exact BIGINT/HUGEINT; the tau finale is one shared text
    with exact operands, nullif-guarded for all-tied inputs.
    """
    cells = T(spark, sf_dir, "lineitem").groupBy(
        F.round(F.lit(100) * F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.lit(10000) * F.col("l_discount")).cast("long").alias("y"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a, b = cells.alias("a"), cells.alias("b")
    cd = a.join(b, F.col("a.x") < F.col("b.x")).agg(
        F.sum(
            F.when(
                F.col("a.y") < F.col("b.y"),
                F.col("a.c").cast("decimal(38,0)") * F.col("b.c"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("cc"),
        F.sum(
            F.when(
                F.col("a.y") > F.col("b.y"),
                F.col("a.c").cast("decimal(38,0)") * F.col("b.c"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("dd"),
    )
    t = cells.agg(F.sum("c").cast("long").alias("n"))
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("s"))
        .agg(
            F.expr("CAST(sum(CAST(s AS DECIMAL(38,0)) * (s - 1)) div 2 AS BIGINT)").alias(
                "n1"
            )
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("s"))
        .agg(
            F.expr("CAST(sum(CAST(s AS DECIMAL(38,0)) * (s - 1)) div 2 AS BIGINT)").alias(
                "n2"
            )
        )
    )
    f = (
        t.crossJoin(cd)
        .crossJoin(tx)
        .crossJoin(ty)
        .withColumn(
            "n0",
            F.expr("CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) div 2 AS BIGINT)"),
        )
    )
    return f.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_rows"),
        F.col("cc").alias("n_concordant"),
        F.col("dd").alias("n_discordant"),
        F.expr(_TAU_EXPR).alias("tau_b_r6"),
    )
