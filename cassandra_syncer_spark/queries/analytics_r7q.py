"""Round-7 batch 17 — quality-aware dedup keeper selection and Spearman
rank correlation.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.llm_dedup import (
    _COMPONENTS_SQL,
    dedup_cluster_components,
)
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_keep_best_quality — keeper = best member, not smallest id
# ---------------------------------------------------------------------------

_KEEP_BEST_SQL = _COMPONENTS_SQL.replace(
    """
    SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
    """
    , comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    members AS (
      SELECT c.component, c.id AS doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.id) AS rn
      FROM comp c JOIN documents d ON c.id = d.doc_id
    ),
    multi AS (
      SELECT component FROM members GROUP BY component HAVING count(*) >= 2
    )
    SELECT CAST(m.component AS BIGINT) AS component,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(CASE WHEN m.rn = 1 THEN m.doc_id END) AS BIGINT)
             AS keeper_doc,
           CAST(max(CASE WHEN m.rn = 1 THEN m.n_chars END) AS BIGINT)
             AS keeper_chars,
           CAST(sum(CASE WHEN m.rn > 1 THEN m.n_chars ELSE 0 END) AS BIGINT)
             AS dropped_chars
    FROM members m JOIN multi USING (component)
    GROUP BY m.component ORDER BY component
    """,
)


@register("dedup_keep_best_quality", oracle=_KEEP_BEST_SQL)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup APPLY: within each near-dup cluster keep the
    BEST member (longest document, ties by doc_id) instead of the
    smallest id — what production pipelines actually do (the min-id
    keeper of ``dedup_apply_clusters`` can keep the truncated mirror
    and drop the full article).  Per multi-member cluster: the keeper,
    its length, and the character mass dropped.

    Reuses the registered component labels (``dedup_cluster_components``
    — min-label CC over the banded candidate graph) and joins document
    quality once; the keeper is an explicit rank-1 window (both engines
    run the same (n_chars DESC, doc_id) order — ``arg_max`` alone would
    leave ties engine-defined).

    Scale shape: labels are one row per clustered doc (≪ corpus); the
    quality join is a doc_id equi join; the keeper window partitions by
    component — cluster-bounded, Zipf-small.  Swapping the quality
    expression (Gopher gate score, LM score) changes one column.
    """
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labels = dedup_cluster_components(spark, sf_dir)
    members = labels.join(docs, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("long")
            .alias("keeper_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("long")
            .alias("keeper_chars"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("dropped_chars"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# agg_spearman_corr — rank correlation without a global row sort
# ---------------------------------------------------------------------------

#: Pearson over the DOUBLED midranks (exact integers) — shared text.
_SPEARMAN_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6)"
)


@register(
    "agg_spearman_corr",
    oracle=f"""
    WITH r AS (
      SELECT CAST(round(100 * l_quantity) AS BIGINT) AS q,
             CAST(round(100 * l_extendedprice) AS BIGINT) AS p
      FROM lineitem
    ),
    qd AS (
      SELECT q, count(*) AS c,
             2 * coalesce(sum(count(*)) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + count(*) + 1 AS mid2
      FROM r GROUP BY q
    ),
    pd AS (
      SELECT p, count(*) AS c,
             2 * coalesce(sum(count(*)) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + count(*) + 1 AS mid2
      FROM r GROUP BY p
    ),
    j AS (
      SELECT qd.mid2 AS x, pd.mid2 AS y
      FROM r JOIN qd ON r.q = qd.q JOIN pd ON r.p = pd.p
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM j
    )
    SELECT n AS n_rows, {_SPEARMAN_EXPR} AS spearman_r6
    FROM s WHERE n >= 2
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price —
    the monotone-association complement of ``agg_stats_corr``'s Pearson
    (robust to outliers and nonlinearity; the pair tells you whether a
    relationship is linear or merely monotone).

    Exact distributed ranking, same machinery as ``agg_mannwhitney_u``:
    per-variable midranks come from value-DOMAIN prefix sums (domain
    tables ≪ rows), join back to rows on the value key (broadcast-able
    dimensions), and Pearson runs over the DOUBLED midranks — exact
    integers even with ties, HUGEINT/DECIMAL cross sums, one shared-text
    float finale.  No global row sort anywhere.

    Scale shape: one scan → two domain aggs → two equi joins of the row
    stream against domain tables → single-row finale.  The only
    corpus-sized shuffles are the two domain-key joins.
    """
    r = T(spark, sf_dir, "lineitem").select(
        F.round(F.lit(100) * F.col("l_quantity")).cast("long").alias("q"),
        F.round(F.lit(100) * F.col("l_extendedprice")).cast("long").alias("p"),
    )

    def domain(col: str) -> DataFrame:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            r.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                col,
                (
                    2 * F.coalesce(F.sum("c").over(w), F.lit(0))
                    + F.col("c")
                    + 1
                ).alias("mid2"),
            )
        )

    qd = domain("q").withColumnRenamed("mid2", "x")
    pd_ = domain("p").withColumnRenamed("mid2", "y")
    j = r.join(qd, "q").join(pd_, "p").select("x", "y")
    xd, ydd = F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * ydd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(ydd * ydd).alias("syy"),
    )
    return s.filter(F.col("n") >= 2).select(
        F.col("n").alias("n_rows"),
        F.expr(_SPEARMAN_EXPR).alias("spearman_r6"),
    )
