"""Round-7 batch 15 — Mann-Whitney U rank test, sampled dedup-rate
estimation with Wilson bounds, and a nested-struct sink round trip.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.analytics_r3 import _scratch
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# agg_mannwhitney_u — rank-based two-sample test (tie-corrected)
# ---------------------------------------------------------------------------

#: shared z text over the single summary row: U, its null mean and the
#: tie-corrected variance — identical IEEE sequence both engines.
_MWU_Z_EXPR = (
    "round((CAST(u2 AS DOUBLE) / 2.0"
    " - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)"
    " / nullif(sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0"
    "   * ((CAST(n AS DOUBLE) + 1.0)"
    "      - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE)"
    "        * (CAST(n AS DOUBLE) - 1.0)))), 0.0), 6)"
)


@register(
    "agg_mannwhitney_u",
    oracle=f"""
    WITH e AS (
      SELECT CAST(round(100 * value) AS BIGINT) AS v,
             CAST((CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                        AS BIGINT)) % 2 AS BIGINT) AS arm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT v,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM e GROUP BY v
    ),
    r AS (
      SELECT v, ca, cb,
             coalesce(sum(ca + cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
             ca + cb AS t
      FROM g
    ),
    s AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(ca + cb) AS BIGINT) AS n,
             CAST(sum(cb * (2 * cum + t + 1)) AS BIGINT) AS rb2,
             CAST(sum(t * t * t - t) AS BIGINT) AS tt
      FROM r
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(rb2 - nb * (nb + 1) AS BIGINT) AS u_b_2x,
           {_MWU_Z_EXPR.replace('u2', 'rb2 - nb * (nb + 1)')} AS z_r6
    FROM s WHERE na >= 1 AND nb >= 1 AND n >= 2
    """,
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the md5 A/B arms on
    per-event values — the NONPARAMETRIC member of the experimentation
    kit: detects stochastic dominance without normality assumptions,
    robust to the heavy tails that break Welch on revenue-like metrics.

    Exact distributed ranking without a global sort of rows: events
    collapse to per-distinct-value arm counts (value-domain-sized, the
    ``agg_ks_test`` contract), midranks come from a prefix sum over that
    ordered domain, and the DOUBLED rank sum (``2R − n(n+1)`` stays
    integer with tied midranks) gives U exactly.  The tie-corrected
    normal z is the one float step — shared text, nullif-guarded for
    the all-values-equal corpus.

    Scale shape: one scan → value-domain agg (map-side combined) →
    domain-sized window + single-row finale.  The window runs on
    |distinct centi values| rows, never the corpus.
    """
    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round(F.lit(100) * F.col("value")).cast("long").alias("v"),
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ).alias("arm"),
        )
    )
    g = e.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)).alias("cum"),
        (F.col("ca") + F.col("cb")).alias("t"),
    )
    s = r.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum(F.col("ca") + F.col("cb")).cast("long").alias("n"),
        F.sum(F.col("cb") * (2 * F.col("cum") + F.col("t") + 1))
        .cast("long")
        .alias("rb2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tt"),
    )
    u2 = F.col("rb2") - F.col("nb") * (F.col("nb") + 1)
    return (
        s.filter((F.col("na") >= 1) & (F.col("nb") >= 1) & (F.col("n") >= 2))
        .withColumn("u2c", u2)
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("u2c").cast("long").alias("u_b_2x"),
            F.expr(_MWU_Z_EXPR.replace("u2", "u2c")).alias("z_r6"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_rate_sampled_estimate — dup rate from a hash sample + Wilson CI
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 20  # deterministic 1-in-20 doc sample

#: Wilson 95% interval over (n_dups, n_sampled) — shared text; z=1.96 as
#: an exact literal (constants are data).
_WILSON_CI = {
    side: (
        "round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"
        " + 1.9208 / CAST(n AS DOUBLE) {sign} 1.96 * sqrt("
        "   CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))"
        "   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
        "   + 0.9604 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
        " / (1.0 + 3.8416 / CAST(n AS DOUBLE)), 6)"
    ).format(sign=sign)
    for side, sign in [("lo", "-"), ("hi", "+")]
}


@register(
    "dedup_rate_sampled_estimate",
    oracle=f"""
    WITH s AS (
      SELECT md5(text) AS h FROM documents
      WHERE text IS NOT NULL
        AND (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT))
            % {_SAMPLE_MOD} = 0
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) - count(DISTINCT h) AS BIGINT) AS k
      FROM s
    )
    SELECT n AS n_sampled, k AS n_dups,
           CAST((1000000 * k) // n AS BIGINT) AS dup_rate_micro,
           {_WILSON_CI['lo']} AS wilson_lo_r6,
           {_WILSON_CI['hi']} AS wilson_hi_r6
    FROM t WHERE n > 0
    """,
)
def dedup_rate_sampled_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplicate-rate ESTIMATION from a deterministic 1-in-{mod}
    hash sample, with a Wilson 95% interval on the in-sample dup
    fraction — the pre-flight sizing check before committing a full
    dedup pass over 100 TB ("is this crawl 2% or 40% duplicated?").
    The md5-mod sample is replayable from any engine (no rand()), the
    same discipline as ``sample_hash``/``sample_ab_srm``.

    Caveat stated honestly: an in-SAMPLE exact-dup fraction lower-bounds
    the corpus rate (cross-sample duplicate pairs are invisible at rate
    1/{mod} each), so this estimates the WITHIN-SAMPLE rate whose Wilson
    interval quantifies only sampling noise — the registered exact
    queries (``corpus_dedup_rate_by_source``) remain the ground truth.

    Scale shape: the scan computes two md5s per row but only sample
    rows survive to the (tiny) distinct agg; no shuffle beyond the
    sample.  At 100 TB this is the cheapest dedup question you can ask.
    """
    s = (
        T(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .filter(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % _SAMPLE_MOD
            == 0
        )
        .select(F.md5("text").alias("h"))
    )
    t = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("h")).cast("long").alias("k"),
    )
    return t.filter(F.col("n") > 0).select(
        F.col("n").alias("n_sampled"),
        F.col("k").alias("n_dups"),
        F.expr("(1000000 * k) div n").cast("long").alias("dup_rate_micro"),
        F.expr(_WILSON_CI["lo"]).alias("wilson_lo_r6"),
        F.expr(_WILSON_CI["hi"]).alias("wilson_hi_r6"),
    )


dedup_rate_sampled_estimate.__doc__ = dedup_rate_sampled_estimate.__doc__.format(
    mod=_SAMPLE_MOD
)


# ---------------------------------------------------------------------------
# sink_nested_struct_roundtrip — array<struct> columns through parquet
# ---------------------------------------------------------------------------


@register(
    "sink_nested_struct_roundtrip",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, count(*) AS n_items
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST((SELECT count(*) FROM per_order) AS BIGINT) AS n_orders,
           CAST((SELECT sum(n_items) FROM per_order) AS BIGINT) AS n_items,
           CAST((SELECT max(n_items) FROM per_order) AS BIGINT) AS max_items,
           CAST((SELECT sum(CAST(round(l_quantity * 100.0) AS BIGINT))
                 FROM lineitem) AS BIGINT) AS qty_centi
    """,
)
def sink_nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED-COLUMN sink/source round trip: line items collapse into one
    ``array<struct<linenumber,qty_centi>>`` row per order (the document/
    multimodal-metadata shape — one record owning a variable-length list
    of typed children), write parquet with the nested schema, read back,
    re-explode, and re-aggregate.  Oracle equality against the FLAT
    table proves the nesting round trip is lossless: order count, total
    item count, max fan-out, and the value sum all survive — regardless
    of ``collect_list``'s nondeterministic ordering, because every
    checked aggregate is set-invariant (the honest contract for list
    columns; order-sensitive consumers must sort_array first, as
    ``sim_mmr_rerank``'s candidate build does).

    Scale shape: one order-keyed agg to build (map-side partials carry
    growing arrays — bounded by per-order fan-out, ≤7 here, ≤dozens in
    TPC-H generally); the nested write/read is columnar (parquet stores
    the list as repetition levels, so the explode on read-back is
    scan-side).  No joins.
    """
    out = _scratch(sf_dir, "nested")
    nested = (
        T(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("linenumber"),
                F.round(F.col("l_quantity") * 100.0).cast("long").alias("qty_centi"),
            ).alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.collect_list("item").alias("items"))
    )
    nested.write.mode("overwrite").parquet(out)
    back = spark.read.schema(
        "l_orderkey long, items array<struct<linenumber:int, qty_centi:long>>"
    ).parquet(out)
    ex = back.select("l_orderkey", F.size("items").alias("n_items"), "items")
    return ex.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("n_items").cast("long").alias("n_items"),
        F.max("n_items").cast("long").alias("max_items"),
        F.sum(
            F.aggregate(
                F.col("items"),
                F.lit(0).cast("long"),
                lambda acc, it: acc + it["qty_centi"],
            )
        )
        .cast("long")
        .alias("qty_centi"),
    )
