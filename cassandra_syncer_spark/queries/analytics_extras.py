"""Engine utilities a 100 TB pipeline leans on daily: reproducible
hash-based sampling, ANALYZE-style column statistics, and n-gram frequency
analysis (vocabulary profiling for training corpora)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register


@register(
    "sample_hash",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
    FROM orders
    WHERE {fp.hash32("CAST(o_orderkey AS VARCHAR)", duck=True)} % 100 < 10
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample by key hash.

    The scale-correct sampling: reproducible across runs and engines (no
    rand()), stable under repartitioning, and consistent per key — the same
    orders appear in every downstream job's sample, so samples join.
    """
    o = T(spark, sf_dir, "orders")
    bucket = F.expr(fp.hash32("CAST(o_orderkey AS STRING)", duck=False)) % 100
    return o.filter(bucket < 10).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price")
    )


@register(
    "stats_summary",
    oracle="""
    SELECT 'l_quantity' AS col,
           count(*) AS n,
           CAST(count(*) - count(l_quantity) AS BIGINT) AS nulls,
           round(min(l_quantity), 2) AS min_v,
           round(max(l_quantity), 2) AS max_v,
           sum(CAST(round(l_quantity * 100.0) AS BIGINT)) / (count(*) * 100.0) AS avg_v,
           count(DISTINCT l_quantity) AS ndv
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           CAST(count(*) - count(l_discount) AS BIGINT),
           round(min(l_discount), 2), round(max(l_discount), 2),
           sum(CAST(round(l_discount * 100.0) AS BIGINT)) / (count(*) * 100.0), count(DISTINCT l_discount)
    FROM lineitem
    """,
)
def stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics (count/nulls/min/max/avg/ndv) —
    the inputs a cost-based optimizer or data-quality monitor consumes.
    One aggregation pass per column batch; at scale ndv switches to HLL."""
    li = T(spark, sf_dir, "lineitem")

    def stats(c: str) -> DataFrame:
        return li.agg(
            F.lit(c).alias("col"),
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias("nulls"),
            F.round(F.min(c), 2).alias("min_v"),
            F.round(F.max(c), 2).alias("max_v"),
            (F.sum(F.round(F.col(c) * 100.0).cast("long")) / (F.count(F.lit(1)) * 100.0)).alias("avg_v"),
            F.countDistinct(c).alias("ndv"),
        )

    return stats("l_quantity").unionByName(stats("l_discount"))


@register(
    "text_ngram_freq",
    oracle="""
    WITH grams AS (
      SELECT lang, unnest(list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
               i -> concat_ws(' ', string_split(text, ' ')[i],
                                   string_split(text, ' ')[i+1]))) AS bigram
      FROM documents
    ), counted AS (
      SELECT lang, bigram, count(*) AS freq FROM grams GROUP BY lang, bigram
    )
    SELECT lang, bigram, freq, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY freq DESC, bigram) AS rn
      FROM counted
    ) WHERE rn <= 5
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 bigrams per language — corpus vocabulary profiling.

    explode is the only row-expansion (≈ n_words rows per doc); the
    frequency shuffle keys on (lang, bigram) and the top-k window only on
    lang — both bounded.
    """
    docs = T(spark, sf_dir, "documents")
    # words projected before the lambda (no CSE inside transform)
    # get(w, i): 1-word docs hit i = size(w); ANSI bracket indexing throws
    # there, get() yields NULL and concat_ws skips it — identical to the
    # oracle's out-of-bounds-NULL 1-based w[i+1]
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(w) - 1, 1)), "
        "i -> concat_ws(' ', w[i-1], get(w, i)))"
    )
    counted = (
        docs.select("lang", F.split("text", " ").alias("w"))
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("bigram"))
    return (
        counted.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )
