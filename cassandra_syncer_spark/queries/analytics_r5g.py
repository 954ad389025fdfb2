"""Round-5 batch 7: SCD2 merge-apply, manifest time-travel reads,
contrastive negative sampling, and per-group top-k.

`scan_time_travel` is the reference's core read path (latest-manifest
restore, bin/cassandra-syncer-restore:82-109) expressed as a query over a
manifest LOG with an as-of timestamp — i.e. the generalization from
"latest" to "any point in time" that the snapshot-per-commit write side
(bin/cassandra-syncer:141-143) already makes possible.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# merge_scd2_apply — apply a change batch to an SCD2 dimension
# ---------------------------------------------------------------------------

_SCD2_TS = 100  # effective time of the change batch


@register(
    "merge_scd2_apply",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS segment, 0 AS valid_from FROM customer
    ),
    changes AS (
      SELECT c_custkey, 'PROMO' AS segment FROM customer
      WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'PROMO'
    )
    SELECT d.c_custkey, d.segment,
           CAST(d.valid_from AS BIGINT) AS valid_from,
           CAST(CASE WHEN c.c_custkey IS NOT NULL THEN {_SCD2_TS} END AS BIGINT)
             AS valid_to,
           (c.c_custkey IS NULL) AS is_current
    FROM dim d LEFT JOIN changes c ON d.c_custkey = c.c_custkey
    UNION ALL
    SELECT c_custkey, segment, CAST({_SCD2_TS} AS BIGINT), CAST(NULL AS BIGINT), TRUE
    FROM changes
    ORDER BY c_custkey, valid_from
    """,
)
def merge_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 MERGE: a change batch arrives for a versioned dimension —
    close the affected keys' current intervals at the effective time and
    append the new versions as open intervals — the standard warehouse
    `MERGE INTO` pattern that `scd2_history` (building history from an
    event log) and `merge_upsert` (last-writer-wins) bracket.  No-op
    changes (new value == current value) are filtered out before the
    merge, the dedup that keeps SCD2 dims from accreting phantom
    versions.

    Scale shape: one equi left-join of the dimension against the change
    batch (batch ≪ dim → broadcast; both large → one key shuffle) plus a
    union with the batch itself — no windows, no per-key sorts; at a
    lakehouse sink this maps 1:1 onto MERGE INTO WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT.
    """
    cust = T(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("valid_from"),
    )
    changes = (
        cust.filter((F.col("c_custkey") % 7 == 0) & (F.col("c_mktsegment") != "PROMO"))
        .select("c_custkey", F.lit("PROMO").alias("segment"))
    )
    chg_keys = changes.select("c_custkey", F.lit(True).alias("chg"))
    closed = dim.join(F.broadcast(chg_keys), "c_custkey", "left").select(
        "c_custkey",
        "segment",
        "valid_from",
        F.when(F.col("chg"), F.lit(_SCD2_TS)).cast("long").alias("valid_to"),
        F.col("chg").isNull().alias("is_current"),
    )
    fresh = changes.select(
        "c_custkey",
        "segment",
        F.lit(_SCD2_TS).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(fresh).orderBy("c_custkey", "valid_from")


# ---------------------------------------------------------------------------
# scan_time_travel — manifest-log as-of read
# ---------------------------------------------------------------------------

#: snapshot timeline: (manifest_ts, max doc_id % 4 bucket included) — each
#: snapshot adds one more bucket, like a growing table; the probe reads
#: as-of T=250, which must resolve to the ts=200 snapshot (buckets 0-1).
_SNAPSHOTS = [(100, 0), (200, 1), (300, 2)]
_TRAVEL_T = 250


@register(
    "scan_time_travel",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id % 4 <= 1
    GROUP BY lang ORDER BY lang
    """,
)
def scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over a manifest log: write snapshot file-sets + an
    append-only manifest table (manifest_ts, paths[]), then answer a
    query AS OF T=250 by selecting the latest manifest <= T and reading
    ONLY the files it names — the reference's latest-manifest restore
    (bin/cassandra-syncer-restore:82-109) generalized from "latest" to
    any point in time, and the same read protocol as a lakehouse
    transaction log.

    Scale shape: manifest selection is a metadata read (the manifest
    table is one row per snapshot — the driver-side path collect is the
    same metadata hop every table format's planner performs); the data
    read is file-pruned to the chosen snapshot's listing, so the scan
    touches exactly the as-of file set regardless of how many snapshots
    accumulated after it.  The oracle reproduces the ts=200 snapshot's
    membership predicate directly.
    """
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sinks",
        f"timetravel-{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{spark.sparkContext.applicationId}",
    )
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    man_rows = []
    for ts, max_bucket in _SNAPSHOTS:
        paths = []
        for b in range(max_bucket + 1):
            p = os.path.join(out, f"bucket={b}")
            if not os.path.exists(p):  # each bucket written once, shared
                docs.filter(F.col("doc_id") % 4 == b).write.mode("overwrite").parquet(p)
            paths.append(p)
        man_rows.append((ts, paths))
    manifests = spark.createDataFrame(man_rows, "manifest_ts long, paths array<string>")
    man_path = os.path.join(out, "_manifests")
    manifests.write.mode("overwrite").parquet(man_path)

    chosen = (
        spark.read.parquet(man_path)
        .filter(F.col("manifest_ts") <= _TRAVEL_T)
        .orderBy(F.desc("manifest_ts"))
        .select("paths")
        .first()
    )
    back = spark.read.parquet(*chosen.paths)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# sample_negative_pairs — deterministic contrastive negatives
# ---------------------------------------------------------------------------

_NEG_K = 5


@register(
    "sample_negative_pairs",
    oracle=f"""
    WITH e AS (SELECT vec_id, label FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, label AS plabel FROM e
               WHERE vec_id % 100 = 0),
    ranked AS (
      SELECT p.probe_id, c.vec_id, c.label,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY md5(concat(CAST(p.probe_id AS VARCHAR), ':',
                                   CAST(c.vec_id AS VARCHAR))), c.vec_id) AS rk
      FROM probes p JOIN e c ON c.label <> p.plabel
    )
    SELECT probe_id, vec_id, CAST(label AS BIGINT) AS label, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_NEG_K} ORDER BY probe_id, rk
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: for every probe, K
    uniform-at-random negatives drawn from OTHER label classes — the
    (anchor, negative) pair generation feeding triplet/InfoNCE training.
    The draw is a deterministic md5 rank over (probe, candidate), so the
    sample is reproducible across runs, engines, and repartitioning —
    the same rand()-free discipline as `mix_sample_weighted`.

    Scale shape: probes broadcast against the label-filtered corpus scan
    (the corpus never shuffles); per-probe top-K is a window over the
    hash rank — row_number streams under WindowExec.  At 100 TB with
    many probes, the same dataflow shards by probe batch; the md5 rank
    keeps every shard's draw consistent.
    """
    e = T(spark, sf_dir, "embeddings").select("vec_id", "label")
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.md5(F.concat_ws(":", "probe_id", "vec_id")), "vec_id"
    )
    return (
        F.broadcast(probes)
        .join(e, F.col("label") != F.col("plabel"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _NEG_K)
        .select("probe_id", "vec_id", F.col("label").cast("long").alias("label"), "rk")
        .orderBy("probe_id", "rk")
    )


# ---------------------------------------------------------------------------
# agg_topk_per_group — top-k frequent tokens per group
# ---------------------------------------------------------------------------


@register(
    "agg_topk_per_group",
    oracle="""
    WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
    c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY lang, word),
    r AS (
      SELECT lang, word, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
      FROM c
    )
    SELECT lang, word, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3 ORDER BY lang, rk
    """,
)
def agg_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most frequent tokens per language — the generic per-group
    top-k every analytics engine must answer (`agg_mode_freq` is its
    k=1 special case; `text_idf_topterms` its idf-weighted cousin).
    Deterministic tie rule: count desc, then token asc.

    Scale shape: explode → one (lang, word) hash agg with map-side
    combine (the big shrink), then the rank window runs over the
    aggregated counts — vocabulary-sized, not corpus-sized.  At extreme
    vocabularies the window's per-group sort swaps for the count-min +
    heap sketch (`agg_countmin_freq` is the building block).
    """
    w = T(spark, sf_dir, "documents").select("lang", F.split("text", " ").alias("words"))
    c = (
        w.select("lang", F.explode("words").alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    win = Window.partitionBy("lang").orderBy(F.desc("n"), "word")
    return (
        c.withColumn("rk", F.row_number().over(win).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("lang", "rk")
    )
