"""Round-7 batch 2 — markup stripping, target encoding, class-balanced
sampling, and stateful streaming dedup registered as a checkable query.

Reference parity note: the reference ships no analytics surface
(bin/cassandra-syncer:243-280 is sync only); these are 100 TB-mandate
extensions.  Formulas are integer/micro-unit exact on both engines.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# text_html_strip — markup removal with a round-trip proof
# ---------------------------------------------------------------------------


@register(
    "text_html_strip",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             text,
             '<html><body><p>' ||
               replace(text, ' data ', ' <b>data</b> ') ||
               '</p><!-- crawl --></body></html>' AS html
      FROM documents
    ),
    s AS (
      SELECT doc_id, text, html,
             trim(regexp_replace(
               regexp_replace(html, '<[^>]*>', ' ', 'g'),
               ' +', ' ', 'g')) AS stripped,
             CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags
      FROM h
    )
    SELECT doc_id, n_tags,
           CAST(length(stripped) AS BIGINT) AS stripped_len,
           CAST(stripped = trim(regexp_replace(text, ' +', ' ', 'g')) AS BOOLEAN)
             AS roundtrip_ok
    FROM s ORDER BY doc_id
    """,
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML/markup STRIPPING — the first stage of every web-crawl text
    pipeline: drop tags and comments, collapse the whitespace they leave
    behind.  The fixture text carries no markup, so the query first
    WRAPS each document in a deterministic HTML shell (tags around every
    ' data ' token plus a comment) and then proves the strip kernel
    exact by round-tripping: stripped output must equal the
    whitespace-normalized original — a self-certifying transform, not a
    trust-me regex.

    Scale shape: pure per-row regexp expressions fused into the scan —
    no shuffle except the output ORDER BY; 100 TB strips at scan speed.
    Production swaps the synthetic wrapper for the raw crawl bytes and
    keeps the identical strip + collapse + verify-sample dataflow.
    """
    h = T(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("<html><body><p>"),
            F.expr("replace(text, ' data ', ' <b>data</b> ')"),
            F.lit("</p><!-- crawl --></body></html>"),
        ).alias("html"),
    )
    s = h.select(
        "doc_id",
        "text",
        F.trim(
            F.regexp_replace(
                F.regexp_replace("html", "<[^>]*>", " "), " +", " "
            )
        ).alias("stripped"),
        F.size(F.expr("regexp_extract_all(html, '<[^>]*>', 0)"))
        .cast("long")
        .alias("n_tags"),
    )
    return s.select(
        "doc_id",
        "n_tags",
        F.length("stripped").cast("long").alias("stripped_len"),
        (
            F.col("stripped")
            == F.trim(F.regexp_replace("text", " +", " "))
        ).alias("roundtrip_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# feat_target_encode — leave-one-out target encoding
# ---------------------------------------------------------------------------


@register(
    "feat_target_encode",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority AS cat,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_centi
      FROM orders
    ),
    c AS (
      SELECT cat, CAST(sum(price_centi) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM o GROUP BY cat
    ),
    g AS (SELECT CAST(sum(price_centi) AS BIGINT) AS gs,
                 CAST(count(*) AS BIGINT) AS gn FROM o)
    SELECT o.o_orderkey, o.cat,
           CAST(CASE WHEN c.n > 1
                     THEN (10000 * (c.s - o.price_centi)) // (c.n - 1)
                     ELSE (10000 * g.gs) // g.gn END AS BIGINT)
             AS loo_mean_micro
    FROM o JOIN c ON o.cat = c.cat CROSS JOIN g
    WHERE o.o_orderkey % 100 = 0
    ORDER BY o.o_orderkey
    """,
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT target encoding — the leakage-safe categorical
    feature every tabular-ML pipeline builds: each row's category is
    replaced by the mean target of the OTHER rows in the category
    ((sum − own)/(n − 1)), falling back to the global mean for
    singleton categories.  Naive (all-rows) target means leak the row's
    own label into its feature; LOO is the standard fix, and it is pure
    algebra over two aggregates — no per-row re-aggregation.

    Scale shape: one map-side hash agg builds the |categories|-row
    (sum, n) table and one the 1-row global prior; both BROADCAST back
    against the fact scan, so the encode is a scan-fused projection —
    at 100 TB the cost is one pass over the facts.  All micro-unit
    integer division; the %100 sample bounds the OUTPUT, not the
    computation.
    """
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").alias("price_centi"),
    )
    c = o.groupBy("cat").agg(
        F.sum("price_centi").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    g = o.agg(
        F.sum("price_centi").cast("long").alias("gs"),
        F.count(F.lit(1)).cast("long").alias("gn"),
    )
    return (
        o.join(F.broadcast(c), "cat")
        .crossJoin(F.broadcast(g))
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "cat",
            F.expr(
                "CAST(CASE WHEN n > 1"
                " THEN (10000 * (s - price_centi)) div (n - 1)"
                " ELSE (10000 * gs) div gn END AS BIGINT)"
            ).alias("loo_mean_micro"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# sample_balanced_classes — deterministic class-balance downsampling
# ---------------------------------------------------------------------------


@register(
    "sample_balanced_classes",
    oracle="""
    WITH e AS (SELECT event_id, event_type FROM events),
    counts AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM e GROUP BY event_type),
    m AS (SELECT CAST(min(n) AS BIGINT) AS m FROM counts),
    ranked AS (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)),
                                         event_id) AS rk
      FROM e
    )
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(r.event_id) AS BIGINT) AS sum_kept_ids
    FROM ranked r, m WHERE r.rk <= m.m
    GROUP BY r.event_type ORDER BY r.event_type
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASS-BALANCED downsampling — equalize class sizes by keeping,
    from every class, exactly min-class-count rows chosen by a
    content-independent hash rank (md5 of the row key): deterministic,
    re-runnable, join-consistent with any other hash-sampled artifact,
    and rand()-free like every sampler in this engine.  The output
    checksums the kept set (count + id sum per class) so the driver
    hash-verifies the SELECTION, not just its size.

    Scale shape: one |classes|-row count agg (map-side) broadcasts the
    min; the rank is one shuffle on the class key with a per-class sort.
    At extreme per-class cardinality the registered hash-rank form's
    sort becomes the cost — the documented 100 TB refinement is the
    two-pass threshold variant (histogram the hash space per class, cut
    at the quantile — the ``win_cume_dist_approx`` device), identical
    selection semantics.
    """
    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = counts.agg(F.min("n").cast("long").alias("m"))
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    ranked = e.withColumn("rk", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("event_id").cast("long").alias("sum_kept_ids"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# stream_dedup_stateful — exactly-once output from an at-least-once stream
# ---------------------------------------------------------------------------


@register(
    "stream_dedup_stateful",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique,
           CAST(sum(DISTINCT event_id) AS BIGINT) AS sum_ids
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL STREAMING DEDUP driven end to end as a checkable query:
    the event slice is staged TWICE (an at-least-once upstream — the
    reference's watch loop re-sees files after restart,
    bin/cassandra-syncer:268-277), drained through a real Structured
    Streaming file source, and ``dropDuplicates`` on the event key holds
    its state store across micro-batches so every duplicate delivery is
    suppressed — the oracle is plain DISTINCT SQL over the ORIGINAL
    (single-copy) rows, proving exactly-once output from at-least-once
    input.  The sum-of-ids column certifies the surviving SET, not just
    its size.

    Scale shape: dropDuplicates state is keyed on event_id — at
    production scale the state store is RocksDB with a watermark-scoped
    retention (``withWatermark`` + dropDuplicatesWithinWatermark bounds
    state to the lateness horizon); the unbounded form here matches the
    oracle's global-distinct semantics at validation scale.
    """
    stage = os.path.join(tempfile.gettempdir(), f"css_sdedup_stage_{os.getpid()}")
    ckpt = os.path.join(tempfile.gettempdir(), f"css_sdedup_ckpt_{os.getpid()}")
    for d in (stage, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    ev = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type")
    )
    # two staged copies = duplicate deliveries on the wire
    ev.coalesce(2).write.mode("overwrite").json(os.path.join(stage, "copy1"))
    ev.coalesce(3).write.mode("append").json(os.path.join(stage, "copy2"))

    stream = (
        spark.readStream.format("json")
        .schema("event_id long, event_type string")
        .option("maxFilesPerTrigger", 2)
        .load(os.path.join(stage, "*"))
    )
    deduped = stream.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum("event_id").cast("long").alias("sum_ids"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("css_stream_dedup_stateful")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("css_stream_dedup_stateful").orderBy("event_type")


# ---------------------------------------------------------------------------
# sample_balanced_threshold — the no-big-sort scale path for class balance
# ---------------------------------------------------------------------------


@register(
    "sample_balanced_threshold",
    oracle="""
    WITH e AS (SELECT event_id, event_type FROM events),
    counts AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
               FROM e GROUP BY event_type),
    m AS (SELECT CAST(min(n) AS BIGINT) AS m FROM counts),
    ranked AS (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)),
                                         event_id) AS rk
      FROM e
    )
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(r.event_id) AS BIGINT) AS sum_kept_ids
    FROM ranked r, m WHERE r.rk <= m.m
    GROUP BY r.event_type ORDER BY r.event_type
    """,
)
def sample_balanced_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance downsampling WITHOUT the per-class corpus sort —
    the 100 TB form of ``sample_balanced_classes``, selecting the
    IDENTICAL row set (the oracle is the rank formulation verbatim):
    because the bucket key is a PREFIX of the rank key (first 12 bits of
    the same md5), ordering by (bucket, hash, id) ≡ ordering by
    (hash, id) — so a histogram cut at the bucket level plus an exact
    rank over only the BOUNDARY bucket reproduces the full sort's
    selection with none of its cost.

    Dataflow: (1) map-side histogram of 4096 hash buckets per class;
    (2) cumulative counts + boundary bucket on the |classes|·4096
    dimension table; (3) rows below the boundary kept sort-free, rows
    IN the boundary bucket (expected n/4096 per class) ranked to fill
    the remainder.  The only sort touches the boundary slice — per-task
    work is corpus/4096 regardless of class skew, where the rank form
    serializes each class onto one task.  This is the selection analog
    of ``win_cume_dist_approx``'s position histogram, made EXACT by the
    boundary refinement.
    """
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.md5(F.col("event_id").cast("string")).alias("h"),
    ).withColumn("bkt", F.expr("cast(conv(substr(h, 1, 3), 16, 10) as bigint)"))
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = counts.agg(F.min("n").cast("long").alias("m"))
    hist = e.groupBy("event_type", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    boundary = (
        cum.crossJoin(F.broadcast(m))
        .filter(F.col("cum") >= F.col("m"))
        .groupBy("event_type")
        .agg(
            F.min("bkt").cast("long").alias("b"),
            F.max("m").alias("m"),
        )
    )
    # cum count strictly below the boundary bucket
    below = (
        cum.join(F.broadcast(boundary.select("event_type", "b")), "event_type")
        .filter(F.col("bkt") == F.col("b"))
        .select("event_type", (F.col("cum") - F.col("cnt")).alias("c_lt"))
    )
    bd = boundary.join(below, "event_type")  # event_type, b, m, c_lt
    tagged = e.join(F.broadcast(bd), "event_type")
    keep_lt = tagged.filter(F.col("bkt") < F.col("b")).select(
        "event_type", "event_id"
    )
    wb = Window.partitionBy("event_type").orderBy("h", "event_id")
    keep_eq = (
        tagged.filter(F.col("bkt") == F.col("b"))
        .withColumn("rb", F.row_number().over(wb))
        .filter(F.col("rb") <= F.col("m") - F.col("c_lt"))
        .select("event_type", "event_id")
    )
    return (
        keep_lt.unionByName(keep_eq)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("event_id").cast("long").alias("sum_kept_ids"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# events_abtest_lift — deterministic A/B split + conversion lift
# ---------------------------------------------------------------------------


@register(
    "events_abtest_lift",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) AS BIGINT) % 2 AS arm,
             CAST(CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END)
                            >= 14 THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_conv,
             CAST((1000000 * sum(converted)) // count(*) AS BIGINT) AS conv_micro
      FROM u GROUP BY arm
    )
    SELECT a.arm, a.n_users, a.n_conv, a.conv_micro,
           CAST(a.conv_micro
                - (SELECT conv_micro FROM arms WHERE arm = 0) AS BIGINT)
             AS lift_vs_control_micro
    FROM arms a ORDER BY a.arm
    """,
)
def events_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a DETERMINISTIC assignment: users
    split into arms by md5 hash parity (the same content-independent
    device as every sampler here — re-runnable, join-consistent, no
    rand()), per-arm conversion to 'purchase' at USER grain (any
    conversion counts once), and each arm's lift against the control
    arm in exact micro-units.  The hash assignment is what production
    experimentation systems actually do (bucketing by user-id hash), so
    this query doubles as the analysis-side verification that a hash
    split is balanced.

    Scale shape: one user-grain agg (map-side partial over the event
    scan) then a 2-row arm table; the control scalar broadcasts back.
    No corpus-sized shuffle beyond the user-key agg that any per-user
    metric pays.
    """
    from cassandra_syncer_spark.operators import fingerprint as fp

    u = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            # conversion = a "heavy purchaser" (≥ 14 purchase events) so the
            # fixture yields a non-degenerate ~50/50 outcome; production
            # plugs in whatever user-grain success predicate applies
            F.when(
                F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14, 1
            )
            .otherwise(0)
            .cast("long")
            .alias("converted")
        )
        .select(
            (F.expr(fp.hash32("CAST(user_id AS STRING)", duck=False)) % 2).alias(
                "arm"
            ),
            "converted",
        )
    )
    arms = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
        F.expr(
            "CAST((1000000 * sum(converted)) div count(*) AS BIGINT)"
        ).alias("conv_micro"),
    )
    control = arms.filter(F.col("arm") == 0).select(
        F.col("conv_micro").alias("control_micro")
    )
    return (
        arms.crossJoin(F.broadcast(control))
        .select(
            "arm",
            "n_users",
            "n_conv",
            "conv_micro",
            (F.col("conv_micro") - F.col("control_micro"))
            .cast("long")
            .alias("lift_vs_control_micro"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# embed_cluster_purity — label purity of the sign-prefix blocking cells
# ---------------------------------------------------------------------------


def _purity_sql() -> str:
    from cassandra_syncer_spark.queries.llm_similarity import _KNN_CODE_DUCK

    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    n AS (
      SELECT CAST(length(bin(greatest((count(*) + 249) // 250, 8) - 1))
             AS BIGINT) AS b
      FROM e
    ),
    cells AS (
      SELECT vec_id, label, ({_KNN_CODE_DUCK}) >> (63 - n.b) AS cell
      FROM e, n
    ),
    cl AS (
      SELECT cell, label, CAST(count(*) AS BIGINT) AS cnt
      FROM cells GROUP BY cell, label
    ),
    per_cell AS (
      SELECT cell, CAST(sum(cnt) AS BIGINT) AS n_vecs,
             CAST(max(cnt) AS BIGINT) AS n_major
      FROM cl GROUP BY cell
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(n_vecs) AS BIGINT) AS n_vecs,
           CAST(max(n_vecs) AS BIGINT) AS max_cell,
           CAST((1000000 * sum(n_major)) // sum(n_vecs) AS BIGINT)
             AS purity_micro
    FROM per_cell
    """


@register("embed_cluster_purity", oracle=_purity_sql())
def embed_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality AUDIT, label side: for every sign-prefix cell
    (the ANN blocking key of ``sim_knn_graph_ivf``/``sim_recall_audit``),
    the fraction of vectors sharing the cell's majority label —
    corpus-weighted into one purity score plus the cell-size ceiling.
    ``sim_recall_audit`` certifies the blocking GEOMETRICALLY (does it
    recover true neighbors); this certifies it SEMANTICALLY (do
    same-label vectors co-locate) — together they are the two-sided
    index-quality report a production ANN deployment watches.

    Scale shape: O(N) scan-fused code assignment (no centroid join), one
    (cell, label) hash agg, then pure dimension-table math over the
    cell histogram.  One corpus shuffle total, keyed on (cell, label).
    """
    from cassandra_syncer_spark.queries.llm_similarity import (
        _KNN_CODE_SPARK,
        _vec,
    )

    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "label", "v")
    bbits = emb.agg(
        F.expr(
            "cast(length(bin(greatest((count(*) + 249) div 250, 8) - 1)) as bigint)"
        ).alias("b")
    )
    cells = emb.crossJoin(F.broadcast(bbits)).select(
        "vec_id",
        "label",
        F.expr(f"shiftright({_KNN_CODE_SPARK}, cast(63 - b as int))").alias("cell"),
    )
    cl = cells.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_cell = cl.groupBy("cell").agg(
        F.sum("cnt").cast("long").alias("n_vecs"),
        F.max("cnt").cast("long").alias("n_major"),
    )
    return per_cell.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n_vecs").cast("long").alias("n_vecs"),
        F.max("n_vecs").cast("long").alias("max_cell"),
        F.expr(
            "CAST((1000000 * sum(n_major)) div sum(n_vecs) AS BIGINT)"
        ).alias("purity_micro"),
    )
