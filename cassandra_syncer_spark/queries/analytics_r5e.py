"""Round-5 batch 5: unblocked embedding near-dup, directional containment
verify, sliding distinct via mergeable bitmap partials, z-order layout
clustering, and schema-evolution reads.

Same contract as every other query module: md5/sign/bit arithmetic is
derived identically on both engines (operators/fingerprint.py rationale),
integer micro-units before any cross-engine float comparison, every
computed column aliased the same in Spark and DuckDB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.operators import adaptive_bands as ab
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# dedup_embed_simhash — banded sign-code near-dup over embeddings
# ---------------------------------------------------------------------------

#: 63-bit sign code, banded with CORPUS-DERIVED geometry
#: (operators/adaptive_bands.py): below 16384 vectors, 7 disjoint 9-bit
#: bands; above, 84 Manku block-combination tables keyed on 21 bits.  Any
#: pair with Hamming distance <= 6 shares a band key under BOTH geometries
#: (pigeonhole), so recall is exact below 7 and probabilistic above it —
#: standard LSH banding math; the 7..16 shell is geometry-dependent, which
#: is why the oracle embeds the identical mask literals and threshold.
_EMB_HAMMING_MAX = 16

#: 63-bit sign code (bit 63 would overflow signed BIGINT differently per
#: engine) — expression parity with sim_hamming_ann (analytics_r5c.py).
_CODE_SPARK = (
    "aggregate(sequence(0, 62), 0L,"
    " (acc, i) -> acc + IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))"
)
_CODE_DUCK = (
    "CAST(list_sum(list_transform(range(0, 63),"
    " i -> CASE WHEN v[i + 1] > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END))"
    " AS BIGINT)"
)


@register(
    "dedup_embed_simhash",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_CODE_DUCK} AS code FROM e),
    g AS (SELECT {ab.geometry_case(ab.EMB_NARROW, ab.EMB_WIDE, ab.EMB_THRESHOLD, duck=True)} AS masks
          FROM embeddings),
    bands0 AS (SELECT vec_id, v, code, unnest(g.masks) AS band_id FROM c, g),
    bands AS (SELECT vec_id, v, code, band_id, code & band_id AS band_val FROM bands0),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(bit_count(xor(a.code, b.code)) AS BIGINT) AS hamming,
             round(list_inner_product(a.v, b.v), 4) AS cosine
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
      WHERE bit_count(xor(a.code, b.code)) <= {_EMB_HAMMING_MAX}
    )
    SELECT vec_a, vec_b, hamming, cosine FROM cand ORDER BY vec_a, vec_b
    """,
)
def dedup_embed_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBLOCKED embedding near-dup: 63-bit sign codes banded into
    CORPUS-DERIVED buckets, bucket-local candidate pairs verified by
    Hamming distance and exact cosine — the production blocking key
    `dedup_embed_cosine`'s label-blocked demo stands in for.  Any pair
    within Hamming 6 is guaranteed a shared band key under either
    geometry (pigeonhole); beyond that the banding is probabilistic,
    standard LSH semantics.

    Band geometry is the 100 TB lever (operators/adaptive_bands.py): the
    round-5 fixed 7x9-bit bands accrued chance collisions ~N²/2^9 — the
    α-residual SCALING.md measured at the sf10 constant-density replica.
    A 1-row count aggregate (broadcast, never collected) switches to the
    Manku block-combination geometry (84 tables keyed on 21 bits) past
    16384 vectors, returning bucket occupancy to ~constant; the oracle
    embeds the identical mask literals and threshold so the
    geometry-dependent 7..16 Hamming shell stays in lockstep at every
    scale factor.

    Scale shape: identical to `dedup_simhash` — one scan computes codes,
    the only shuffle is on (band_id, band_val), pair expansion is a
    bucket-local SELF-JOIN (never collect_list; AQE skew-split applies;
    both join inputs reuse one exchange), and the exact-cosine verify
    reads only candidate vectors.  At 100 TB the banded join touches
    8-byte codes, not 256-byte float vectors — vectors join back in only
    for the surviving candidates.
    """
    from cassandra_syncer_spark.session import fan_out

    # round-11: fan the sign-code + banding math across cores (the sf-scale
    # scan is one parquet row group → one task); no-op at scale
    e = fan_out(
        T(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        ),
        spark,
    )
    geom = T(spark, sf_dir, "embeddings").agg(
        F.expr(
            ab.geometry_case(ab.EMB_NARROW, ab.EMB_WIDE, ab.EMB_THRESHOLD, duck=False)
        ).alias("masks")
    )
    # the banded join carries ONLY (vec_id, code, band) — 8-byte codes, not
    # the 256-byte vectors; vectors join back in for surviving candidates
    bands = (
        e.select("vec_id", F.expr(_CODE_SPARK).alias("code"))
        .crossJoin(F.broadcast(geom))
        .select("vec_id", "code", F.explode("masks").alias("band_id"))
        .withColumn("band_val", F.expr("code & band_id"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.expr("a.code ^ b.code"))
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(hamming <= _EMB_HAMMING_MAX)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
    )
    from cassandra_syncer_spark.queries.llm_similarity import _dot

    va, vb = e.alias("va"), e.alias("vb")
    dot = _dot(F.col("va.v"), F.col("vb.v"))
    return (
        cand.join(va, cand.vec_a == F.col("va.vec_id"))
        .join(vb, cand.vec_b == F.col("vb.vec_id"))
        .select("vec_a", "vec_b", "hamming", F.round(dot, 4).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# dedup_containment — directional containment verify on MinHash candidates
# ---------------------------------------------------------------------------


def _containment_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    return f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS uw FROM documents)
    SELECT c.doc_a, c.doc_b,
           (1000000 * len(list_intersect(da.uw, db.uw))) // len(da.uw)
             AS cont_a_micro,
           (1000000 * len(list_intersect(da.uw, db.uw))) // len(db.uw)
             AS cont_b_micro
    FROM cand c
    JOIN d da ON c.doc_a = da.doc_id
    JOIN d db ON c.doc_b = db.doc_id
    ORDER BY doc_a, doc_b
    """


@register("dedup_containment", oracle=_containment_sql())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment verify (|A∩B|/|A| and |A∩B|/|B|) over
    MinHash band candidates — the asymmetric complement to
    `dedup_verify_jaccard`: a short document quoted inside a long one has
    low Jaccard but containment ≈ 1 on the short side, the signal that
    catches quote/subset duplication (the case symmetric verifies miss).

    Scale shape: identical to the Jaccard verify — candidates from the
    bucket-local band self-join, word sets joined back by doc_id touching
    candidate docs only.  Scores are integer micro-units via exact
    integer division, so both engines cut identically.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("uw")
    )
    da, db = docs.alias("da"), docs.alias("db")
    inter = F.size(F.array_intersect(F.col("da.uw"), F.col("db.uw")))
    return (
        cand.join(da, cand.doc_a == F.col("da.doc_id"))
        .join(db, cand.doc_b == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("(1000000 * size(array_intersect(da.uw, db.uw)))"
                   " div size(da.uw)").alias("cont_a_micro"),
            F.expr("(1000000 * size(array_intersect(da.uw, db.uw)))"
                   " div size(db.uw)").alias("cont_b_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# win_sliding_distinct — sliding-window distinct via mergeable bitmap partials
# ---------------------------------------------------------------------------

_HOUR_NS = 3_600_000_000_000
_SLIDE_HOURS = 3


@register(
    "win_sliding_distinct",
    oracle=f"""
    WITH e AS (SELECT epoch_ns(ts) // {_HOUR_NS} AS h, user_id FROM events),
    hours AS (SELECT DISTINCT h FROM e)
    SELECT hours.h AS hour, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM hours JOIN e ON e.h BETWEEN hours.h - {_SLIDE_HOURS - 1} AND hours.h
    GROUP BY hours.h ORDER BY hour
    """,
)
def win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per trailing 3-hour window, one row per hour —
    the sliding count-distinct that naive plans re-scan the fact table
    once per pane for.

    Scale shape — the overlap never re-reads raw rows: events fold ONCE
    to per-(hour, bucket) bitmap partials (bucket = user_id div 64, one
    bit per user, map-side bit_or combine — the `agg_distinct_bitmap`
    pattern), each partial then fans out to the <=3 panes it serves and a
    second bit_or merges per pane.  Shuffle volume is
    hours x id-space/64 8-byte longs, independent of event count; the
    three-way pane overlap costs 3 partial rows, not 3 fact scans.  The
    same partials persist across days (mergeable), so the steady-state
    pipeline only folds the new hour.  Panes are emitted for hours that
    exist in the data (semi-join against the tiny distinct-hours frame).
    """
    ev = T(spark, sf_dir, "events")
    partial = (
        ev.select(
            F.expr(f"ts_ns div {_HOUR_NS}").alias("h"),
            F.expr("user_id div 64").alias("bucket"),
            F.expr("shiftleft(1L, int(user_id % 64))").alias("bit"),
        )
        .groupBy("h", "bucket")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )
    panes = partial.select(
        F.explode(F.expr(f"sequence(h, h + {_SLIDE_HOURS - 1})")).alias("hour"),
        "bucket",
        "bm",
    )
    hours = ev.select(F.expr(f"ts_ns div {_HOUR_NS}").alias("hour")).distinct()
    return (
        panes.join(hours, "hour", "left_semi")
        .groupBy("hour", "bucket")
        .agg(F.expr("bit_or(bm)").alias("bm"))
        .groupBy("hour")
        .agg(F.sum(F.bit_count("bm")).cast("long").alias("n_users"))
        .orderBy("hour")
    )


# ---------------------------------------------------------------------------
# layout_zorder_cluster — z-order interleave layout statistics
# ---------------------------------------------------------------------------

_Z_BITS = 8  # low 8 bits of each dimension -> 16-bit z-value
_Z_BUCKETS = 16


def _z_expr(a: str, b: str, *, duck: bool) -> str:
    """16-bit Morton interleave of the low 8 bits of two dims — identical
    shift/mask arithmetic on both engines."""
    terms = []
    for i in range(_Z_BITS):
        if duck:
            terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
        else:
            terms.append(f"(shiftleft(shiftright({a}, {i}) & 1, {2 * i}))")
            terms.append(f"(shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1}))")
    return " + ".join(terms)


@register(
    "layout_zorder_cluster",
    oracle=f"""
    WITH k AS (
      SELECT l_partkey % 256 AS pa, l_suppkey % 256 AS sb FROM lineitem
    ),
    z AS (SELECT pa, sb, ({_z_expr('pa', 'sb', duck=True)}) AS zval FROM k)
    SELECT zval // {65536 // _Z_BUCKETS} AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(pa) AS BIGINT) AS pa_min, CAST(max(pa) AS BIGINT) AS pa_max,
           CAST(min(sb) AS BIGINT) AS sb_min, CAST(max(sb) AS BIGINT) AS sb_max
    FROM z GROUP BY 1 ORDER BY zbucket
    """,
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout: interleave the bits of two join
    dimensions into one z-value and bucket rows by its prefix — the
    multi-dimensional file-clustering lever behind Delta/Iceberg OPTIMIZE
    ZORDER.  The per-bucket min/max of BOTH source dimensions is the
    point: each z-prefix bucket bounds *both* dims (pa and sb ranges stay
    narrow per bucket), so parquet min/max file stats prune scans on
    EITHER predicate — linear-order clustering bounds only its leading
    key.  tests/test_operators.py gates the locality property vs a
    single-dim sort.

    Scale shape: the z-value is plan-time shift/mask arithmetic fused
    into the scan; the production write path is
    `repartitionByRange(zbucket).sortWithinPartitions(zval).write` — the
    stats query here is one tiny-key agg (16 buckets) with map-side
    combine, no joins.
    """
    k = T(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("pa"), (F.col("l_suppkey") % 256).alias("sb")
    )
    z = k.select("pa", "sb", F.expr(_z_expr("pa", "sb", duck=False)).alias("zval"))
    return (
        z.groupBy((F.col("zval") / (65536 // _Z_BUCKETS)).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("pa").cast("long").alias("pa_min"),
            F.max("pa").cast("long").alias("pa_max"),
            F.min("sb").cast("long").alias("sb_min"),
            F.max("sb").cast("long").alias("sb_max"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# scan_schema_evolution — mergeSchema read over schema generations
# ---------------------------------------------------------------------------


@register(
    "scan_schema_evolution",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_with_chars,
           CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (§2.1 breadth): two parquet generations —
    gen 1 written before a column existed, gen 2 with it — read back as
    ONE table via mergeSchema, the older generation's missing column
    surfacing as nulls.  This is how a 100 TB lake actually looks after a
    year of pipeline evolution; rewriting history to add a column is not
    an option at that scale.

    Scale note: mergeSchema reconciles footers (metadata), not data — but
    it reads a footer per file, so production pins the merged schema in
    the table catalog (or passes it explicitly) once known; the per-query
    footer sweep here is the discovery step, paid once.
    """
    out = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_sinks",
        f"schemaevo-{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{spark.sparkContext.applicationId}",
    )
    docs = T(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "gen=1"))
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("n_chars").cast("long").alias("n_with_chars"),
            F.sum(F.coalesce("n_chars", F.lit(0))).cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )
