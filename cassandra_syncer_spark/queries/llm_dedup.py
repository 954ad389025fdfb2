"""Deduplication operators — the mandated training-data-pipeline surface:
exact (hash), MinHash+LSH banding, SimHash-band near-dup, n-gram Jaccard,
embedding-cosine near-dup.

All variants share the same scale shape: derive a compact key per document
(hash / band key / block key), shuffle once on that key, and only ever
compare candidate pairs *within* a bucket — never all pairs.  At 100 TB the
bucket join is the only quadratic term, and it is bounded by bucket size
(see operators/fingerprint.py for the banding math).

Every query here is oracle-checked: the fingerprint hashes are md5-derived
so DuckDB evaluates identical formulas (no MLlib/JVM-specific hashing on
the checked paths; the MLlib LSH variant lives in llm_similarity.py as a
rows-only query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import adaptive_bands as ab
from cassandra_syncer_spark.operators import fingerprint as fp
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register
from cassandra_syncer_spark.session import fan_out


@register(
    "dedup_exact_text",
    oracle="""
    SELECT count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_distinct,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_rows
    FROM documents
    """,
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup summary: md5-of-text identity (the reference's
    etag semantics, storage-object.js:123-124) over the corpus."""
    docs = T(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).cast("long").alias("n_dup_rows"),
    )


def _minhash_cte(duck: bool) -> str:
    """CTE producing (doc_id, mh0..mh7) from documents.

    One md5 per shingle (``hb``), then the 8 permutations by universal
    hashing — see operators/fingerprint.py.
    """
    words = fp.words_expr("text", duck=duck)
    sh = fp.shingles_expr("words", duck=duck)
    mh = ", ".join(
        f"{fp.minhash_expr('hb', p, duck=duck)} AS mh{p}" for p in range(fp.NUM_PERMS)
    )
    return f"""
      WITH w AS (SELECT doc_id, {words} AS words FROM documents),
      s AS (SELECT doc_id, {sh} AS sh FROM w),
      hb AS (SELECT doc_id, {fp.shingle_hash_array('sh', duck=duck)} AS hb FROM s),
      sig AS (SELECT doc_id, {mh} FROM hb)
    """


def _band_union(duck: bool) -> str:
    """UNION ALL of one row per (doc_id, band_id, band_key)."""
    parts = []
    for b in range(fp.BANDS):
        key = fp.band_key_expr([f"mh{p}" for p in range(fp.NUM_PERMS)], b, duck=duck)
        parts.append(f"SELECT doc_id, {b} AS band_id, {key} AS band_key FROM sig")
    return " UNION ALL ".join(parts)


_MINHASH_SQL_TEMPLATE = """
    {cte},
    bands AS ({bands}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band_id
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared_bands
    FROM pairs GROUP BY doc_a, doc_b
"""


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_id, band_key) dataflow — the shared LSH-banding
    front end of every MinHash dedup variant."""
    # signature math is the expensive per-row stage — fan it out across all
    # cores (no-op at scale where the scan is already wide, see session.fan_out)
    docs = fan_out(T(spark, sf_dir, "documents"), spark)
    words = fp.words_expr("text", duck=False)
    sh = fp.shingles_expr("words", duck=False)
    sig = (
        docs.selectExpr("doc_id", f"{words} AS words")
        .selectExpr("doc_id", f"{sh} AS sh")
        .selectExpr("doc_id", f"{fp.shingle_hash_array('sh', duck=False)} AS hb")
        .selectExpr(
            "doc_id",
            *[
                f"{fp.minhash_expr('hb', p, duck=False)} AS mh{p}"
                for p in range(fp.NUM_PERMS)
            ],
        )
    )
    band_keys = [
        fp.band_key_expr([f"mh{p}" for p in range(fp.NUM_PERMS)], b, duck=False)
        for b in range(fp.BANDS)
    ]
    return sig.selectExpr(
        "doc_id", f"posexplode(array({', '.join(band_keys)})) AS (band_id, band_key)"
    )


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared MinHash candidate-pair dataflow: (doc_a, doc_b,
    n_shared_bands) — the body of ``text_minhash_dedup``, reused by the
    cluster query.

    Scale shape (same rewrite as ``dedup_simhash``): candidate pairs come
    from a bucket-local SELF-JOIN on (band_id, band_key) — never a
    per-bucket ``collect_list``, which would pack a hot band key's whole
    bucket into ONE unbounded array row (single-task OOM at 100 TB;
    dup-heavy crawls make hot bands the norm).  The join keeps every
    bucket's pair expansion distributed and AQE skew-split applies; both
    join inputs are the identical banded subplan shuffled on the same
    key, so Spark plans ONE signature pass and a ReusedExchange for the
    other side (asserted in tests/test_plans.py).  For pathologically hot
    buckets beyond AQE's reach, :func:`cassandra_syncer_spark.operators.
    skew.salted_self_pairs` is the documented cap rule.
    """
    bands = _minhash_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_bands")
    )


@register(
    "text_minhash_dedup",
    oracle=_MINHASH_SQL_TEMPLATE.format(cte=_minhash_cte(True), bands=_band_union(True)),
)
def text_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 3-word shingles → one md5 per
    shingle → 8 universal-hash permutations → 4 bands of 2 → bucket-local
    pair generation.

    Scale shape: the md5 pass happens exactly once (staged projections keep
    Catalyst from inlining the hash array into its 8 consumers), the only
    shuffle is on (band_id, band_key), and pairs are expanded by a
    bucket-local self-join — cost bounded by bucket size², never corpus²,
    and never one task per bucket (see ``_minhash_pairs``).  Banding
    math in operators/fingerprint.py.
    """
    return _minhash_pairs(spark, sf_dir)


_INCREMENTAL_SQL = f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)})
    SELECT b.doc_id AS doc_id,
           CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_matches,
           CAST(min(a.doc_id) AS BIGINT) AS first_match
    FROM bands b JOIN bands a
      ON b.band_id = a.band_id AND b.band_key = a.band_key
    WHERE b.doc_id % 5 = 0 AND a.doc_id % 5 <> 0
    GROUP BY b.doc_id ORDER BY doc_id
"""


@register("dedup_incremental_minhash", oracle=_INCREMENTAL_SQL)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW batch of documents (here doc_id % 5 = 0,
    standing in for today's crawl) checked against the EXISTING corpus
    (the rest) via the shared MinHash band index — each new doc that
    shares any LSH band with an existing doc reports how many existing
    docs it collides with and the smallest such doc_id.

    Scale shape: this is the steady-state 100 TB dedup pattern — the
    existing side's (band_id, band_key, doc_id) index is computed once and
    persisted (bucketed by band_key), so each incoming batch only
    signatures its own docs and equi-joins on the band key; shuffle volume
    is O(batch + matched buckets), never O(corpus).  Here both sides
    derive from one scan so the signature stage is shared and computed
    once.
    """
    bands = _minhash_bands(spark, sf_dir)
    new_b = bands.filter(F.col("doc_id") % 5 == 0).alias("n")
    old_b = bands.filter(F.col("doc_id") % 5 != 0).alias("e")
    return (
        new_b.join(
            old_b,
            (F.col("n.band_id") == F.col("e.band_id"))
            & (F.col("n.band_key") == F.col("e.band_key")),
        )
        .groupBy(F.col("n.doc_id").alias("doc_id"))
        .agg(
            F.countDistinct(F.col("e.doc_id")).cast("long").alias("n_matches"),
            F.min(F.col("e.doc_id")).cast("long").alias("first_match"),
        )
        .orderBy("doc_id")
    )


_COMPONENTS_SQL = (
    "WITH RECURSIVE"
    + _minhash_cte(True).replace("WITH ", "", 1)
    + f""",
    bands AS ({_band_union(True)}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
              UNION SELECT doc_b, doc_a FROM cand),
    reach(id, r) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY id
    """
)


@register("dedup_cluster_components", oracle=_COMPONENTS_SQL)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *clusters*: connected components over the MinHash
    candidate-pair graph — the operation a training pipeline actually
    executes to drop duplicates (keep the minimum doc_id of each
    component, drop the rest).

    Spark side: min-label propagation (operators/components.py — one
    equi-join + one agg per round, rounds bounded by component diameter).
    Oracle side: the same clusters via a recursive transitive-closure CTE.
    Both derive candidate pairs from the identical md5-based banding
    formulas, so the component labels match exactly.
    """
    from cassandra_syncer_spark.operators.components import connected_components

    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return (
        connected_components(pairs, src="doc_a", dst="doc_b")
        .select(
            F.col("id").cast("long").alias("doc_id"),
            F.col("component").cast("long").alias("component"),
        )
    )


_APPLY_CLUSTERS_SQL = (
    _COMPONENTS_SQL.replace(
        """
    SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
        """
    , comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT (SELECT count(*) FROM documents) AS n_total,
           CAST((SELECT count(*) FROM comp WHERE id <> component) AS BIGINT) AS n_dropped,
           CAST((SELECT count(*) FROM documents)
                - (SELECT count(*) FROM comp WHERE id <> component) AS BIGINT) AS n_kept
    """,
    )
)


@register("dedup_apply_clusters", oracle=_APPLY_CLUSTERS_SQL)
def dedup_apply_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's last mile: apply the near-dup clusters to the
    corpus — keep each component's canonical member (minimum doc_id), drop
    the rest — and report the corpus contraction.

    Execution shape at scale: components (one label row per clustered doc)
    anti-join the corpus on doc_id — a single hash-shuffle on the key; the
    corpus itself never materializes driver-side.
    """
    docs = T(spark, sf_dir, "documents")
    labels = dedup_cluster_components(spark, sf_dir)
    drop = labels.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    kept = docs.join(drop, "doc_id", "left_anti")
    return docs.agg(F.count(F.lit(1)).alias("n_total")).crossJoin(
        drop.agg(F.count(F.lit(1)).cast("long").alias("n_dropped"))
    ).crossJoin(kept.agg(F.count(F.lit(1)).cast("long").alias("n_kept")))


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, n_chars, list_distinct(string_split(text, ' ')) AS uw
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           round(CAST(len(list_intersect(a.uw, b.uw)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.uw, b.uw))), 4) AS jaccard
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard over blocked candidate pairs.

    Blocking key = (lang, n_chars): the verify stage of a near-dup pipeline
    runs exact Jaccard only on candidates, here ~tens of pairs instead of
    125k all-pairs.  At scale the blocking key is the MinHash band from
    text_minhash_dedup; the verify join is identical.
    """
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.array_distinct(F.split("text", " ")).alias("uw")
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.uw"), F.col("b.uw")))
    union = F.size(F.array_union(F.col("a.uw"), F.col("b.uw")))
    return a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.n_chars") == F.col("b.n_chars"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.lang").alias("lang"),
        F.round(inter.cast("double") / union, 4).alias("jaccard"),
    )


@register(
    "dedup_minhash_salted",
    oracle=_MINHASH_SQL_TEMPLATE.format(cte=_minhash_cte(True), bands=_band_union(True)),
)
def dedup_minhash_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_minhash_dedup`` routed through the hot-bucket cap rule:
    pair expansion via :func:`~cassandra_syncer_spark.operators.skew.
    salted_self_pairs` (cap 1000) instead of the plain bucket-local
    self-join.  Same oracle as text_minhash_dedup — the salting is
    pair-set-exact by construction, and this query proves it on the real
    banding dataflow under the driver's hash check.

    At fixture scale every bucket sits under the cap, so S=1 everywhere
    and the plan degenerates to the plain join plus one window count —
    the overhead a production pipeline pays for hot-bucket immunity.
    """
    from cassandra_syncer_spark.operators.skew import salted_self_pairs

    bands = _minhash_bands(spark, sf_dir)
    pairs = salted_self_pairs(
        bands, key_cols=["band_id", "band_key"], id_col="doc_id", cap=1000
    )
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_bands")
    )


_VERIFY_JACCARD_SQL = f"""
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
           round(CAST(len(list_intersect(da.uw, db.uw)) AS DOUBLE)
                 / len(list_distinct(list_concat(da.uw, db.uw))), 4) AS jaccard
    FROM cand c
    JOIN d da ON c.doc_a = da.doc_id
    JOIN d db ON c.doc_b = db.doc_id
    WHERE round(CAST(len(list_intersect(da.uw, db.uw)) AS DOUBLE)
                / len(list_distinct(list_concat(da.uw, db.uw))), 4) >= 0.5
    ORDER BY doc_a, doc_b
"""


@register("dedup_verify_jaccard", oracle=_VERIFY_JACCARD_SQL)
def dedup_verify_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed two-stage near-dup pipeline the docstrings promise:
    MinHash band buckets as the BLOCKING key (candidate generation, from
    ``_minhash_pairs``'s bucket-local self-join) followed by exact
    word-set Jaccard on the candidates only, keeping pairs ≥ 0.5 — i.e.
    ``dedup_ngram_jaccard``'s verify stage running on its production
    blocking key instead of the (lang, n_chars) demo key.

    Scale shape: candidate volume is bounded by the banding math (bucket-
    local, never corpus²); the verify stage joins each candidate pair
    back to the two word sets by doc_id — two hash joins on the corpus
    key, each touching only candidate docs after the semi-join pushdown.
    The threshold applies to the ROUNDED value on both engines so the
    cut is identical.
    """
    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("uw")
    )
    da, db = docs.alias("da"), docs.alias("db")
    inter = F.size(F.array_intersect(F.col("da.uw"), F.col("db.uw")))
    union = F.size(F.array_union(F.col("da.uw"), F.col("db.uw")))
    return (
        cand.join(da, cand.doc_a == F.col("da.doc_id"))
        .join(db, cand.doc_b == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


_AGREE_DUCK = " + ".join(
    f"CAST(sa.mh{p} = sb.mh{p} AS INT)" for p in range(fp.NUM_PERMS)
)
_ESTIMATE_SQL = f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ss AS (SELECT doc_id, list_distinct(sh) AS u FROM s)
    SELECT c.doc_a, c.doc_b,
           CAST(({_AGREE_DUCK}) AS BIGINT) AS n_agree,
           CAST(({_AGREE_DUCK}) * {1_000_000 // fp.NUM_PERMS} AS BIGINT)
             AS est_micro,
           CAST(round(1000000.0 * len(list_intersect(ua.u, ub.u))
                      / len(list_distinct(list_concat(ua.u, ub.u)))) AS BIGINT)
             AS jacc_micro
    FROM cand c
    JOIN sig sa ON c.doc_a = sa.doc_id
    JOIN sig sb ON c.doc_b = sb.doc_id
    JOIN ss ua ON c.doc_a = ua.doc_id
    JOIN ss ub ON c.doc_b = ub.doc_id
    ORDER BY doc_a, doc_b
"""


@register("dedup_minhash_estimate", oracle=_ESTIMATE_SQL)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-as-estimator certification: for every band-candidate pair,
    the signature-agreement estimate of Jaccard (fraction of the 8
    permutations agreeing, in micro-units) SIDE BY SIDE with the exact
    shingle-set Jaccard it estimates — the sketch-vs-exact envelope row
    for the dedup family, completing what ``agg_*_bounds`` does for
    HLL/GK (here both engines reproduce the identical signatures, so the
    estimates themselves hash-match; no boolean waiver needed).

    At 100 TB only the estimate column is computable (exact Jaccard per
    pair needs both shingle sets); this query is the validation-scale
    evidence that the banding parameters track truth —
    tests/test_operators.py::test_minhash_estimate_tracks_jaccard gates
    the mean absolute error.

    Scale shape: candidates from the bucket-local band self-join
    (``_minhash_pairs``); signatures and distinct-shingle sets join back
    by doc_id, touching candidate docs only.
    """
    docs = fan_out(T(spark, sf_dir, "documents"), spark)
    words = fp.words_expr("text", duck=False)
    sh = fp.shingles_expr("words", duck=False)
    staged = (
        docs.selectExpr("doc_id", f"{words} AS words")
        .selectExpr("doc_id", f"{sh} AS sh")
        .selectExpr(
            "doc_id",
            "array_distinct(sh) AS u",
            f"{fp.shingle_hash_array('sh', duck=False)} AS hb",
        )
        .selectExpr(
            "doc_id",
            "u",
            *[
                f"{fp.minhash_expr('hb', p, duck=False)} AS mh{p}"
                for p in range(fp.NUM_PERMS)
            ],
        )
    )
    cand = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sa = staged.alias("sa")
    sb = staged.alias("sb")
    n_agree = sum(
        (F.col(f"sa.mh{p}") == F.col(f"sb.mh{p}")).cast("int")
        for p in range(fp.NUM_PERMS)
    ).cast("long")
    inter = F.size(F.array_intersect(F.col("sa.u"), F.col("sb.u")))
    union = F.size(F.array_union(F.col("sa.u"), F.col("sb.u")))
    return (
        cand.join(sa, cand.doc_a == F.col("sa.doc_id"))
        .join(sb, cand.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            n_agree.alias("n_agree"),
            (n_agree * (1_000_000 // fp.NUM_PERMS)).cast("long").alias("est_micro"),
            F.round(F.lit(1000000.0) * inter / union).cast("long").alias("jacc_micro"),
        )
        .orderBy("doc_a", "doc_b")
    )


_SIMHASH_CTE_DUCK = f"""
    WITH w AS (SELECT doc_id, {fp.words_expr("text", duck=True)} AS words FROM documents),
    sgl AS (SELECT doc_id, {fp.shingles_expr("words", duck=True)} AS sh0 FROM w),
    h AS (SELECT doc_id, {fp.shingle_hash_array("sh0", duck=True)} AS harr FROM sgl),
    sig AS (SELECT doc_id, CAST({fp.simhash_expr('harr', duck=True)} AS BIGINT) AS sh FROM h),
    bands AS (
      SELECT doc_id, sh, b.k AS band_id, (sh // power_val) % 256 AS band_val
      FROM sig, (SELECT unnest(range(4)) AS k) b,
           LATERAL (SELECT CAST(power(256, b.k) AS BIGINT) AS power_val) p
    )
"""


def _simhash_adaptive_oracle() -> str:
    g_case = ab.geometry_case(ab.DOC_NARROW, ab.DOC_WIDE, ab.DOC_THRESHOLD, duck=True)
    return f"""
    WITH w AS (SELECT doc_id, {fp.words_expr("text", duck=True)} AS words FROM documents),
    sgl AS (SELECT doc_id, {fp.shingles_expr("words", duck=True)} AS sh0 FROM w),
    h AS (SELECT doc_id, {fp.shingle_hash_array("sh0", duck=True)} AS harr FROM sgl),
    sig AS (SELECT doc_id, CAST({fp.simhash_expr('harr', duck=True)} AS BIGINT) AS sh FROM h),
    g AS (SELECT {g_case} AS masks FROM documents),
    {ab.bands_cte('sig', 'doc_id', 'sh', duck=True)}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """


@register("dedup_simhash", oracle=_simhash_adaptive_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit signature over 3-word-shingle hashes,
    candidate pairs share ≥1 band key, verified by Hamming distance ≤ 3.

    Two lessons encoded here (both measured at sf0.1):
    - the signal must be shingles, not distinct words — this corpus shares
      one small vocabulary, so word-set simhashes degenerate (6.3M "near
      dup" pairs); shingle simhashes yield 230;
    - band width is the scale lever: fixed-width bands accrue chance
      collisions ~N²/2^w (the α≈1.22 residual SCALING.md measured at the
      sf10 replica), so the band GEOMETRY is corpus-derived
      (operators/adaptive_bands.py): below 6144 docs, 4 disjoint byte
      bands; above, the Manku block-combination geometry — 56 tables
      keyed on 20 bits (8 nibbles choose 5) — returns bucket occupancy
      to ~constant.  Both geometries guarantee every Hamming≤3 pair a
      shared key (pigeonhole), so the OUTPUT is geometry-invariant and
      bit-identical across the switch; the 1-row geometry aggregate
      broadcasts, never collects.

    Scale shape: candidate pairs come from a bucket-local SELF-JOIN on
    (band_id, band_val) — never a per-bucket ``collect_list``, which would
    pack a hot band value into one unbounded array row (single-task OOM at
    100 TB).  The join keeps every bucket's pair expansion distributed and
    AQE skew-split applies; both join inputs are the identical banded
    subplan shuffled on the same key, so Spark plans ONE signature pass and
    a ReusedExchange for the other side (asserted in tests/test_plans.py).
    """
    # fan the signature computation out across all cores — the md5 + 32
    # filter passes were measured serialized onto one task at sf0.1 (one
    # parquet row group); no-op at scale (session.fan_out)
    fan_out(T(spark, sf_dir, "documents"), spark).createOrReplaceTempView("documents")
    g_case = ab.geometry_case(ab.DOC_NARROW, ab.DOC_WIDE, ab.DOC_THRESHOLD, duck=False)
    return spark.sql(
        f"""
        WITH w AS (SELECT doc_id, {fp.words_expr("text", duck=False)} AS words FROM documents),
        sgl AS (SELECT doc_id, {fp.shingles_expr("words", duck=False)} AS sh0 FROM w),
        h AS (SELECT doc_id, {fp.shingle_hash_array("sh0", duck=False)} AS harr FROM sgl),
        sig AS (SELECT doc_id, CAST({fp.simhash_expr('harr', duck=False)} AS BIGINT) AS sh FROM h),
        g AS (SELECT {g_case} AS masks FROM documents),
        {ab.bands_cte('sig', 'doc_id', 'sh', duck=False)}
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(a.sh ^ b.sh) AS BIGINT) AS hamming
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        WHERE bit_count(a.sh ^ b.sh) <= 3
        """
    )


@register(
    "dedup_simhash_estimate",
    oracle=_SIMHASH_CTE_DUCK
    + """
    , cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      WHERE CAST(CAST(concat('0x', substr(md5(concat(CAST(a.doc_id AS VARCHAR), ':',
                 CAST(b.doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) AS BIGINT) % 8 = 0
    ),
    ss AS (SELECT doc_id, list_distinct(sh0) AS u FROM sgl)
    SELECT c.doc_a, c.doc_b, c.hamming,
           CAST((32 - c.hamming) * 31250 AS BIGINT) AS agree_micro,
           CAST(round(1000000.0 * len(list_intersect(ua.u, ub.u))
                      / len(list_distinct(list_concat(ua.u, ub.u)))) AS BIGINT)
             AS jacc_micro
    FROM cand c
    JOIN ss ua ON c.doc_a = ua.doc_id
    JOIN ss ub ON c.doc_b = ub.doc_id
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-as-signal certification, the ``dedup_minhash_estimate``
    counterpart for the other near-dup sketch: band-candidate pairs WITH
    NO Hamming cut (so the threshold choice is auditable), each carrying
    its Hamming distance, the bit-agreement score in micro-units, and
    the exact shingle Jaccard.  Both engines compute identical
    signatures and sets, so all three columns hash-match; the unit test
    gates that bit agreement separates true near-dups from
    band-collision noise (the property the Hamming ≤ 3 cut relies on).

    Certification runs on a DETERMINISTIC 1-in-8 pair sample (portable
    md5 hash of the pair key — identical sample both engines, stable
    under reruns): the un-cut candidate set grows with bucket-pair
    volume, and an audit needs a representative sample, not the
    universe — the same reasoning as ``mix_sample_weighted``'s
    hash-bucket sampling.  Candidates stay band-bucket-local as in
    ``dedup_simhash``; the exact-Jaccard columns join shingle sets by
    doc_id — validation-scale evidence only, production keeps just the
    Hamming columns.
    """
    fan_out(T(spark, sf_dir, "documents"), spark).createOrReplaceTempView("documents")
    return spark.sql(
        f"""
        WITH w AS (SELECT doc_id, {fp.words_expr("text", duck=False)} AS words FROM documents),
        sgl AS (SELECT doc_id, {fp.shingles_expr("words", duck=False)} AS sh0 FROM w),
        h AS (SELECT doc_id, {fp.shingle_hash_array("sh0", duck=False)} AS harr FROM sgl),
        sig AS (SELECT doc_id, CAST({fp.simhash_expr('harr', duck=False)} AS BIGINT) AS sh FROM h),
        bands AS (
          SELECT doc_id, sh, k AS band_id,
                 (sh div cast(pow(256, k) as bigint)) % 256 AS band_val
          FROM sig LATERAL VIEW explode(sequence(0, 3)) t AS k
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(a.sh ^ b.sh) AS BIGINT) AS hamming
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
           AND cast(conv(substr(md5(concat(cast(a.doc_id as string), ':',
                     cast(b.doc_id as string))), 1, 8), 16, 10) as bigint) % 8 = 0
        ),
        ss AS (SELECT doc_id, array_distinct(sh0) AS u FROM sgl)
        SELECT c.doc_a, c.doc_b, c.hamming,
               CAST((32 - c.hamming) * 31250 AS BIGINT) AS agree_micro,
               CAST(round(1000000.0 * size(array_intersect(ua.u, ub.u))
                          / size(array_union(ua.u, ub.u))) AS BIGINT)
                 AS jacc_micro
        FROM cand c
        JOIN ss ua ON c.doc_a = ua.doc_id
        JOIN ss ub ON c.doc_b = ub.doc_id
        ORDER BY doc_a, doc_b
        """
    )


@register(
    "dedup_embed_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round(list_inner_product(a.v, b.v), 4) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.v, b.v), 4) >= 0.3
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over label-blocked pairs.

    Fixture embeddings are unit-normalized (verified: Σx² = 1.0), so cosine
    = dot product — one zip_with/aggregate fold, JVM-side.  Blocking by
    label stands in for the IVF-cell / LSH-bucket key a 100 TB pipeline
    would use (see llm_similarity.py); the pair join is bucket-local either
    way.  Threshold applied to the *rounded* value on both sides so the
    cut is identical.
    """
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(dot, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


def _pagerank_sql(iters: int = 5) -> str:
    """Fixed-iteration PageRank over the symmetric candidate graph —
    iterations UNROLLED as plain CTEs (no vendor recursion quirks), all
    arithmetic integer micro-units so both engines converge bitwise."""
    steps = []
    prev = "pr0"
    for i in range(1, iters + 1):
        steps.append(f"""
    pr{i} AS (
      SELECT e.b AS node,
             150000 + (850000 * sum(p.score // d.deg)) // 1000000 AS score
      FROM sym e
      JOIN {prev} p ON p.node = e.a
      JOIN deg d ON d.node = e.a
      GROUP BY e.b
    )""")
        prev = f"pr{i}"
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
    sym AS (SELECT doc_a AS a, doc_b AS b FROM cand
            UNION SELECT doc_b, doc_a FROM cand),
    deg AS (SELECT a AS node, count(*) AS deg FROM sym GROUP BY a),
    pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS score FROM deg),
    {','.join(steps)}
    SELECT CAST(node AS BIGINT) AS doc_id, CAST(score AS BIGINT) AS score_micro
    FROM {prev} ORDER BY doc_id
    """


@register("graph_pagerank", oracle=_pagerank_sql())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 5 fixed iterations) over the symmetric
    MinHash candidate graph — centrality over the near-dup graph ranks
    the template/boilerplate hubs a crawl keeps re-collecting, the
    canonical iterative-algorithm workload beside connected components.

    Determinism contract: scores stay integer micro-units end to end —
    per-edge contribution is `score div degree` (exact integer div) and
    the damping update `150000 + (850000·Σ) div 1000000` — so both
    engines produce identical bigints with no float summation-order
    hazards; the oracle unrolls the same 5 iterations as plain CTEs.

    Scale shape: the edge list materializes ONCE (localCheckpoint — the
    same reuse discipline as `operators/components.py`; at 100 TB this
    is the persisted edge table) and each iteration is one equi join of
    the tiny score frame to the edges + one agg on the destination key —
    rounds are fixed (5), not data-dependent, so the job is 5 shuffles
    on the node key regardless of graph size.  Isolated docs (no
    candidate pair) are not graph nodes and are excluded by definition.
    """
    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    scores = deg.select("node", F.lit(1_000_000).cast("long").alias("score"))
    for _ in range(5):
        contrib = (
            scores.join(deg, "node")
            .select(F.col("node").alias("a"), F.expr("score div deg").alias("c"))
        )
        scores = (
            sym.join(contrib, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(
                (F.lit(150_000) + F.expr("(850000 * sum(c)) div 1000000"))
                .cast("long")
                .alias("score")
            )
        )
    return scores.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("score").cast("long").alias("score_micro"),
    ).orderBy("doc_id")


@register("dedup_incremental_clusters", oracle=_COMPONENTS_SQL)
def dedup_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters maintained INCREMENTALLY: the existing corpus's
    labels (docs with doc_id % 5 != 0, standing in for yesterday's
    clustering) are merged with the candidate pairs touching today's
    batch (doc_id % 5 == 0) via ``operators/components.py::
    incremental_components`` — and the result must equal the one-shot
    clustering of the full corpus, which is exactly what the oracle
    (the same recursive-CTE transitive closure as
    ``dedup_cluster_components``) checks by hash.

    Scale shape: yesterday's pair edges are never stored or re-read —
    the labeling itself is the carried state (a star graph of diameter
    ≤ 2), so each day's cost is the new batch's pairs plus a few
    propagation rounds; composes with the streaming band-index loop
    (streaming/dedup_stream.py) that produces exactly these new-batch
    pairs.
    """
    from cassandra_syncer_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    pairs = _minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    old = pairs.filter((F.col("doc_a") % 5 != 0) & (F.col("doc_b") % 5 != 0))
    new = pairs.filter((F.col("doc_a") % 5 == 0) | (F.col("doc_b") % 5 == 0))
    labels_old = connected_components(old, src="doc_a", dst="doc_b")
    merged = incremental_components(
        labels_old.localCheckpoint(), new, src="doc_a", dst="doc_b"
    )
    return merged.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )
