"""Similarity search + multimodal columns — SURVEY.md §2.10.

Brute-force cosine top-k is the correctness baseline; the scale paths are
(a) sign-random-projection LSH bucketing (md5-derived deterministic
hyperplanes, oracle-checked) and (b) IVF-style coarse quantization —
fixed centroids or a deterministic one-step-Lloyd trained quantizer, both
oracle-checked; seeded MLlib k-means remains the unregistered production
trainer (recall-gated).  Every registered similarity query hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register
from cassandra_syncer_spark.session import fan_out

N_QUERIES = 5  # probe vectors: vec_id < 5
TOP_K = 5


def _vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("v", F.transform(col, lambda x: x.cast("double")))


#: fixture embedding dimensionality (all SFs ship list<float>[64]); the
#: unrolled fast path below keys on it and falls back to the generic fold
#: for any other length, so correctness never depends on the constant
EMB_DIM = 64


def _dot(a, b):
    """Dot product as the higher-order fold — the default for probe-sized
    pair counts, where the ~330-node unrolled form costs more in Catalyst
    planning per run than its per-row speedup returns (measured: the
    4-plan ``sim_ivf_probe_curve`` union went 0.93× → 1.41× vs its
    same-session vanilla when every ``_dot`` unrolled).  Heavy all-pairs
    stages use :func:`_dot_unrolled` instead."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _dot_unrolled(a, b):
    """Dot product with a codegen-friendly unrolled fast path — for
    stages whose PAIR COUNT dwarfs the plan cost (the knn-graph bucket
    self-join scores ~N·250 pairs).

    The higher-order ``aggregate(zip_with(...))`` fold is interpreted per
    element (lambda variables are CodegenFallback) — measured 13.7 s vs
    6.3 s for 500 k pairs on one core (guide §4.1: prefer flat
    expressions over opaque per-element evaluation).  The unrolled
    ``0.0 + a[0]*b[0] + a[1]*b[1] + …`` is the IDENTICAL left-to-right
    IEEE association as the fold (verified bit-identical, unrounded, on
    every sf0.1 pair), so rounded outputs cannot drift.  Arrays of any
    other length take the fold — same expression as :func:`_dot`.
    """
    fold = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    unrolled = F.lit(0.0)
    for i in range(EMB_DIM):
        unrolled = unrolled + a[i] * b[i]
    return F.when((F.size(a) == EMB_DIM) & (F.size(b) == EMB_DIM), unrolled).otherwise(fold)


# -- unified IVF search ------------------------------------------------------
#
# One IVF operator, pluggable coarse quantizer:
#   - 'fixed'  : first N_CELLS corpus vectors are the centroids —
#                deterministic, DuckDB-expressible, the oracle-checked path;
#   - 'kmeans' : seeded MLlib k-means — the production index build
#                (JVM iterations → rows-only check, recall-gated).
# Both share the same assignment and search dataflows below; only the
# centroid table differs.  The shared scale shape: corpus partitions by
# cell id (one shuffle at index build), probes search only their n_probe
# cells' partitions.


def _assign_cells(emb: DataFrame, centroids: DataFrame, n_probe: int) -> DataFrame:
    """Nearest ``n_probe`` centroids per vector by rounded dot (unit-norm
    embeddings → max dot = min angle; round(…,6) + cell-id tie keeps the
    ranking identical in Spark and DuckDB)."""
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    return (
        emb.join(F.broadcast(centroids))
        .select(
            "vec_id", "v", "cell", F.round(_dot(F.col("v"), F.col("cv")), 6).alias("sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("vec_id", "v", "cell")
    )


def _ivf_search(cells: DataFrame, q_cells: DataFrame) -> DataFrame:
    """Cell-local scored top-k: probes (broadcast) meet only their cells'
    corpus partitions."""
    q = q_cells.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "cell"
    )
    scored = (
        cells.join(F.broadcast(q), "cell")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cosine")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


def ivf_topk(
    spark: SparkSession, sf_dir: str, quantizer: str = "fixed", n_probe: int = 1
) -> DataFrame:
    """IVF approximate top-k with a pluggable coarse quantizer
    ('fixed' | 'kmeans') — the single code path behind ``sim_ivf_ann``
    and ``sim_ivf_kmeans``."""
    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    if quantizer == "fixed":
        centroids = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv")
        )
        cells = _assign_cells(emb, centroids, n_probe=1)
    elif quantizer == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = emb.select("vec_id", "v", array_to_vector("v").alias("features"))
        model = KMeans(k=3, seed=42, featuresCol="features", predictionCol="cell").fit(feat)
        cells = model.transform(feat).select("vec_id", "v", "cell")
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            "cell int, cv array<double>",
        )
    else:
        raise ValueError(f"quantizer must be 'fixed' or 'kmeans', got {quantizer!r}")
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    q_cells = _assign_cells(probes, centroids, n_probe=n_probe)
    return _ivf_search(cells, q_cells)


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, e.vec_id,
             round(list_inner_product(q.qv, e.v), 6) AS cosine,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY round(list_inner_product(q.qv, e.v), 6) DESC, e.vec_id) AS rn
      FROM q CROSS JOIN e
      WHERE q.q_id <> e.vec_id
    )
    SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: probe set × corpus, windowed top-k.

    Embeddings are unit-norm so cosine = dot (zip_with/aggregate fold,
    JVM-side).  The probe side is broadcast — the corpus never shuffles;
    at 100 TB this exact shape serves 'small probe batch vs huge corpus',
    with the corpus scan embarrassingly parallel and the per-partition
    top-k reduced via the rank window (only k rows per probe survive).
    """
    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


@register(
    "sim_ivf_ann",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < 8),
    assign AS (
      SELECT e.vec_id, e.v, c.c_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_inner_product(e.v, c.cv), 6) DESC, c.c_id) AS rn
      FROM e CROSS JOIN cent c
    ),
    cells AS (SELECT vec_id, v, c_id AS cell FROM assign WHERE rn = 1),
    q AS (SELECT vec_id AS q_id, v AS qv, cell FROM cells WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, c.vec_id, round(list_inner_product(q.qv, c.v), 6) AS cosine,
             row_number() OVER (
               PARTITION BY q.q_id
               ORDER BY round(list_inner_product(q.qv, c.v), 6) DESC, c.vec_id) AS rn
      FROM q JOIN cells c ON q.cell = c.cell AND q.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN: coarse-quantize to the nearest of 8 fixed
    centroids (deterministically the first 8 vectors), search only within
    the probe's cell.

    This is the scale path for ANN: the corpus partitions by cell id (one
    shuffle at index build), probes touch only their cell's partition.
    Recall/latency trades via n_centroids and n_probe cells; here 8/1 keeps
    the oracle tractable.  Single code path with the k-means variant:
    ``ivf_topk(quantizer='fixed'|'kmeans')`` — the quantizer is the only
    difference; both recall-gated against the brute-force baseline in
    tests/test_operators.py::test_ivf_recall_both_quantizers.
    """
    return ivf_topk(spark, sf_dir, quantizer="fixed", n_probe=1)


# -- deterministic trained quantizer (one integer-exact Lloyd step) ----------
#
# K-means made hash-checkable: deterministic seeds (the first _KM_K
# vectors), ONE Lloyd assign-update step over fixed-point integer
# coordinates, floor-mean centroids.  Every comparison is exact bigint
# arithmetic, so Spark and DuckDB produce the identical quantizer — the
# property MLlib's float iterations can never give.  Production swaps in
# ``ivf_topk(quantizer='kmeans')`` (seeded MLlib, more iterations,
# recall-gated in tests) when cross-engine exactness isn't required; the
# search dataflow is identical either way.

_KM_K = 4  # cells
_KM_DIMS = 64
_KM_Q = 10_000  # fixed-point scale: vq = round(v * 1e4) — bigint-exact
# offset making truncating integer division equal floor division in both
# engines (numerator forced positive: |vq| <= _KM_Q < _KM_OFF)
_KM_OFF = 100_000


def _kmeans_sql() -> str:
    d2 = (
        "CAST(list_sum(list_transform(range(1, {n}),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )
    d2_seed = d2.format(n=_KM_DIMS + 1, a="q.vq", b="s.sq")
    d2_cent = d2.format(n=_KM_DIMS + 1, a="q.vq", b="c.mv")
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (
      SELECT vec_id, v,
             list_transform(v, x -> CAST(round(x * {_KM_Q}) AS BIGINT)) AS vq
      FROM e
    ),
    seeds AS (SELECT vec_id AS cell, vq AS sq FROM q WHERE vec_id < {_KM_K}),
    a0 AS (
      SELECT q.vec_id, q.vq, s.cell,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {d2_seed}, s.cell) AS rn
      FROM q CROSS JOIN seeds s
    ),
    lf AS (
      SELECT cell, u.i AS dim, vq[u.i] AS val
      FROM (SELECT vq, cell FROM a0 WHERE rn = 1),
           (SELECT unnest(range(1, {_KM_DIMS + 1})) AS i) u
    ),
    mctr AS (
      SELECT cell, dim,
             CAST((sum(val) + count(*) * {_KM_OFF}) // count(*)
                  - {_KM_OFF} AS BIGINT) AS m
      FROM lf GROUP BY cell, dim
    ),
    cent AS (SELECT cell, list(m ORDER BY dim) AS mv FROM mctr GROUP BY cell),
    a1 AS (
      SELECT q.vec_id, q.v, c.cell,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {d2_cent}, c.cell) AS rn
      FROM q CROSS JOIN cent c
    ),
    cells AS (SELECT vec_id, v, cell FROM a1 WHERE rn = 1),
    probes AS (SELECT vec_id AS q_id, v AS qv, cell
               FROM a1 WHERE vec_id < {N_QUERIES} AND rn <= 2),
    scored AS (
      SELECT p.q_id, c.vec_id,
             round(list_inner_product(p.qv, c.v), 6) AS cosine,
             row_number() OVER (
               PARTITION BY p.q_id
               ORDER BY round(list_inner_product(p.qv, c.v), 6) DESC,
                        c.vec_id) AS rn
      FROM probes p JOIN cells c ON p.cell = c.cell AND p.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {TOP_K}
    """


@register("sim_ivf_kmeans", oracle=_kmeans_sql())
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a TRAINED coarse quantizer, hash-checked: deterministic
    k-means (seeds = first ``_KM_K`` vectors, one Lloyd assign-update
    step) over fixed-point integer coordinates — every distance compare
    and the floor-mean centroid update are exact bigint arithmetic, so
    both engines derive the identical quantizer and the whole multiprobe
    (n_probe=2) search hash-matches.  This replaces the round-2
    rows-only MLlib registration: seeded JVM float iterations can never
    cross-engine-match, so they stay as the unregistered production
    trainer (``ivf_topk(quantizer='kmeans')``, recall ≥ 0.8-gated in
    tests/test_operators.py::test_ivf_recall_both_quantizers) while the
    registered form proves the trained-quantizer dataflow end to end.

    Scale shape: identical to ``sim_ivf_ann``/``sim_ivf_multiprobe`` —
    the training pass is one broadcast join against k seed vectors plus
    a (cell, dim)-keyed agg whose output is k×64 rows (broadcast back);
    the corpus partitions by cell once; probes touch only their 2 cells'
    partitions.  k scales as √corpus in production; the integer staging
    stays exact to ~50k vectors/cell at this fixed-point scale (bigint
    headroom documented inline).
    """
    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    q = emb.withColumn(
        "vq", F.expr(f"transform(v, x -> cast(round(x * {_KM_Q}) as bigint))")
    )
    seeds = q.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cell"), F.col("vq").alias("sq")
    )
    # exact integer squared distance: (2e4)^2 * 64 dims = 2.56e10 << 2^63
    d2_seed = F.expr(
        "aggregate(zip_with(vq, sq, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cell")
    assign0 = (
        q.join(F.broadcast(seeds))
        .select("vec_id", "vq", "cell", d2_seed.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "vq", "cell")
    )
    # Lloyd update: per-(cell, dim) integer sums -> floor-mean centroids.
    # The +n*OFF trick keeps the numerator positive so Spark's truncating
    # `div` and DuckDB's `//` agree (they differ on negative operands).
    m_long = (
        assign0.select("cell", F.posexplode("vq").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cell", "dim", F.expr(f"(s + n * {_KM_OFF}) div n - {_KM_OFF}").alias("m")
        )
    )
    cent = m_long.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("mv")
    )
    d2_cent = F.expr(
        "aggregate(zip_with(vq, mv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, x) -> acc + x)"
    )
    assigned = (
        q.join(F.broadcast(cent))
        .select("vec_id", "v", "cell", d2_cent.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
    )
    cells = assigned.filter(F.col("rn") == 1).select("vec_id", "v", "cell")
    q_cells = assigned.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("rn") <= 2)
    ).select("vec_id", "v", "cell")
    return _ivf_search(cells, q_cells)


# -- deterministic sign-random-projection LSH --------------------------------
#
# Classic SRP-LSH (Charikar) made hash-checkable: the random hyperplanes
# are md5-derived ±1 sign vectors precomputed in Python and inlined as
# literals in BOTH engines' expressions (same device as
# embed_random_projection, analytics_r5d.py).  _LSH_TABLES hash tables of
# _LSH_BITS sign bits each: a probe's candidates are the corpus vectors
# sharing ANY table's bucket; exact cosine reranks the candidates.
# Replaces the round-2 rows-only MLlib BucketedRandomProjectionLSH
# registration, whose JVM-internal seed-dependent hyperplanes could never
# cross-engine-match.

_LSH_TABLES = 8
_LSH_BITS = 3
_LSH_DIMS = 64


def _lsh_sign(t: int, j: int, i: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"lsh#{t}#{j}#{i}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def _lsh_proj(t: int, j: int, *, duck: bool) -> str:
    """Signed projection Σᵢ sᵢ·vᵢ.  DuckDB (validation scale): a
    left-associated 64-term chain.  Spark: the sign vector folds in as a
    LITERAL ARRAY and the sum is a zip_with/aggregate loop — a tiny
    expression tree instead of 24×64 unrolled terms, which fell out of
    whole-stage codegen into interpreted eval (the embed_pq_quantize
    lesson: 2.9 s → 0.2 s for the coding stage at sf0.1).  Sign parity
    with the unrolled chain holds: the fold adds the same terms in the
    same left-to-right order (the extra leading 0.0 can only differ on
    a -0.0 total, which compares equal under `> 0` either way)."""
    if duck:
        terms = []
        for i in range(_LSH_DIMS):
            s = _lsh_sign(t, j, i)
            elem = f"v[{i + 1}]"
            terms.append(f"(-1) * {elem}" if s < 0 else elem)
        return " + ".join(terms)
    arr = "array(" + ", ".join(
        f"{float(_lsh_sign(t, j, i))!r}" for i in range(_LSH_DIMS)
    ) + ")"
    return (
        f"aggregate(zip_with(v, {arr}, (x, y) -> x * y),"
        f" 0D, (acc, t) -> acc + t)"
    )


def _lsh_bucket(t: int, *, duck: bool) -> str:
    bits = [
        f"(CASE WHEN ({_lsh_proj(t, j, duck=duck)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_LSH_BITS)
    ]
    return " + ".join(bits)


def _lsh_sql() -> str:
    bucket_cols = ",\n             ".join(
        f"({_lsh_bucket(t, duck=True)}) AS b{t}" for t in range(_LSH_TABLES)
    )
    unpivot = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, b{t} AS bkt FROM coded"
        for t in range(_LSH_TABLES)
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    coded AS (
      SELECT vec_id,
             {bucket_cols}
      FROM e
    ),
    buckets AS ({unpivot}),
    cand AS (
      SELECT DISTINCT p.vec_id AS q_id, c.vec_id
      FROM buckets p JOIN buckets c ON p.tbl = c.tbl AND p.bkt = c.bkt
      WHERE p.vec_id < {N_QUERIES} AND p.vec_id <> c.vec_id
    ),
    scored AS (
      SELECT cand.q_id, cand.vec_id,
             round(list_inner_product(qe.v, ce.v), 6) AS cosine,
             row_number() OVER (
               PARTITION BY cand.q_id
               ORDER BY round(list_inner_product(qe.v, ce.v), 6) DESC,
                        cand.vec_id) AS rn
      FROM cand JOIN e qe ON cand.q_id = qe.vec_id
                JOIN e ce ON cand.vec_id = ce.vec_id
    )
    SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {TOP_K}
    """


@register("sim_lsh_ann", oracle=_lsh_sql())
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via deterministic sign-random-projection LSH:
    8 hash tables × 3 md5-derived ±1 hyperplane sign bits; candidates =
    corpus vectors sharing any table's bucket with the probe; exact
    cosine reranks to top-k.  Hash-checked — the hyperplanes fold into
    both engines' plans as literals (no model state, no seed
    dependence), closing the round-2 rows-only hole.

    Scale shape: coding is scan-fused (24 left-associated sign sums, no
    shuffle, no UDF); the candidate join is equi on (table, bucket) with
    the probe side broadcast, so the corpus never shuffles; only
    candidate ids flow to the rerank, which joins vectors back in
    per-candidate.  Table/bit counts tune the recall/selectivity trade;
    the fixture's structureless random unit vectors are LSH's documented
    worst case (recall tracks probed fraction — gated ≥ 0.5 vs
    brute-force in tests/test_operators.py), while a corpus with real
    cluster structure sharpens selectivity at the same recall.
    """
    emb = _vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v")
    coded = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.expr(_lsh_bucket(t, duck=False)) for t in range(_LSH_TABLES)])
        ).alias("tbl", "bkt"),
    )
    probes = coded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), "tbl", "bkt"
    )
    cand = (
        coded.join(F.broadcast(probes), ["tbl", "bkt"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id")
        .distinct()
    )
    qe = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(F.broadcast(qe), "q_id")
        .join(emb, "vec_id")
        .select("q_id", "vec_id", F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= TOP_K
    )


@register(
    "multimodal_cols",
    oracle="""
    SELECT d.doc_id, d.lang, e.label,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           round(sqrt(CAST(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]),
                                                   x -> x * x)) AS DOUBLE)), 4) AS emb_norm,
           round(CAST(e.embedding[1] AS DOUBLE), 6) AS dim0
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row: text metadata + embedding vector + label in one
    relation (documents ⋈ embeddings on doc_id = vec_id, verified 1:1).

    The binary-payload variant (opaque image/audio bytes + typed metadata +
    Arrow-batched decode) lives in operators/multimodal.py with its own
    unit tests — decode is stubbed per the environment contract, the Spark
    plumbing (schema, mapInPandas batch shape) is real.
    """
    docs = T(spark, sf_dir, "documents")
    emb = _vec(T(spark, sf_dir, "embeddings"))
    return docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        "lang",
        "label",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.sqrt(_dot(F.col("v"), F.col("v"))), 4).alias("emb_norm"),
        F.round(F.element_at("v", 1), 6).alias("dim0"),
    )


@register(
    "sim_ann_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id, embedding,
             greatest(list_max(list_transform(embedding,
                               x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS max_abs
      FROM embeddings
    ),
    q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / max_abs) AS BIGINT)) AS q8
      FROM m
    ),
    pairs AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             CAST(list_sum(list_transform(range(1, len(a.q8) + 1),
                                          i -> a.q8[i] * b.q8[i])) AS BIGINT) AS dot_q
      FROM q a JOIN q b ON b.vec_id >= 5
      WHERE a.vec_id < 5
    ),
    ranked AS (
      SELECT q_id, vec_id, dot_q,
             row_number() OVER (PARTITION BY q_id ORDER BY dot_q DESC, vec_id) AS rn
      FROM pairs
    )
    SELECT q_id, CAST(rn AS BIGINT) AS rn, vec_id, dot_q
    FROM ranked WHERE rn <= 5 ORDER BY q_id, rn
    """,
)
def sim_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k retrieval over int8-quantized embeddings — the memory-bound
    100 TB scan form: the index holds 4×-compressed vectors (per-vector
    absmax scaling, exactly ``embed_quantize_int8``'s formula) and scores
    with INTEGER dot products, which are exact in any engine (max
    |term| = 127² · 64 dims ≪ 2⁵³), so unlike float cosine the ranking
    needs no rounding discipline at all.

    Scale shape: probes broadcast against the corpus scan (same as
    sim_cosine_topk) with per-probe top-k via window; at full scale the
    same scoring drops into the IVF cell-local search (_ivf_search) —
    quantization and cell routing compose.  Quantization is per-row
    higher-order array math, no UDF, no extra shuffle.
    """
    emb = T(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        "embedding",
        F.greatest(
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double")))),
            F.lit(1e-30),
        ).alias("max_abs"),
    )
    q8 = m.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 127.0 / F.col("max_abs")).cast("long"),
        ).alias("q8"),
    )
    probes = q8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("q8").alias("pq8")
    )
    corpus = q8.filter(F.col("vec_id") >= 5)
    dot_q = F.aggregate(
        F.zip_with("pq8", "q8", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = corpus.join(F.broadcast(probes)).select(
        "q_id", "vec_id", dot_q.alias("dot_q")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("q_id", "rn", "vec_id", "dot_q")
        .orderBy("q_id", "rn")
    )


# sign-code prefix cells: the O(N) coarse quantizer for all-vectors work.
# cell = top-b sign bits of the 63-bit code, b sized so the EXPECTED cell
# holds ~250 vectors: m = ceil(N/250) clamped to >= 8, b = ceil(log2(m))
# computed in exact integer arithmetic as length(bin(m - 1)).
_KNN_CODE_SPARK = (
    "aggregate(sequence(0, 62), 0L,"
    " (acc, i) -> acc + IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))"
)
_KNN_CODE_DUCK = (
    "CAST(list_sum(list_transform(range(0, 63),"
    " i -> CASE WHEN v[i + 1] > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END))"
    " AS BIGINT)"
)

_KNN_IVF_SQL = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (
      SELECT CAST(length(bin(greatest((count(*) + 249) // 250, 8) - 1))
             AS BIGINT) AS b
      FROM e
    ),
    cells AS (
      SELECT vec_id, v, ({_KNN_CODE_DUCK}) >> (63 - n.b) AS cell
      FROM e, n
    ),
    scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             round(list_inner_product(a.v, b.v), 4) AS cosine,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_inner_product(a.v, b.v), 4) DESC, b.vec_id) AS rk
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, nbr_id, cosine, CAST(rk AS BIGINT) AS rk
    FROM scored WHERE rk <= 3 ORDER BY vec_id, rk
"""


@register("sim_knn_graph_ivf", oracle=_KNN_IVF_SQL)
def sim_knn_graph_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph on a PRODUCTION blocking key: every vector lands in a
    sign-code-prefix cell and finds its top-3 neighbors cell-locally —
    the scale answer to the retired label-blocked demo (SCALING.md
    measured that fixed-cardinality key at 11.6×: 10× vectors in 10
    fixed blocks = 100× within-block pairs).

    Two levers make the whole job LINEAR in corpus size:
    - the cell COUNT grows with the corpus: b = ceil(log2(ceil(N/250)))
      prefix bits (exact integer arithmetic off a 1-row count broadcast,
      the q22 scalar pattern) keeps the expected cell at ~250 vectors,
      so within-cell pairs grow ∝ N;
    - the ASSIGNMENT is O(N): the cell is the top-b bits of the 63-bit
      coordinate-sign code (scan-fused expression, the same kernel as
      ``dedup_embed_simhash``/``sim_hamming_ann``) — no centroid join.
      The earlier centroid form assigned via N×k dot products with
      k = N/250, a hidden N²/250 term that measured 3.9× at the 10×
      replica (assignment grew 100×); code-prefix cells removed it.
      Centroid IVF remains the right tool for the PROBE queries
      (``sim_ivf_ann``/``sim_ivf_kmeans``), where k is fixed and
      assignment is N×k with small constant k.

    Recall: sign-prefix cells are b-bit SRP-LSH buckets — two vectors
    within angle θ share all b bits with prob (1 − θ/π)^b; the standard
    recall lever is multi-probe over Hamming-1 neighbor cells (flip one
    prefix bit — same union dataflow as ``sim_ivf_multiprobe``).

    Scale shape: one scan computes codes, one shuffle on cell id
    (materialized once — both sides of the self-join read the same
    localCheckpoint, the ``graph_pagerank`` edge-list discipline), then
    the bucket-local self-join + per-vector rank window; skewed cells
    fall under the measured salting cap rule (operators/skew.py).
    """
    # fan the pair-expansion work across all cores: the sf-scale scan is a
    # single parquet row group → ONE task would own the entire bucket-local
    # pair stage (measured: the whole 500 k-pair dot stage ran serially);
    # no-op at scale where the scan is already wide (session.fan_out)
    emb = fan_out(_vec(T(spark, sf_dir, "embeddings")).select("vec_id", "v"), spark)
    bbits = emb.agg(
        F.expr(
            "cast(length(bin(greatest((count(*) + 249) div 250, 8) - 1)) as bigint)"
        ).alias("b")
    )
    cells = (
        emb.crossJoin(F.broadcast(bbits))
        .select(
            "vec_id",
            "v",
            F.expr(f"shiftright({_KNN_CODE_SPARK}, cast(63 - b as int))").alias(
                "cell"
            ),
        )
        .localCheckpoint()
    )
    a = cells.alias("a")
    b = cells.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nbr_id"),
            F.round(_dot_unrolled(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("vec_id", "rk")
    )
