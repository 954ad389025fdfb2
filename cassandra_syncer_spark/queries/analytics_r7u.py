"""Round-7 batch 21 — per-node clustering coefficients, the covariance
matrix, PQ asymmetric-distance search, Theil–Sen robust trend, and
systematic stride sampling.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# graph_clustering_coeff — per-node local clustering on the near-dup graph
# ---------------------------------------------------------------------------


def _lcc_sql() -> str:
    from cassandra_syncer_spark.queries.llm_dedup import _band_union, _minhash_cte

    return f"""
    {_minhash_cte(True)},
    bands AS ({_band_union(True)}),
    e AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS id FROM e UNION ALL SELECT v FROM e
      ) GROUP BY id
    ),
    o AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS a,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS b
      FROM e JOIN deg du ON e.u = du.id JOIN deg dv ON e.v = dv.id
    ),
    t AS (
      SELECT o1.a AS x, o1.b AS y, o2.b AS z
      FROM o o1 JOIN o o2 ON o1.b = o2.a
      JOIN o o3 ON o3.a = o1.a AND o3.b = o2.b
    ),
    tn AS (
      SELECT id, CAST(count(*) AS BIGINT) AS tri FROM (
        SELECT x AS id FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t
      ) GROUP BY id
    ),
    lcc AS (
      SELECT deg.id, deg.d, coalesce(tn.tri, 0) AS tri,
             (2000000 * coalesce(tn.tri, 0)) // (deg.d * (deg.d - 1)) AS lcc_micro
      FROM deg LEFT JOIN tn ON deg.id = tn.id
      WHERE deg.d >= 2
    )
    SELECT CAST(lcc_micro // 100000 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(tri) AS BIGINT) AS sum_triangles,
           CAST(sum(d) AS BIGINT) AS sum_degree
    FROM lcc GROUP BY 1 ORDER BY 1
    """


@register("graph_clustering_coeff", oracle=_lcc_sql())
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL clustering coefficient per node of the MinHash near-dup
    graph, bucketed into deciles — the node-level refinement of
    `graph_triangle_count`'s single global figure: nodes at bucket 10
    (lcc ≈ 1) sit inside closed template families where cluster-level
    canonicalization is safe; bucket-0 nodes with high degree are
    hub-like accidental colliders that pairwise verify must handle.
    lcc(v) = 2·tri(v) / (d(v)·(d(v)−1)), exact integer micro-units,
    wedge-capable nodes (d ≥ 2) only.

    Scale shape: same degree-ORIENTED wedge join as
    `graph_triangle_count` (each triangle generated once, fan-out
    bounded by max out-degree ≤ O(√m), total O(m^1.5)); per-node counts
    add one explode of the TRIANGLE table (3 rows each — triangle-
    bounded, far below pair volume) and a degree-table left join; the
    decile histogram collapses |nodes| to ≤ 11 rows.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    e = (
        _minhash_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    o = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.expr("CASE WHEN struct(du, u) < struct(dv, v) THEN u ELSE v END").alias(
                "a"
            ),
            F.expr("CASE WHEN struct(du, u) < struct(dv, v) THEN v ELSE u END").alias(
                "b"
            ),
        )
        .localCheckpoint()
    )
    o1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    o2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    o3 = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    t = o1.join(o2, "y").join(o3, ["x", "z"])
    tn = (
        t.select(F.col("x").alias("id"))
        .unionAll(t.select(F.col("y").alias("id")))
        .unionAll(t.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    lcc = (
        deg.filter(F.col("d") >= 2)
        .join(tn, "id", "left")
        .select(
            "d",
            F.coalesce("tri", F.lit(0)).alias("tri"),
            F.expr(
                "(2000000 * coalesce(tri, 0)) div (d * (d - 1))"
            ).alias("lcc_micro"),
        )
    )
    return (
        lcc.groupBy(F.expr("CAST(lcc_micro div 100000 AS BIGINT)").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("tri").cast("long").alias("sum_triangles"),
            F.sum("d").cast("long").alias("sum_degree"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# agg_covariance_matrix — full pairwise covariance/correlation matrix
# ---------------------------------------------------------------------------

#: metric name → exact integer staging expression (same text both engines)
_COV_METRICS = [
    ("disc", "CAST(round(10000 * l_discount) AS BIGINT)"),
    ("price", "CAST(round(100 * l_extendedprice) AS BIGINT)"),
    ("qty", "CAST(round(100 * l_quantity) AS BIGINT)"),
]


def _limb_double(expr_int: str, div_op: str) -> str:
    """Engine-stable integer→double conversion (round-9 fix): casting an
    exact integer above 2⁵³ to DOUBLE is ENGINE-DIVERGENT — DuckDB's
    HUGEINT→DOUBLE lands 1 ulp off Spark's correctly-rounded
    DECIMAL(38)→DOUBLE (measured: 22240711483861231690 → …b7fe vs …b7ff),
    which flipped cov_r4's 13th significant digit at sf0.1.  Split into
    three <2⁵³ limbs (each cast exact), recombine with ONE shared float
    text — both engines then run identical IEEE ops on identical inputs.
    Good to |x| < 2⁵³·10¹⁸ ≈ 9·10³³.  ``div_op``: Spark ``div``, DuckDB
    ``//`` (both truncate; % follows the dividend — limbs recombine
    exactly for negative x too)."""
    e = f"({expr_int})"
    return (
        f"(CAST({e} {div_op} 1000000000000000000 AS DOUBLE) * 1e18"
        f" + CAST(({e} % 1000000000000000000) {div_op} 1000000000 AS DOUBLE) * 1e9"
        f" + CAST({e} % 1000000000 AS DOUBLE))"
    )


def _cov_pair_exprs(a: str, b: str) -> list[str]:
    """Shared finale for one (a, b) cell: population covariance and
    correlation from the LIMB-SPLIT doubles of the exact integer
    numerators num_xy = n·S_xy − S_x·S_y (computed integer-side per
    engine; identical values by construction)."""
    return [
        f"round(dnum_{a}_{b} / (dn * dn), 4) AS cov_r4",
        f"round(dnum_{a}_{b}"
        f" / nullif(sqrt(dnum_{a}_{a} * dnum_{b}_{b}), 0.0), 6) AS corr_r6",
    ]


def _cov_cells() -> list[tuple[str, str]]:
    names = [m for m, _ in _COV_METRICS]
    return [(a, b) for i, a in enumerate(names) for b in names[i:]]


def _cov_oracle() -> str:
    stage = ", ".join(f"{expr} AS {m}" for m, expr in _COV_METRICS)
    names = [m for m, _ in _COV_METRICS]
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    sums += [f"CAST(sum({m}) AS BIGINT) AS s_{m}" for m in names]
    for i, a in enumerate(names):
        for b in names[i:]:
            sums.append(f"sum(CAST({a} AS HUGEINT) * {b}) AS s_{a}_{b}")
    nums = ["n"] + [
        f"CAST(n AS HUGEINT) * s_{a}_{b} - CAST(s_{a} AS HUGEINT) * s_{b}"
        f" AS num_{a}_{b}"
        for a, b in _cov_cells()
    ]
    casts = ["n", "CAST(n AS DOUBLE) AS dn"]
    casts += [
        f"{_limb_double(f'num_{a}_{b}', '//')} AS dnum_{a}_{b}"
        for a, b in _cov_cells()
    ]
    cells = " UNION ALL ".join(
        f"SELECT '{a}' AS m1, '{b}' AS m2, n, {', '.join(_cov_pair_exprs(a, b))} FROM d"
        for a, b in _cov_cells()
    )
    return f"""
    WITH pts AS (SELECT {stage} FROM lineitem),
    s AS (SELECT {', '.join(sums)} FROM pts),
    num AS (SELECT {', '.join(nums)} FROM s),
    d AS (SELECT {', '.join(casts)} FROM num)
    {cells} ORDER BY m1, m2
    """


@register("agg_covariance_matrix", oracle=_cov_oracle())
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise COVARIANCE/CORRELATION MATRIX over three lineitem
    metrics (discount, extendedprice, quantity) — the feature-screening
    pass every ML pipeline runs before training: all 6 unique cells
    (3 variances + 3 covariances) from ONE scan, where
    `agg_stats_corr` computes a single pre-chosen pair.

    Scale shape: one map-side-combined hash agg accumulates the full
    moment vector (n, 3 sums, 6 product sums — algebraic, exact
    decimal(38)); the matrix assembly is 6 one-row selects over the
    single moments row (broadcast-trivial).  Adding a metric grows the
    moment vector quadratically but the corpus is still read ONCE — the
    naive per-pair corr() call rescans per cell.

    Determinism (round-9 fix, caught by the sf0.1 parity replay): the
    numerators num_xy = n·S_xy − S_x·S_y are computed EXACTLY in
    DECIMAL(38)/HUGEINT and converted to double via the three-limb
    split (`_limb_double`) — a direct CAST of a >2⁵³ sum is engine-
    divergent (DuckDB's HUGEINT→DOUBLE is 1 ulp off Spark's decimal
    cast), which flipped cov_r4's 13th digit at sf0.1.
    """
    names = [m for m, _ in _COV_METRICS]
    pts = T(spark, sf_dir, "lineitem").select(
        *[F.expr(expr).alias(m) for m, expr in _COV_METRICS]
    )
    sums = [F.count(F.lit(1)).cast("long").alias("n")]
    sums += [F.sum(m).cast("long").alias(f"s_{m}") for m in names]
    sums += [
        F.sum(F.col(a).cast("decimal(38,0)") * F.col(b)).alias(f"s_{a}_{b}")
        for a, b in _cov_cells()
    ]
    s = pts.agg(*sums)
    nums = ["n"] + [
        f"CAST(n AS DECIMAL(38,0)) * s_{a}_{b}"
        f" - CAST(s_{a} AS DECIMAL(38,0)) * s_{b} AS num_{a}_{b}"
        for a, b in _cov_cells()
    ]
    casts = ["n", "CAST(n AS DOUBLE) AS dn"]
    casts += [
        f"{_limb_double(f'num_{a}_{b}', 'div')} AS dnum_{a}_{b}"
        for a, b in _cov_cells()
    ]
    d = s.selectExpr(*nums).selectExpr(*casts).localCheckpoint()
    out = None
    for a, b in _cov_cells():
        cell = d.selectExpr(f"'{a}' AS m1", f"'{b}' AS m2", "n", *_cov_pair_exprs(a, b))
        out = cell if out is None else out.unionByName(cell)
    return out.orderBy("m1", "m2")


# ---------------------------------------------------------------------------
# sim_pq_adc_topk — asymmetric-distance search over PQ codes
# ---------------------------------------------------------------------------

_ADC_QUERIES = 8
_ADC_K = 5


def _adc_lut_spark() -> list[str]:
    from cassandra_syncer_spark.queries.analytics_r5f import (
        _PQ_K,
        _PQ_SUBDIM,
        _PQ_SUBS,
        _pq_centroid,
    )

    cols = []
    for s in range(_PQ_SUBS):
        cents = ", ".join(
            "array("
            + ", ".join(repr(_pq_centroid(s, c, d)) for d in range(_PQ_SUBDIM))
            + ")"
            for c in range(_PQ_K)
        )
        cols.append(
            f"transform(array({cents}), cen -> "
            f"aggregate(zip_with(slice(v, {s * _PQ_SUBDIM + 1}, {_PQ_SUBDIM}), cen,"
            f" (x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t)) AS lut{s}"
        )
    return cols


def _adc_lut_duck() -> list[str]:
    from cassandra_syncer_spark.queries.analytics_r5f import (
        _PQ_K,
        _PQ_SUBS,
        _pq_dist,
    )

    cols = []
    for s in range(_PQ_SUBS):
        arr = ", ".join(
            f"CAST({_pq_dist(s, c, duck=True)} AS DOUBLE)" for c in range(_PQ_K)
        )
        cols.append(f"[{arr}] AS lut{s}")
    return cols


def _adc_oracle() -> str:
    from cassandra_syncer_spark.queries.analytics_r5f import _PQ_SUBS, _pq_cols_duck

    code_cols = [c for c in _pq_cols_duck() if not c.startswith("round(")]
    adist = " + ".join(f"p.lut{s}[c.code{s} + 1]" for s in range(_PQ_SUBS))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    codes AS (SELECT vec_id, {', '.join(code_cols)} FROM e),
    probes AS (
      SELECT vec_id AS q_id, {', '.join(_adc_lut_duck())}
      FROM e WHERE vec_id < {_ADC_QUERIES}
    ),
    scored AS (
      SELECT p.q_id, c.vec_id, round({adist}, 6) AS adist_r6
      FROM probes p JOIN codes c ON p.q_id <> c.vec_id
    ),
    ranked AS (
      SELECT q_id, vec_id, adist_r6,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY adist_r6, vec_id) AS rn
      FROM scored
    )
    SELECT q_id, vec_id, adist_r6, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_ADC_K} ORDER BY q_id, rn
    """


@register("sim_pq_adc_topk", oracle=_adc_oracle())
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC DISTANCE search over PQ codes — the query half of the
    FAISS IVF-PQ recipe that `embed_pq_quantize` encodes for: each query
    precomputes an 8×16 lookup table of exact subvector→centroid
    distances, and every corpus vector's approximate distance is just 8
    table lookups summed — the corpus FLOATS are never touched at query
    time, only the 4-byte codes.  Top-5 per query by rounded ADC
    distance, ties by vec_id.

    Scale shape: the LUT build is per-QUERY work (8 rows here; always
    probe-bounded), broadcast against the code table — the corpus-side
    cost per candidate is 8 element_at lookups + 7 adds, no vector math,
    which is WHY PQ search scans billions of codes on one node in
    production; here the same plan shape is one broadcast-hash join +
    per-query TakeOrdered.  Codes come from the shared deterministic
    codebook (literals in plan; production broadcasts a trained table),
    so both engines rank identical doubles.
    """
    from cassandra_syncer_spark.queries.analytics_r5f import (
        _PQ_SUBS,
        _pq_code_exprs,
        _pq_staged,
    )
    from pyspark.sql.window import Window

    e = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # round-11: staged distance columns — one codebook copy in the plan
    # instead of two per subspace (see analytics_r5f._pq_dist_cols_spark)
    codes = _pq_staged(e).selectExpr("vec_id", *_pq_code_exprs())
    probes = e.filter(F.col("vec_id") < _ADC_QUERIES).selectExpr(
        "vec_id AS q_id", *_adc_lut_spark()
    )
    adist = " + ".join(f"element_at(lut{s}, int(code{s} + 1))" for s in range(_PQ_SUBS))
    scored = (
        F.broadcast(probes)
        .join(codes, F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", F.expr(f"round({adist}, 6)").alias("adist_r6"))
    )
    w = Window.partitionBy("q_id").orderBy("adist_r6", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _ADC_K)
        .orderBy("q_id", "rn")
    )


# ---------------------------------------------------------------------------
# events_theil_sen_trend — robust trend over the daily series
# ---------------------------------------------------------------------------


@register(
    "events_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    slopes AS (
      SELECT CAST(b.y - a.y AS DOUBLE) / (b.day - a.day) AS sl
      FROM daily a JOIN daily b ON a.day < b.day
    ),
    med AS (
      SELECT round(quantile_cont(sl, 0.5), 6) AS slope_r6,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM slopes
    ),
    icept AS (
      SELECT round(quantile_cont(d.y - m.slope_r6 * d.day, 0.5), 4)
               AS intercept_r4
      FROM daily d, med m
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           med.n_pairs, med.slope_r6, icept.intercept_r4
    FROM med, icept
    """,
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN robust trend of the daily event-count series: the
    median of all pairwise day-to-day slopes (29.3% breakdown point —
    one corrupted week cannot drag the estimate the way it drags
    `agg_ols_fit`'s least squares), plus the matching median intercept.

    Scale shape: the corpus collapses to the DAY DOMAIN first (one
    hash agg; |days| grows with calendar time, not data volume), the
    O(|days|²) pair join runs on the domain table only — the same
    domain-collapse trick as `agg_kendall_tau`'s grid and
    `events_autocorr_lags` — and the medians run over |days|²/2 slope
    rows, never corpus rows.  Slopes are double ratios of exact
    integers with identical pair sets, so the interpolated median
    matches bitwise cross-engine (the `events_anomaly_mad` precedent).
    """
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
        .localCheckpoint()
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.expr("CAST(b.y - a.y AS DOUBLE) / (b.day - a.day)").alias("sl")
    )
    med = slopes.agg(
        F.expr("round(percentile(sl, 0.5), 6)").alias("slope_r6"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    icept = daily.crossJoin(F.broadcast(med)).agg(
        F.expr("round(percentile(y - slope_r6 * day, 0.5), 4)").alias("intercept_r4")
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        n_days.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(icept))
        .select("n_days", "n_pairs", "slope_r6", "intercept_r4")
    )


# ---------------------------------------------------------------------------
# sample_systematic_stride — exact-rate systematic sampling
# ---------------------------------------------------------------------------

_STRIDE = 7


@register(
    "sample_systematic_stride",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn % {_STRIDE} = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(sum(CASE WHEN rn % {_STRIDE} = 1 THEN doc_id END) AS BIGINT)
             AS sampled_id_sum
    FROM r GROUP BY source ORDER BY source
    """,
)
def sample_systematic_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC (every k-th) sampling with a hash-randomized order —
    the sampler with an EXACT rate guarantee that Bernoulli
    (`sample_hash`) cannot give: per source, rank docs by md5 and keep
    ranks ≡ 1 (mod 7), so every source yields exactly ⌈n/7⌉ docs — no
    variance in the sample size, while the hash order keeps the
    selection unbiased w.r.t. any data ordering.  The id-sum column
    makes the exact selected SET hash-checkable, not just its size.

    Scale shape: one window rank per source partition (the same
    per-source sort `sample_reservoir_perkey` pays; at 100 TB the rank
    can swap for the deterministic-hash-threshold form when ±1-doc
    exactness isn't required — that spelling IS `sample_hash`); the
    audit agg collapses to |sources| rows on the partitioning already
    in place, no second shuffle.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = (
        T(spark, sf_dir, "documents")
        .select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("rn") % _STRIDE == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sampled"),
            F.sum(F.when(F.col("rn") % _STRIDE == 1, F.col("doc_id")))
            .cast("long")
            .alias("sampled_id_sum"),
        )
        .orderBy("source")
    )
