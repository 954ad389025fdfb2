"""Round-8 batch 1 — experiment power/MDE, deterministic bootstrap CI,
Neyman stratified allocation, weight-of-evidence encoding, and
resource-allocation link prediction.

Reference parity note: analytics extensions beyond the reference's sync
surface (rax-maas/cassandra-syncer holds only backup/restore plumbing,
bin/cassandra-syncer:1-); integer/micro-unit exact formulas on both
engines per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import register

# ---------------------------------------------------------------------------
# events_power_mde — minimum detectable effect from the pilot's variance
# ---------------------------------------------------------------------------

#: z_{alpha/2} at alpha=0.05 and z_{power} at 80% — literals (constants are
#: data; no inverse-normal at query time)
_Z_ALPHA = 1.959964
_Z_POWER = 0.841621

#: ONE shared formula text per scalar, evaluated on the single summary row
#: by both engines (the events_welch_ttest rule): identical IEEE op
#: sequence over exact integer sums → identical rounded doubles.
_SD_A = (
    "sqrt((CAST(qa AS DOUBLE) - CAST(sya AS DOUBLE) * CAST(sya AS DOUBLE)"
    " / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0))"
)
_SD_B = (
    "sqrt((CAST(qb AS DOUBLE) - CAST(syb AS DOUBLE) * CAST(syb AS DOUBLE)"
    " / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0))"
)
_MDE_ABS = (
    f"({_Z_ALPHA} + {_Z_POWER})"
    f" * sqrt({_SD_A} * {_SD_A} / CAST(na AS DOUBLE)"
    f"      + {_SD_B} * {_SD_B} / CAST(nb AS DOUBLE)) / 100.0"
)
_MEAN_POOLED = (
    "((CAST(sya AS DOUBLE) + CAST(syb AS DOUBLE))"
    " / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / 100.0)"
)


@register(
    "events_power_mde",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 2 AS BIGINT) AS arm,
             CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sya,
             CAST(sum(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
                  AS HUGEINT) AS qa,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS syb,
             CAST(sum(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
                  AS HUGEINT) AS qb
      FROM u
    )
    SELECT na AS n_a, nb AS n_b,
           round({_SD_A} / 100.0, 6) AS sd_a_r6,
           round({_SD_B} / 100.0, 6) AS sd_b_r6,
           round({_MDE_ABS}, 6) AS mde_abs_r6,
           round({_MDE_ABS} / nullif({_MEAN_POOLED}, 0.0), 6) AS mde_rel_r6
    FROM s WHERE na >= 2 AND nb >= 2
    """,
)
def events_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POWER / MINIMUM-DETECTABLE-EFFECT calculator from the pilot's own
    variance — the question every experimenter asks BEFORE the test the
    rest of the kit reads out (`sample_ab_srm` → `events_welch_ttest`):
    with the traffic and variance we actually have, what's the smallest
    lift this setup can detect at alpha=0.05 / 80% power?  MDE =
    (z_{a/2}+z_{pow})·sqrt(s²_a/n_a + s²_b/n_b), absolute and relative
    to the pooled mean.

    Numeric discipline: the same exact integer moment sums as
    `events_welch_ttest` (per-user centi totals, Σy/Σy² in
    BIGINT/DECIMAL(38)/HUGEINT), z constants as literals, every scalar a
    SHARED formula text over the one summary row → identical rounded
    doubles on both engines.  <2 users per arm emits zero rows.

    Scale shape: one user-keyed agg collapses the fact table (map-side
    combined) → single-row global agg → scalar math.  No joins.
    """
    u = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).alias("y"))
        .withColumn(
            "arm",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ),
        )
    )
    yd = F.col("y").cast("decimal(38,0)")
    s = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sya"),
        F.sum(F.when(F.col("arm") == 0, yd * yd).otherwise(0)).alias("qa"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syb"),
        F.sum(F.when(F.col("arm") == 1, yd * yd).otherwise(0)).alias("qb"),
    )
    return s.filter((F.col("na") >= 2) & (F.col("nb") >= 2)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr(f"round({_SD_A} / 100.0, 6)").alias("sd_a_r6"),
        F.expr(f"round({_SD_B} / 100.0, 6)").alias("sd_b_r6"),
        F.expr(f"round({_MDE_ABS}, 6)").alias("mde_abs_r6"),
        F.expr(f"round({_MDE_ABS} / nullif({_MEAN_POOLED}, 0.0), 6)").alias(
            "mde_rel_r6"
        ),
    )


# ---------------------------------------------------------------------------
# agg_bootstrap_ci — deterministic Poisson bootstrap CI for the mean
# ---------------------------------------------------------------------------

_BOOT_B = 32  # resample replicates

#: Poisson(1) inverse-CDF thresholds in micro units: P(X<=k) for k=0..8;
#: a uniform micro draw u maps to the weight k with cum(k-1) <= u < cum(k).
#: Constants are data — both engines CASE over the same integer literals.
_POIS_CUM = (367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990, 999999)


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"CASE {branches} ELSE 9 END"


@register(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT event_id, CAST(round(100 * value) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL
    ),
    drawn AS (
      SELECT b, vc,
             {_pois_case(f"CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8) AS BIGINT) % 1000000")}
               AS w
      FROM base, unnest(range(0, {_BOOT_B})) AS t(b)
    ),
    rep AS (
      SELECT b,
             CAST((10000 * sum(w * vc)) // nullif(sum(w), 0) AS BIGINT)
               AS mean_micro
      FROM drawn GROUP BY b
    ),
    ci AS (
      SELECT round(quantile_cont(mean_micro, 0.025) / 1000000.0, 4) AS ci_lo_r4,
             round(quantile_cont(mean_micro, 0.975) / 1000000.0, 4) AS ci_hi_r4
      FROM rep
    ),
    pt AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             round(CAST((10000 * sum(vc)) // nullif(count(*), 0) AS BIGINT)
                   / 1000000.0, 4) AS mean_r4
      FROM base
    )
    SELECT n_rows, mean_r4, ci_lo_r4, ci_hi_r4 FROM pt, ci
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean — the
    distributed bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams"; the trick behind bag-of-little-bootstraps):
    instead of resampling n rows with replacement (impossible to
    coordinate across partitions), each row independently receives a
    Poisson(1) weight per replicate — at scale the replicate totals are
    indistinguishable from multinomial resampling, and the weights need
    NO shared state.  B=32 replicates; the CI is the 2.5/97.5 percentile
    of the replicate means.

    Determinism: the per-(row, replicate) uniform draw is
    md5(event_id:b) — the registry's standard replayable randomness —
    and the Poisson inverse-CDF is a CASE over integer micro literals,
    so both engines draw IDENTICAL weights; replicate means are exact
    integer micro (order-free sums), and the percentile interpolates the
    same 32 integers.

    Scale shape: the 32× explode fans out BEFORE the aggregate, but
    map-side combine collapses each partition to ≤32 partial rows, so
    the shuffle carries 32 rows per partition regardless of corpus size;
    the final percentile runs over exactly B rows.  No joins; the point
    estimate reuses the same scan.
    """
    base = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            F.round(F.lit(100) * F.col("value")).cast("long").alias("vc"),
        )
    )
    u_expr = (
        "conv(substring(md5(concat(CAST(event_id AS STRING), ':',"
        " CAST(b AS STRING))), 1, 8), 16, 10) % 1000000"
    )
    drawn = base.select(
        "vc",
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"),
        "event_id",
    ).select("b", "vc", F.expr(_pois_case(u_expr)).alias("w"))
    rep = drawn.groupBy("b").agg(
        F.expr("CAST((10000 * sum(w * vc)) div nullif(sum(w), 0) AS BIGINT)").alias(
            "mean_micro"
        )
    )
    ci = rep.agg(
        F.expr("round(percentile(mean_micro, 0.025) / 1000000.0, 4)").alias(
            "ci_lo_r4"
        ),
        F.expr("round(percentile(mean_micro, 0.975) / 1000000.0, 4)").alias(
            "ci_hi_r4"
        ),
    )
    pt = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            "round(CAST((10000 * sum(vc)) div nullif(count(*), 0) AS BIGINT)"
            " / 1e6, 4)"  # 1e6 is a DOUBLE literal; 1000000.0 would parse
            # as DECIMAL in Spark and silently decimal-ize the division
        ).alias("mean_r4"),
    )
    return pt.crossJoin(F.broadcast(ci))


# ---------------------------------------------------------------------------
# sample_neyman_allocation — optimal stratified sample allocation
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000

_SD_H = (
    "CASE WHEN n_h >= 2 THEN"
    " sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(n_h AS DOUBLE)) / (CAST(n_h AS DOUBLE) - 1.0))"
    " ELSE 0.0 END"
)


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(n_chars) AS BIGINT) AS s1,
             CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_h,
             round({_SD_H}, 6) AS sd_r6,
             CAST(round(1000000 * CAST(n_h AS DOUBLE) * {_SD_H}) AS BIGINT)
               AS w_micro
      FROM s
    ),
    a AS (
      SELECT source, n_h, sd_r6, w_micro,
             coalesce(({_NEYMAN_BUDGET} * w_micro)
                      // nullif(sum(w_micro) OVER (), 0), 0) AS base,
             coalesce(({_NEYMAN_BUDGET} * w_micro)
                      % nullif(sum(w_micro) OVER (), 0), 0) AS rem
      FROM w
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rn,
             {_NEYMAN_BUDGET} - sum(base) OVER () AS leftover
      FROM a
    )
    SELECT source, n_h, sd_r6,
           CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r ORDER BY source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN OPTIMAL ALLOCATION for stratified sampling — the design
    step BEFORE `sample_stratified_exact` draws: a fixed budget of
    {_NEYMAN_BUDGET} samples is split across source strata proportional
    to N_h·S_h (stratum size × stratum std of n_chars), the allocation
    that minimizes the estimator's variance (Neyman 1934).  Equal or
    proportional allocation oversamples homogeneous strata; this is the
    fix, with largest-remainder rounding so the integer allocations sum
    EXACTLY to the budget.

    Determinism: stratum sd comes from exact integer moment sums via
    IEEE sqrt/div (exactly-rounded ops, fixed text → bitwise identical),
    quantized to micro weights; the floor/remainder split is pure
    integer arithmetic and the remainder rank breaks ties by source.

    Scale shape: one corpus scan → per-source moment agg (map-side
    combined, |sources| rows); every window after runs on the
    DIMENSION-sized stratum table, never the corpus.
    """
    s = (
        T(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_h"),
            F.sum("n_chars").cast("long").alias("s1"),
            F.sum(
                F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars")
            ).alias("s2"),
        )
    )
    w = s.select(
        "source",
        "n_h",
        F.expr(f"round({_SD_H}, 6)").alias("sd_r6"),
        F.expr(
            f"CAST(round(1000000 * CAST(n_h AS DOUBLE) * {_SD_H}) AS BIGINT)"
        ).alias("w_micro"),
    )
    wall = Window.partitionBy()
    a = w.select(
        "source",
        "n_h",
        "sd_r6",
        F.expr(f"{_NEYMAN_BUDGET} * w_micro").alias("scaled"),
        F.sum("w_micro").over(wall).alias("wsum"),
    ).select(
        "source",
        "n_h",
        "sd_r6",
        F.expr("coalesce(scaled div nullif(wsum, 0), 0)").alias("base"),
        F.expr("coalesce(scaled % nullif(wsum, 0), 0)").alias("rem"),
    )
    r = a.select(
        "source",
        "n_h",
        "sd_r6",
        "base",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("source")))
        .alias("rn"),
        (F.lit(_NEYMAN_BUDGET) - F.sum("base").over(wall)).alias("leftover"),
    )
    return r.select(
        "source",
        "n_h",
        "sd_r6",
        (F.col("base") + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# feat_woe_encode — weight-of-evidence categorical encoding
# ---------------------------------------------------------------------------

_WOE = (
    "ln(((CAST(g AS DOUBLE) + 0.5) / (CAST(gt AS DOUBLE) + 0.5 * k))"
    " / ((CAST(bb AS DOUBLE) + 0.5) / (CAST(bt AS DOUBLE) + 0.5 * k)))"
)
_IV_TERM = (
    "CAST(round(1000000 * (((CAST(g AS DOUBLE) + 0.5)"
    " / (CAST(gt AS DOUBLE) + 0.5 * k))"
    " - ((CAST(bb AS DOUBLE) + 0.5) / (CAST(bt AS DOUBLE) + 0.5 * k)))"
    f" * {_WOE}) AS BIGINT)"
)


@register(
    "feat_woe_encode",
    oracle=f"""
    WITH c AS (
      SELECT source,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS g,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS bb
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT source, g, bb,
             sum(g) OVER () AS gt, sum(bb) OVER () AS bt,
             CAST(count(*) OVER () AS DOUBLE) AS k
      FROM c
    )
    SELECT source, g AS n_target, bb AS n_other,
           round({_WOE}, 6) AS woe_r6,
           {_IV_TERM} AS iv_term_micro
    FROM t ORDER BY source
    """,
)
def feat_woe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT-OF-EVIDENCE encoding of a categorical feature against a
    binary target (here: source vs lang='en') — the credit-scoring /
    feature-screening standard `feat_target_encode`'s mean-encoding
    sibling: WoE = ln(P(cat|target)/P(cat|non-target)) with 0.5-cell
    smoothing (no ±inf on pure categories), plus each category's
    INFORMATION VALUE term (Σ over categories = the feature's IV — the
    screening statistic: <0.02 useless, >0.5 suspicious leak).

    Determinism: counts are exact integers via one hash agg; WoE is ONE
    ln per |categories| row over a fixed-text ratio of integer-derived
    doubles (the `math_funcs` rounded-transcendental precedent); the IV
    term micro-quantizes per row, so the feature-level sum is an
    order-free integer add.

    Scale shape: one corpus scan → per-source conditional-count agg
    (map-side combined); the totals are windows over the DIMENSION-sized
    category table.  No joins, no corpus-sized shuffle.
    """
    c = (
        T(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("g"),
            F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
            .cast("long")
            .alias("bb"),
        )
    )
    wall = Window.partitionBy()
    t = c.select(
        "source",
        "g",
        "bb",
        F.sum("g").over(wall).alias("gt"),
        F.sum("bb").over(wall).alias("bt"),
        F.count(F.lit(1)).over(wall).cast("double").alias("k"),
    )
    return t.select(
        "source",
        F.col("g").alias("n_target"),
        F.col("bb").alias("n_other"),
        F.expr(f"round({_WOE}, 6)").alias("woe_r6"),
        F.expr(_IV_TERM).alias("iv_term_micro"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# graph_link_prediction_ra — resource-allocation index on the near-dup graph
# ---------------------------------------------------------------------------

_RA_CAP = 50  # per-node neighbor cap bounding wedge work (graph_common_neighbors)
_RA_TOP = 20


def _ra_sql() -> str:
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
    adj AS (SELECT u AS ctr, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT ctr, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY ctr),
    capped AS (
      SELECT ctr, nbr FROM (
        SELECT ctr, nbr,
               row_number() OVER (PARTITION BY ctr
                                  ORDER BY md5(CAST(nbr AS VARCHAR)), nbr) AS rk
        FROM adj
      ) WHERE rk <= {_RA_CAP}
    ),
    wedge AS (
      SELECT a.nbr AS x, b.nbr AS z,
             CAST(sum(1000000 // d.d) AS BIGINT) AS ra_micro,
             CAST(count(*) AS BIGINT) AS common
      FROM capped a JOIN capped b ON a.ctr = b.ctr AND a.nbr < b.nbr
      JOIN deg d ON d.ctr = a.ctr
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT w.x, w.z, w.ra_micro, w.common FROM wedge w
      LEFT JOIN e ON w.x = e.u AND w.z = e.v
      WHERE e.u IS NULL
    )
    SELECT x AS doc_a, z AS doc_b, ra_micro, common,
           CAST(row_number() OVER (ORDER BY ra_micro DESC, x, z) AS BIGINT) AS rk
    FROM cand
    QUALIFY rk <= {_RA_TOP}
    ORDER BY rk
    """


@register("graph_link_prediction_ra", oracle=_ra_sql())
def graph_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESOURCE-ALLOCATION link prediction (Zhou/Lü/Zhang 2009) on the
    near-dup graph — `graph_common_neighbors` weighted by how
    DISCRIMINATING each shared neighbor is: a wedge through a degree-2
    node is strong evidence its endpoints are the same duplicate family,
    a wedge through a 500-degree hub is noise, so each common neighbor z
    contributes 1/deg(z) instead of 1.  RA beats raw common-neighbor
    counts exactly where dedup graphs are hardest: dense template
    families full of hub colliders.

    Determinism: the score is Σ (1000000 div deg(z)) — PURE integer
    (truncating div identical both engines), no logs (the Adamic-Adar
    1/ln(deg) variant trades that integrality away for ~the same
    ranking); ties rank by (doc_a, doc_b).

    Scale shape: same cap discipline as `graph_common_neighbors` —
    wedges enumerate from the 50-neighbor md5-capped adjacency (per-task
    work ≤ cap² per center, hub-proof) while deg(z) comes from the FULL
    adjacency (the statistic needs true degrees; a one-column |nodes|
    agg).  Anti-join strips existing edges; global top-20 via rank
    window over the candidate table only.
    """
    from cassandra_syncer_spark.queries.llm_dedup import _minhash_pairs

    e = (
        _minhash_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint()
    )
    adj = e.select(F.col("u").alias("ctr"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("ctr"), F.col("u").alias("nbr"))
    )
    deg = adj.groupBy("ctr").agg(F.count(F.lit(1)).cast("long").alias("d"))
    wr = Window.partitionBy("ctr").orderBy(
        F.md5(F.col("nbr").cast("string")), F.col("nbr")
    )
    capped = (
        adj.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _RA_CAP)
        .select("ctr", "nbr")
    )
    a = capped.select("ctr", F.col("nbr").alias("x"))
    b = capped.select("ctr", F.col("nbr").alias("z"))
    wedge = (
        a.join(b, "ctr")
        .filter(F.col("x") < F.col("z"))
        .join(deg, "ctr")
        .groupBy("x", "z")
        .agg(
            F.expr("CAST(sum(1000000 div d) AS BIGINT)").alias("ra_micro"),
            F.count(F.lit(1)).cast("long").alias("common"),
        )
    )
    cand = wedge.join(
        e, (wedge.x == e.u) & (wedge.z == e.v), "left_anti"
    )
    wtop = Window.orderBy(F.desc("ra_micro"), F.asc("x"), F.asc("z"))
    return (
        cand.withColumn("rk", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rk") <= _RA_TOP)
        .select(
            F.col("x").alias("doc_a"),
            F.col("z").alias("doc_b"),
            "ra_micro",
            "common",
            "rk",
        )
        .orderBy("rk")
    )
