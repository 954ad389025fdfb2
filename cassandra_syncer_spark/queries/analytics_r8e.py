"""Round-8 batch 5 — equi-depth histogram by counting selection, the
composed Neyman stratified draw, and geometric-decay adstock.

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
# agg_histogram_equidepth — k-quantile boundaries WITHOUT sorting rows
# ---------------------------------------------------------------------------

_DEPTH_K = 8  # octile histogram


@register(
    "agg_histogram_equidepth",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(100 * o_totalprice) AS BIGINT) AS vc FROM orders
    ),
    g AS (
      SELECT vc, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY vc
    ),
    c AS (
      SELECT vc, cnt,
             sum(cnt) OVER (ORDER BY vc ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER () AS n
      FROM g
    ),
    b AS (
      SELECT i,
             min(CASE WHEN cum >= (i * n) // {_DEPTH_K} + 1 THEN vc END)
               AS lo,
             min(CASE WHEN cum >= ((i + 1) * n) // {_DEPTH_K} THEN vc END)
               AS hi,
             ((i + 1) * max(n)) // {_DEPTH_K} - (i * max(n)) // {_DEPTH_K}
               AS depth
      FROM c, unnest(range(0, {_DEPTH_K})) AS t(i)
      GROUP BY i
    )
    SELECT CAST(i AS BIGINT) AS bucket,
           CAST(lo AS BIGINT) AS lo_centi,
           CAST(hi AS BIGINT) AS hi_centi,
           CAST(depth AS BIGINT) AS n_rows
    FROM b WHERE lo IS NOT NULL ORDER BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH (octile) HISTOGRAM by counting selection — the other
    standard histogram next to `agg_histogram_equiwidth`, and what a
    cost optimizer actually stores: bucket BOUNDARIES at the k-quantile
    positions, each bucket holding ~n/k rows regardless of skew.  Like
    `agg_median_selection`, the boundaries come from cumulative counts
    over the distinct-value domain — no corpus-row sort, and the same
    8-boundary selection costs the same at any row count.

    Boundary contract (shared by construction on both engines): bucket
    i spans the rows at 1-indexed positions (i·n div k)+1 … ((i+1)·n
    div k); `lo`/`hi` are the VALUES at those positions (ties make
    adjacent buckets share a boundary value — standard equi-depth
    behavior) and `depth` is pure position arithmetic
    ((i+1)·n div k − i·n div k), summing exactly to n.

    Scale shape: scan → (value) count agg (map-side combined) → ONE
    domain-sized cumulative window → an 8-row dimension cross joined
    against the domain table collapses to 8 buckets.  The domain is
    price-grid bounded; rows never sort.
    """
    v = T(spark, sf_dir, "orders").select(
        F.round(F.lit(100) * F.col("o_totalprice")).cast("long").alias("vc")
    )
    g = v.groupBy("vc").agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    c = g.select(
        "vc",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    # round-11 (guide §2.3): the k boundary selections used a ×k crossJoin
    # of the whole domain grid (1.2 M rows at sf0.1) plus a groupBy(i)
    # shuffle; the identical selections are ONE aggregation with 2k
    # conditional mins over the grid, unpivoted to k rows afterwards —
    # same CASE conditions, same integer positions, value-identical.
    sel_exprs = [F.max("n").alias("n")]
    for i in range(_DEPTH_K):
        sel_exprs.append(
            F.expr(
                f"min(CASE WHEN cum >= ({i} * n) div {_DEPTH_K} + 1 THEN vc END)"
            ).alias(f"lo{i}")
        )
        sel_exprs.append(
            F.expr(
                f"min(CASE WHEN cum >= ({i + 1} * n) div {_DEPTH_K} THEN vc END)"
            ).alias(f"hi{i}")
        )
    one = c.agg(*sel_exprs)
    rows = ", ".join(
        f"named_struct('bucket', CAST({i} AS BIGINT), 'lo_raw', lo{i},"
        f" 'hi_raw', hi{i},"
        f" 'depth_raw', ({i + 1} * n) div {_DEPTH_K} - ({i} * n) div {_DEPTH_K})"
        for i in range(_DEPTH_K)
    )
    return (
        one.select(F.explode(F.expr(f"array({rows})")).alias("b"))
        .filter(F.col("b.lo_raw").isNotNull())
        .select(
            F.col("b.bucket").alias("bucket"),
            F.col("b.lo_raw").cast("long").alias("lo_centi"),
            F.col("b.hi_raw").cast("long").alias("hi_centi"),
            F.col("b.depth_raw").cast("long").alias("n_rows"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# sample_stratified_neyman_draw — the allocation, executed
# ---------------------------------------------------------------------------


def _neyman_alloc_sql() -> str:
    # reuse the registered oracle verbatim (single source of truth),
    # stripped of its ORDER BY so it nests as a subquery
    from cassandra_syncer_spark.registry import REGISTRY

    alloc = REGISTRY["sample_neyman_allocation"].oracle
    return alloc.rsplit("ORDER BY source", 1)[0]


@register(
    "sample_stratified_neyman_draw",
    oracle=f"""
    WITH alloc AS ({_neyman_alloc_sql()}),
    ranked AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                         d.doc_id) AS rk
      FROM documents d
    )
    SELECT r.source,
           CAST(a.alloc AS BIGINT) AS n_target,
           CAST(count(*) AS BIGINT) AS n_drawn,
           CAST(sum(r.doc_id) AS BIGINT) AS id_sum
    FROM ranked r JOIN alloc a ON r.source = a.source
    WHERE r.rk <= a.alloc
    GROUP BY r.source, a.alloc ORDER BY r.source
    """,
)
def sample_stratified_neyman_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEYMAN DRAW — `sample_neyman_allocation` EXECUTED: each
    stratum draws exactly its variance-optimal share of the 1000-sample
    budget in md5-randomized order (the registry's replayable sampler,
    same kernel as `sample_systematic_stride`), with the id-sum audit
    making the drawn SET hash-checkable, not just its size.  Design →
    draw composition is the full stratified-sampling pipeline a 100 TB
    run would ship.

    Scale shape: the allocation is a |sources|-row broadcast against the
    per-source rank window (ONE corpus shuffle on source); draws where
    n_h < alloc (impossible here — alloc ≤ n_h by construction since
    weights are N_h-proportional... not guaranteed for tiny skewed
    strata, so the draw takes min(alloc, n_h) naturally via rk ≤ alloc)
    never error.  Output is |sources| rows with exact audit sums.
    """
    from cassandra_syncer_spark.queries.analytics_r8 import (
        sample_neyman_allocation,
    )

    alloc = sample_neyman_allocation(spark, sf_dir).select("source", "alloc")
    wr = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = (
        T(spark, sf_dir, "documents")
        .select("source", "doc_id")
        .withColumn("rk", F.row_number().over(wr))
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("rk") <= F.col("alloc"))
        .groupBy("source", "alloc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_drawn"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .select(
            "source",
            F.col("alloc").cast("long").alias("n_target"),
            "n_drawn",
            "id_sum",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# events_adstock_decay — geometric carryover as a bounded FIR filter
# ---------------------------------------------------------------------------

_ADSTOCK_LAMBDA_MILLI = 700  # decay 0.7/day
_ADSTOCK_LAGS = 7  # truncate the carryover at a week (0.7^7 ≈ 8%)

#: λ^k in MICRO units as integer literals — constants are data, no pow()
#: at query time, identical truncation both engines.
_DECAY_MICRO = [
    round(1_000_000 * (0.7**k)) for k in range(_ADSTOCK_LAGS + 1)
]


@register(
    "events_adstock_decay",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(round(100 * value) AS BIGINT)) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    lagged AS (
      SELECT d, y,
             y * 1000000 + {" + ".join(
                 f"coalesce(lag(y, {k}) OVER (ORDER BY d) * {m}, 0)"
                 for k, m in list(enumerate(_DECAY_MICRO))[1:]
             )} AS ad_micro_centi
      FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS raw_sum_centi,
           CAST(sum(ad_micro_centi) // 1000000 AS BIGINT) AS adstock_sum_centi,
           CAST(max(ad_micro_centi) // 1000000 AS BIGINT) AS adstock_peak_centi
    FROM lagged
    """,
)
def events_adstock_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRIC-DECAY ADSTOCK (the marketing-mix carryover transform,
    here as the general decayed-rolling-sum operator): each day's
    effective value is Σ_k λᵏ·y_{t−k}, the FIR truncation of the
    exponential-carryover recursion — `win_ewma` is the infinite-memory
    recursive form, this is the bounded-lag convolution a distributed
    window can evaluate EXACTLY with no sequential dependency.

    Determinism: λᵏ are integer MICRO literals (no pow() at query time);
    the convolution is Σ lag(y,k)·λᵏ_micro over exact centi integers —
    pure integer window arithmetic; the single // 10⁶ rescale truncates
    identically on both engines.

    Scale shape: corpus → day domain in one agg; the 8-tap convolution
    is ONE window over |days| rows (each tap a lag over the same sort);
    output is a 1-row summary.  At 100 TB with per-key series the same
    window partitions by key — still one shuffle.
    """
    daily = (
        T(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.lit(100) * F.col("value")).cast("long")).alias("y")
        )
    )
    w = Window.orderBy("d")
    conv = F.col("y") * F.lit(_DECAY_MICRO[0])
    for k, m in list(enumerate(_DECAY_MICRO))[1:]:
        # lag(y, 0) is not portable; the k=0 tap is y itself (above)
        conv = conv + F.coalesce(F.lag("y", k).over(w) * F.lit(m), F.lit(0))
    lagged = daily.select("d", "y", conv.alias("ad_micro_centi"))
    return lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("raw_sum_centi"),
        F.expr("CAST(sum(ad_micro_centi) div 1000000 AS BIGINT)").alias(
            "adstock_sum_centi"
        ),
        F.expr("CAST(max(ad_micro_centi) div 1000000 AS BIGINT)").alias(
            "adstock_peak_centi"
        ),
    )
