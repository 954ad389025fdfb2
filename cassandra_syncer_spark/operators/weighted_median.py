"""Distributed exact weighted median (weighted percentile) — the two-pass
bucketed form.

The naive formulation (cumulative-weight window partitioned by the group
key) is a scale trap when the group key has few distinct values: Spark's
WindowExec gives each group ONE task, which must sort the group's entire
row set — measured 7.7× at the 10× replica for a 3-value key
(SCALING.md round-5).  The two-pass form keeps both passes distributed:

1. histogram pass: values fold into ``n_bins`` equal-width buckets per
   group (map-side combining aggregation); a window over the tiny
   |groups|×n_bins histogram locates each group's CUT bucket — the first
   whose end-of-bucket cumulative weight crosses half the group total —
   and the cumulative weight entering it;
2. exact pass: only the cut bucket's rows (~1/n_bins of the group)
   re-sort, in a cumulative window seeded with the entering weight.

The threshold predicate (2·cum ≥ total) is monotone in the sort order,
so the first qualifying row overall provably lies in the cut bucket and
the result equals the naive form's exactly.  Weights must be integers —
integer cumulative sums make the cut row deterministic (no float
summation-order hazard); tiebreak columns must make the sort total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
    n_bins: int = 1024,
) -> DataFrame:
    """Return one row per group: (group_col, w_median) where w_median is
    the smallest value whose cumulative weight reaches half the group
    total under the (value, *tiebreak) sort order."""
    bounds = df.groupBy(group_col).agg(
        F.min(value_col).alias("mn"),
        F.greatest(
            F.max(value_col) - F.min(value_col), F.lit(1e-9)
        ).alias("span"),
    )
    binned = df.join(F.broadcast(bounds), group_col).withColumn(
        "bucket",
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(value_col) - F.col("mn")) / F.col("span") * n_bins),
        ).cast("int"),
    )
    hist = binned.groupBy(group_col, "bucket").agg(F.sum(weight_col).alias("w"))
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(group_col)
    cut = (
        hist.select(
            group_col,
            "bucket",
            F.coalesce(F.sum("w").over(wcum), F.lit(0)).alias("w_before"),
            F.col("w"),
            F.sum("w").over(wtot).alias("total"),
        )
        .filter(2 * (F.col("w_before") + F.col("w")) >= F.col("total"))
        .groupBy(group_col)
        .agg(
            F.min("bucket").alias("cut_bucket"),
            F.min_by("w_before", "bucket").alias("w_enter"),
            F.first("total").alias("total"),
        )
        .select(
            F.col(group_col).alias("__g"), "cut_bucket", "w_enter", "total"
        )
    )
    in_cut = binned.join(
        F.broadcast(cut),
        (F.col(group_col) == F.col("__g")) & (F.col("bucket") == F.col("cut_bucket")),
    ).select(group_col, value_col, weight_col, *tiebreak_cols, "w_enter", "total")
    wc = (
        Window.partitionBy(group_col)
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        in_cut.withColumn("cum", F.col("w_enter") + F.sum(weight_col).over(wc))
        .filter(2 * F.col("cum") >= F.col("total"))
        .groupBy(group_col)
        .agg(F.min(value_col).alias("w_median"))
    )
