"""As-of (point-in-time) joins, composed from union + window.

Reference-analog: "pick the latest manifest at-or-before now"
(``bin/cassandra-syncer-restore:82-89``) generalized to per-key
point-in-time lookup.

Spark has no native as-of join, and the naive formulation —
range join + row_number — executes as a broadcast-nested-loop (O(n·m) per
key) that dies at scale.  This implementation is the scalable shape:

1. collapse the right side to one row per (key, ts) — deterministic ties;
2. union left and right rows, tagged;
3. one window pass per key ordered by (ts, side): ``last(..., ignorenulls)``
   carries the most recent right-side values forward onto left rows.

Cost: ONE shuffle by key (the window sort), no join blowup, no skew from
range overlap.  At 100 TB both inputs shuffle-hash on the key exactly once —
the same cost as an equi-join.

``nearest_join`` extends the same dataflow with a second window FRAME (not a
second shuffle): the backward frame carries the latest right row at-or-before
each left ts, the forward frame the earliest one after it, and a per-row
comparison picks the closer side.  Both directions ride one sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> tuple[DataFrame, list[str]]:
    """Steps 1-2 shared by ``asof_join``/``nearest_join``: collapse the right
    side to one row per (key, ts) and union it under the left rows, tagged so
    that right rows sort BEFORE left rows at equal ts (``__side`` 0 vs 1 —
    an at-or-before match).  Returns (unioned, left_columns)."""
    # 1. deterministic right side: one row per (key, ts)
    agg = [F.max(c).alias(c) for c in value_cols] if tie_col is None else [
        F.max_by(c, tie_col).alias(c) for c in value_cols
    ]
    r = right.groupBy(on, F.col(right_ts).alias("__ts")).agg(
        *agg, *( [F.max(tie_col).alias(tie_col)] if tie_col and tie_col not in value_cols else [] )
    )

    # 2. tagged union
    lcols = left.columns
    l_tagged = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(dict(r.dtypes)[c]))
    r_tagged = r.select(
        on,
        "__ts",
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.select(
        *lcols, "__ts", "__side", *[f"__r_{c}" for c in value_cols]
    ).unionByName(
        r_tagged.select(*lcols, "__ts", "__side", *[f"__r_{c}" for c in value_cols])
    )
    return unioned, lcols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key.

    ``value_cols`` are carried from the right side (prefixed ``matched_``).
    ``tie_col``: right-side tiebreaker when several right rows share a ts
    (max wins); required for deterministic output.
    """
    unioned, lcols = _tagged_union(left, right, on, left_ts, right_ts, value_cols, tie_col)

    # 3. one window pass: carry latest right values forward
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: list[Column] = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"matched_{c}") for c in value_cols
    ]
    matched.append(F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w).alias("matched_ts"))
    return unioned.select(*lcols, "__side", *matched).filter(F.col("__side") == 1).drop("__side")


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Nearest-in-time join: for each left row, the right row minimizing
    ``|right_ts - left_ts|`` within the same ``on`` key; ties (equal distance
    on both sides) prefer the at-or-before row.  Left rows whose key has no
    right rows at all are dropped (inner semantics).

    Same ONE shuffle as ``asof_join`` — the backward and forward candidates
    come from two FRAMES over the same window sort, not a second pass:
    ``last(.., ignorenulls)`` over unbounded-preceding..current gives the
    at-or-before match, ``first(.., ignorenulls)`` over current..unbounded-
    following gives the strictly-after match (right rows at the exact left ts
    sort before the left row, so they land — correctly — on the backward side
    with distance 0, which always wins).
    """
    unioned, lcols = _tagged_union(left, right, on, left_ts, right_ts, value_cols)

    wb = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    right_ts_col = F.when(F.col("__side") == 0, F.col("__ts"))
    staged = unioned.select(
        *lcols,
        "__ts",
        "__side",
        F.last(right_ts_col, ignorenulls=True).over(wb).alias("__b_ts"),
        F.first(right_ts_col, ignorenulls=True).over(wf).alias("__f_ts"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}") for c in value_cols],
        *[F.first(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}") for c in value_cols],
    ).filter(F.col("__side") == 1)

    d_b = F.col("__ts") - F.col("__b_ts")
    d_f = F.col("__f_ts") - F.col("__ts")
    use_back = F.col("__b_ts").isNotNull() & (F.col("__f_ts").isNull() | (d_b <= d_f))
    picked: list[Column] = [
        F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(f"matched_{c}")
        for c in value_cols
    ]
    picked.append(F.when(use_back, F.col("__b_ts")).otherwise(F.col("__f_ts")).alias("matched_ts"))
    return (
        staged.filter(F.col("__b_ts").isNotNull() | F.col("__f_ts").isNotNull())
        .select(*lcols, *picked)
    )
