"""Banded range join — large×large theta joins without a nested loop.

Spark executes a plain non-equi join (``l.v between r.lo and r.hi``) as
BroadcastNestedLoopJoin: fine while one side is dimension-sized
(queries/joins.py::join_theta_range), fatal when both sides are large.
This operator is the value-domain generalization of the time-banding idea
in operators/asof.py: discretize the value axis into fixed-width bands so
the range predicate becomes an *equi* join on band id.

Shape:

1. each right interval ``[lo, hi)`` explodes to every band it overlaps —
   ``floor(lo/w) .. floor(hi/w)`` (≤ ``ceil(max_interval/w)+1`` copies; pick
   ``band_width`` ≥ the typical interval width so the duplication factor
   stays ≤ 2);
2. each left point ``v`` maps to the single band ``floor(v/w)``;
3. equi-join on (band, *extra keys*) — hash-partitioned both sides, one
   shuffle each, AQE-skew-splittable like any equi join;
4. residual filter re-applies the exact predicate (band overlap is a
   superset of the true matches).

At 100 TB this is the same cost model as a regular equi join (shuffle both
sides on the band key) plus the bounded explode factor — no O(n·m) pair
enumeration, no broadcast requirement.  Skewed bands (a popular value
range) are ordinary skewed join keys: AQE skew-join or salting applies
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BAND_COL = "__band"


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    band_width: float,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point ``left_point``) to right rows (interval
    ``[right_lo, right_hi)``) where the point falls inside the interval,
    executed as an equi join on band id.

    ``extra_on``: additional equi keys joined alongside the band (they
    tighten both the shuffle key and the candidate set).

    ``how``: 'inner', 'left' (unmatched left rows kept with null right
    columns), 'left_semi', or 'left_anti' (the banded *prune* shape —
    left rows falling in NO right interval).  All four keep the equi plan:
    the exact range predicate rides INSIDE the join condition, so Catalyst
    extracts the band/extra keys as equi join keys (SortMergeJoin /
    ShuffledHashJoin with a residual condition — never
    BroadcastNestedLoopJoin) and the outer/semi/anti semantics apply to
    the full predicate, not to the band superset.  A left point maps to
    exactly one band, so no pair ever duplicates across bands and
    unmatched-left preservation needs no dedup pass.
    """
    normalized = {
        "inner": "inner",
        "left": "left",
        "left_outer": "left",
        "leftouter": "left",
        "left_semi": "left_semi",
        "leftsemi": "left_semi",
        "left_anti": "left_anti",
        "leftanti": "left_anti",
    }.get(how)
    if normalized is None:
        raise ValueError(
            f"banded_range_join supports inner/left/left_semi/left_anti, got {how!r}"
        )
    extra_on = extra_on or []
    w = float(band_width)
    if w <= 0:
        raise ValueError("band_width must be > 0")

    lpt = F.col(left_point) if isinstance(left_point, str) else left_point
    rlo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    rhi = F.col(right_hi) if isinstance(right_hi, str) else right_hi

    l_banded = left.withColumn("__pt", lpt).withColumn(
        BAND_COL, F.floor(F.col("__pt") / F.lit(w)).cast("long")
    )
    # a right interval covers bands floor(lo/w)..floor(hi/w); the residual
    # predicate in the join condition removes the superset slack at band
    # boundaries
    r_banded = (
        right.withColumn("__rlo", rlo)
        .withColumn("__rhi", rhi)
        .withColumn(
            BAND_COL,
            F.explode(
                F.sequence(
                    F.floor(F.col("__rlo") / F.lit(w)).cast("long"),
                    F.floor(F.col("__rhi") / F.lit(w)).cast("long"),
                )
            ),
        )
    )
    la, ra = l_banded.alias("__bl"), r_banded.alias("__br")
    cond = F.col(f"__bl.{BAND_COL}") == F.col(f"__br.{BAND_COL}")
    for k in extra_on:
        cond = cond & (F.col(f"__bl.{k}") == F.col(f"__br.{k}"))
    cond = (
        cond
        & (F.col("__bl.__pt") >= F.col("__br.__rlo"))
        & (F.col("__bl.__pt") < F.col("__br.__rhi"))
    )
    joined = la.join(ra, cond, normalized)
    if normalized in ("left_semi", "left_anti"):
        return joined.drop("__pt", BAND_COL)
    keep_right = [c for c in right.columns if c not in set(extra_on)]
    return joined.select(
        *[F.col(f"__bl.{c}") for c in left.columns],
        *[F.col(f"__br.{c}") for c in keep_right],
    )


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    band_width: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval×interval OVERLAP join (``a.lo < b.hi AND b.lo < a.hi``,
    half-open) for two LARGE interval tables, as an equi join on band id.

    Both sides explode to the bands they cover.  A pair overlapping across
    several shared bands must surface exactly once: the join keeps only
    the band containing the overlap's START (``floor(max(a.lo, b.lo)/w)``)
    — that band is unique per pair and covered by both intervals, so no
    DISTINCT pass is needed.  Like :func:`banded_range_join`, the exact
    predicate rides inside the join condition; Catalyst extracts the band
    (+ ``extra_on``) equi keys, so the plan is SMJ/SHJ with a residual —
    never a nested loop.  Duplication factor is ≤ interval_width/w + 1
    per side; pick ``band_width`` near the typical interval width.
    """
    extra_on = extra_on or []
    w = float(band_width)
    if w <= 0:
        raise ValueError("band_width must be > 0")

    def banded(df: DataFrame, lo: str, hi: str, side: str) -> DataFrame:
        return df.withColumn(
            BAND_COL,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi) / F.lit(w)).cast("long"),
                )
            ),
        ).alias(side)

    la = banded(left, left_lo, left_hi, "__bl")
    ra = banded(right, right_lo, right_hi, "__br")
    cond = F.col(f"__bl.{BAND_COL}") == F.col(f"__br.{BAND_COL}")
    for k in extra_on:
        cond = cond & (F.col(f"__bl.{k}") == F.col(f"__br.{k}"))
    a_lo, a_hi = F.col(f"__bl.{left_lo}"), F.col(f"__bl.{left_hi}")
    b_lo, b_hi = F.col(f"__br.{right_lo}"), F.col(f"__br.{right_hi}")
    cond = cond & (a_lo < b_hi) & (b_lo < a_hi)
    # first-band-only: count each overlapping pair exactly once
    cond = cond & (
        F.col(f"__bl.{BAND_COL}")
        == F.floor(F.greatest(a_lo, b_lo) / F.lit(w)).cast("long")
    )
    keep_right = [c for c in right.columns if c not in set(extra_on)]
    return la.join(ra, cond, "inner").select(
        *[F.col(f"__bl.{c}") for c in left.columns],
        *[F.col(f"__br.{c}") for c in keep_right],
    )


def banded_proximity_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    radius: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Symmetric proximity join: pairs with ``right_val - radius <=
    left_val < right_val + radius`` — the ``join_theta_range`` shape —
    as a banded equi join.  Band width is ``2*radius``, so each right
    point lands in at most 2 bands."""
    r = right.withColumn("__lo", F.col(right_val) - F.lit(float(radius))).withColumn(
        "__hi", F.col(right_val) + F.lit(float(radius))
    )
    return banded_range_join(
        left,
        r,
        left_point=left_val,
        right_lo="__lo",
        right_hi="__hi",
        band_width=2.0 * float(radius),
        extra_on=extra_on,
    ).drop("__lo", "__hi")
