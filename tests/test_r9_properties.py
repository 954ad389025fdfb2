"""Round-9 property tests — the split-null-partition join must be output-
identical to the `<=>` form it replaces at scale, and the two watermark
queries must lock BOTH admission semantics (admit-and-correct vs strict
drop) against each other, not just against their oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import REGISTRY, all_queries

SF_SMALL = "/root/testdata/sf0.001"


def _load():
    all_queries()


def test_null_safe_split_equals_null_safe_keys(spark, sf_dir):
    """Same statistic, two plans: the split rewrite must reproduce the
    `<=>` join's output row exactly — the algebraic identity
    n_null_safe = n_equi + n_left_null * n_right_null is the rewrite's
    entire correctness argument, so it is asserted directly."""
    _load()
    keys = REGISTRY["join_null_safe_keys"].fn(spark, sf_dir).collect()
    split = REGISTRY["join_null_safe_split"].fn(spark, sf_dir).collect()
    assert len(keys) == len(split) == 1
    assert keys[0].asDict() == split[0].asDict()


def test_watermark_strict_vs_finalize_semantics(spark):
    """The semantics lock (VERDICT r8 #6): `stream_watermark_finalize`
    ADMITS below-watermark input (closed windows re-emit with the late
    slice counted); `stream_watermark_strict` DROPS it at the admission
    gate.  Their outputs must therefore differ by exactly the late
    slice: every late row (event_id % 7 == 0, shifted 60 days) lands in
    an already-closed window, so

        sum(finalize.n) - sum(strict.n) == |late rows in closed windows|

    and the strict window set is a subset of finalize's."""
    _load()
    fin = {
        r.window_start_sec: r.n
        for r in REGISTRY["stream_watermark_finalize"].fn(spark, SF_SMALL).collect()
    }
    str_ = {
        r.window_start_sec: r.n
        for r in REGISTRY["stream_watermark_strict"].fn(spark, SF_SMALL).collect()
    }
    assert set(str_) <= set(fin), "strict emitted a window finalize did not"
    # every shared window: finalize count >= strict (admitted late rows can
    # only add), and the total gap is exactly the admitted-late volume that
    # fell into closed windows
    for ws, n in str_.items():
        assert fin[ws] >= n, (ws, fin[ws], n)
    horizon_us = 7 * 86400 * 1_000_000
    ev = T(spark, SF_SMALL, "events").select(
        "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    wm = (
        ev.filter(F.col("event_id") % 7 != 0)
        .agg((F.max("us") - horizon_us).alias("w"))
        .collect()[0]["w"]
    )
    late_in_closed = (
        ev.filter(F.col("event_id") % 7 == 0)
        .select((F.col("us") - 60 * 86400 * 1_000_000).alias("us"))
        .filter(
            (F.floor(F.col("us") / (7 * 86400 * 1_000_000)) + 1)
            * (7 * 86400 * 1_000_000)
            <= F.lit(wm)
        )
        .count()
    )
    assert sum(fin.values()) - sum(str_.values()) == late_in_closed
