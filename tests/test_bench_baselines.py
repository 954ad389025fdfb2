"""The bench gate's 'engine-verbatim' vanilla rows must stay result-
identical to the engine queries they mirror — the copies live in
scripts/vanilla_queries.py (plain spark.read, no engine imports, so they
remain an independent measurement target) and would otherwise drift
silently when the engine formulation changes."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")

from vanilla_queries import ENGINE_EQUIV, build_vanilla_queries  # noqa: E402

from cassandra_syncer_spark.registry import REGISTRY, all_queries  # noqa: E402


def _norm(x):
    # round-8 ADVICE: float columns (welch/cuped shared-text scalars) can
    # differ in the last ulp between the engine's exact-integer formulation
    # and the vanillas' float avg/var_samp paths under a different partition
    # accumulation order — compare floats at 5 decimals, ints/strings exact.
    return f"{x:.5f}" if isinstance(x, float) else str(x)


def _rows(df):
    return sorted(tuple(_norm(x) for x in r) for r in df.collect())


def test_verbatim_vanilla_rows_match_engine(spark, sf_dir):
    all_queries()
    vanilla = build_vanilla_queries(spark, sf_dir)
    for engine_name in [
        "agg_group_sum",
        "win_running_frame",
        "corpus_bigram_lm_score",
        "win_sliding_distinct",
        "graph_triangle_count",
        "win_rolling_median",
        "select_pareto_skyline",
    ]:
        engine_df = REGISTRY[engine_name].fn(spark, sf_dir)
        vanilla_df = vanilla[ENGINE_EQUIV[engine_name]]
        assert engine_df.columns == vanilla_df.columns, engine_name
        assert _rows(engine_df) == _rows(vanilla_df), (
            f"{engine_name}: vanilla copy drifted from the engine query — "
            "update scripts/vanilla_queries.py to match"
        )


def test_engine_equiv_keys_exist(spark, sf_dir):
    all_queries()
    vanilla = build_vanilla_queries(spark, sf_dir)
    for eng, van in ENGINE_EQUIV.items():
        assert eng in REGISTRY, eng
        assert van in vanilla, van


def test_r8_gate_vanilla_rows_match_engine(spark, sf_dir):
    """The round-8 gate additions are naive PORTS, not verbatim copies —
    but they compute the same statistic, so their RESULTS must match the
    engine rows exactly (integer/micro outputs; the float columns are
    round-6/round-4 shared-text scalars that matched bitwise when added).
    A mismatch means one side's formulation drifted."""
    all_queries()
    vanilla = build_vanilla_queries(spark, sf_dir)
    for engine_name in [
        "agg_ks_test",
        "agg_mannwhitney_u",
        "events_welch_ttest",
        "events_uplift_cuped",
        "dedup_substring_spans",
    ]:
        engine_df = REGISTRY[engine_name].fn(spark, sf_dir)
        vanilla_df = vanilla[ENGINE_EQUIV[engine_name]]
        assert engine_df.columns == vanilla_df.columns, engine_name
        assert _rows(engine_df) == _rows(vanilla_df), (
            f"{engine_name}: naive-port vanilla counterpart diverged from "
            "the engine query — the gate would be timing different work"
        )


def test_r9_gate_vanilla_rows_match_engine(spark, sf_dir):
    """Round-9 gate additions (VERDICT r8 #4): truth-per-point IVF sweep,
    multi-pass CDC merge, global-sort equi-depth, row-scan split search,
    and the verbatim Neyman-draw port must all reproduce the engine rows
    exactly — integer outputs throughout."""
    all_queries()
    vanilla = build_vanilla_queries(spark, sf_dir)
    for engine_name in [
        "sim_ivf_probe_curve",
        "cdc_apply_changelog",
        "agg_histogram_equidepth",
        "feat_best_split_gini",
        "sample_stratified_neyman_draw",
        "stream_session_window",
    ]:
        engine_df = REGISTRY[engine_name].fn(spark, sf_dir)
        vanilla_df = vanilla[ENGINE_EQUIV[engine_name]]
        assert engine_df.columns == vanilla_df.columns, engine_name
        assert _rows(engine_df) == _rows(vanilla_df), (
            f"{engine_name}: vanilla counterpart diverged from the engine "
            "query — the gate would be timing different work"
        )


def test_r10_null_safe_rows_vanilla_matches_engine(spark, sf_dir):
    """Round-10 gate pair: the naive `<=>` join must reproduce the split
    rewrite's rows exactly (integer keys + the -1 sentinel) — a mismatch
    means the gate would be timing different work."""
    all_queries()
    vanilla = build_vanilla_queries(spark, sf_dir)
    engine_df = REGISTRY["join_null_safe_rows"].fn(spark, sf_dir)
    vanilla_df = vanilla[ENGINE_EQUIV["join_null_safe_rows"]]
    assert engine_df.columns == vanilla_df.columns
    assert _rows(engine_df) == _rows(vanilla_df)


def test_r8_selection_vanilla_rows_match_engine(spark, sf_dir):
    """Batch 2-4 gate pairs: sort-based vanillas must produce identical
    results to the selection/one-scan engine forms."""
    all_queries()
    vanilla = build_vanilla_queries(spark, sf_dir)
    for engine_name in [
        "agg_median_selection",
        "agg_trimmed_mean_selection",
        "audit_column_profile",
    ]:
        engine_df = REGISTRY[engine_name].fn(spark, sf_dir)
        vanilla_df = vanilla[ENGINE_EQUIV[engine_name]]
        assert engine_df.columns == vanilla_df.columns, engine_name
        assert _rows(engine_df) == _rows(vanilla_df), engine_name
