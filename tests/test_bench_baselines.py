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


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


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
