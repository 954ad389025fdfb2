#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``.  Each query is forced
with a noop write (no driver-side collect, measures the full distributed
plan), warmed once, then timed best-of-2.  Compare against BASELINE.md.

Forcing method and the baseline comparison: BASELINE.md's original numbers
were ``count()``-forced, under which Catalyst prunes unreferenced output
columns — for the window row that deletes the window computation entirely.
The noop write used here forces every output column (the honest cost).
``scripts/measure_baseline.py`` re-measured the vanilla-PySpark baseline
under BOTH forcings (published in BASELINE.md and BASELINE_REMEASURE.json);
the 2x gate compares this file's noop-forced numbers against the baseline's
noop-forced column.  For transparency the JSON line also carries
``queries_count_forced`` for the baseline-comparable rows, so either
comparison can be made from the artifact alone.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: replica-sweep knobs (both default empty — the driver's per-round run is
#: unaffected).  At large replica factors a few VANILLA counterparts are
#: intractable by design (e.g. the unstaged full-DP verify port: 694 s at
#: sf1, quadratic in true-dup pairs on the identical-copy replica), so the
#: sf10 sweep skips those pairings while still timing the engine rows:
#:   SPARK_GRAFT_BENCH_SKIP         comma list of ids to drop entirely
#:   SPARK_GRAFT_BENCH_ONLY         comma list: run ONLY these ids
#:   SPARK_GRAFT_BENCH_ENGINE_ONLY  comma list of ids to time without the
#:                                  vanilla pairing (no gate ratio emitted)
#:   SPARK_GRAFT_BENCH_DETAIL_OUT   detail-artifact path override (sweeps
#:                                  write BENCH_SF10.json etc. without
#:                                  clobbering the driver-scale detail)
#: Sweep-rerun caveat: _vanilla_queries builds ALL counterparts at startup
#: and a few stage fixture data eagerly, so even a single-row ONLY rerun
#: pays ~10 min of staging at the 100× replica before the first timing.
_SKIP = {s for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",") if s}
_ONLY = {s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s}
_ENGINE_ONLY = {
    s for s in os.environ.get("SPARK_GRAFT_BENCH_ENGINE_ONLY", "").split(",") if s
}

#: headline queries (subset of the registry that maps onto BASELINE.md rows)
HEADLINE = [
    "agg_group_sum",        # BASELINE noop-forced: 0.41 s (q1_pricing_exact8 — same query text)
    "join_3table_topk",     # BASELINE noop-forced: 0.53 s
    "join_multiway",        # BASELINE noop-forced: 0.50 s
    "win_running_frame",    # BASELINE noop-forced: 0.22 s (window_frames_exact — same query text)
    "agg_count_distinct",   # BASELINE noop-forced: 0.08 s
    "agg_approx_distinct",  # BASELINE noop-forced: 0.17 s
    "topk_limit",
    "dedup_exact",
    "text_minhash_dedup",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ivf_ann",
    # round-5 gate additions: TPC-H heavies vs same-session vanilla ports
    "q7_volume_shipping",
    "q9_product_profit",
    "q21_late_suppliers",
    # round-5: corpus-LM scoring vs the naive positional-self-join port
    "corpus_bigram_lm_score",
    # round-5 timed rows (no vanilla counterpart; SCALING.md carries the
    # 10x evidence): sketch fold, fused nearest as-of, histogram quantile
    "agg_countmin_freq",
    "join_asof_nearest",
    "agg_percentile_hist",
    # round-5 batch-3 gate rows: bitmap distinct vs the Expand formulation,
    # binary-code Hamming ANN vs the full-precision brute-force scan
    "agg_distinct_bitmap",
    "sim_hamming_ann",
    # round-5 batch-5/6 gate + timed rows: sliding distinct via bitmap
    # partials vs the per-pane re-scan formulation; PQ codes and banded
    # embedding near-dup as timed rows (SCALING.md carries 10x evidence)
    "win_sliding_distinct",
    "embed_pq_quantize",
    "dedup_embed_simhash",
    # round-6 heavy-tail gate rows: the iterative/chained operators vs their
    # naive same-session vanilla ports (classic row-explode minhash front
    # end; float no-checkpoint pagerank; from-scratch reclustering;
    # unstaged full-DP verify)
    "sim_knn_graph_ivf",
    "graph_pagerank",
    "dedup_incremental_clusters",
    "dedup_verify_pipeline",
    # round-7 gate rows: oriented triangle join vs the unoriented wedge
    # join; streaming-frame rolling median vs the range-self-join port
    "graph_triangle_count",
    "win_rolling_median",
    # round-7 batch 5-7: skyline vs the naive global-window form (gate);
    # power-iteration PCA and band-graph label propagation as timed rows
    # (SCALING.md carries the 10x evidence)
    "select_pareto_skyline",
    "embed_pca_power",
    "graph_label_propagation",
    # round-7 batch 9 timed rows (SCALING.md carries the 10x evidence):
    # ExactSubstr span coverage; constant-size-sample cosine histogram
    "dedup_substring_spans",
    "embed_cosine_histogram",
    # round-7 batch 11/12 timed rows (SCALING.md carries the 10x evidence):
    # bounded k-core peel (checkpointed rounds); greedy MMR rerank (pure
    # JVM fold over the broadcast-probe top-C pool)
    "graph_kcore",
    "sim_mmr_rerank",
    # round-8 gate rows: the experimentation kit vs naive ports (global
    # windows / float two-pass) and ExactSubstr coverage vs groupBy+join
    "agg_ks_test",
    "agg_mannwhitney_u",
    "events_welch_ttest",
    "events_uplift_cuped",
    # dedup_substring_spans already a timed row above; now gated via its
    # vanilla counterpart in scripts/vanilla_queries.py
    # round-8 batch 2-4 gate rows: counting selection vs sort-based
    # percentile / row_number trim; one-scan profiler vs five scans; CDC
    # apply and bigram entropy as timed rows (SCALING.md carries their 10x)
    "agg_median_selection",
    "agg_trimmed_mean_selection",
    "audit_column_profile",
    "cdc_apply_changelog",
    "text_ngram_entropy_rate",
    # round-8 batch 5-7 timed rows (SCALING.md carries their 10x evidence):
    # equi-depth boundaries, the native streaming sessionizer, split search
    "agg_histogram_equidepth",
    "stream_session_window",
    "feat_best_split_gini",
    # round-9 gate rows (VERDICT r8 #4): the remaining heavy r8 ids vs
    # naive ports (truth-per-point sweep; verbatim draw port), plus the
    # split-null join as a timed row.  stream_watermark_strict (like
    # stream_sliding_topk / stream_watermark_finalize) drains its stream
    # EAGERLY inside fn(), so a noop-write row would time only the memory-
    # sink read — SCALING.md carries its evidence instead.
    "sim_ivf_probe_curve",
    "sample_stratified_neyman_draw",
    "join_null_safe_split",
    # round-10 gate row (VERDICT r9 #3): the ROW-returning split-null join
    # vs the naive single-`<=>`-bucket vanilla
    "join_null_safe_rows",
    # round-10 timed row (VERDICT r9 #2): bands→Hamming→CC embedding
    # clustering, measured at constant dup density on the fixed uniq
    # replica (SCALING.md carries the evidence)
    "dedup_embed_clusters",
]

#: rows with a BASELINE.md counterpart — these also get a count()-forced
#: measurement so the JSON artifact supports both comparison methods
BASELINE_COMPARABLE = HEADLINE[:6]


def _vanilla_queries(spark, sf_dir):
    """The BASELINE.md vanilla-PySpark counterparts, built fresh in THIS
    session and timed interleaved with the engine rows.

    Why: sub-second timings on this host swing ±50% between runs
    (BASELINE.md documents 0.53 s vs 0.82 s for the same join on two clean
    runs), so a gate comparing this run's engine numbers against a
    baseline measured at another moment is dominated by host noise.  The
    `baseline_same_session` block in the JSON line is the noise-cancelled
    comparison: same JVM, same moment, alternating engine/vanilla.

    One definition serves bench.py and scripts/measure_baseline.py
    (scripts/vanilla_queries.py); the two engine-verbatim rows are
    result-equality-tested against the engine queries in
    tests/test_bench_baselines.py so the copies cannot drift silently."""
    from scripts.vanilla_queries import ENGINE_EQUIV, build_vanilla_queries

    all_vanilla = build_vanilla_queries(spark, sf_dir)
    return {eng: all_vanilla[van] for eng, van in ENGINE_EQUIV.items()}


def _validate_subsets() -> None:
    """Fail fast on typo'd ids in the sweep knobs — a misspelled ONLY once
    yielded an empty run whose artifact still reported the headline metric
    name with a misleading total (round-10 ADVICE fix)."""
    known = set(HEADLINE)
    for env, ids in (
        ("SPARK_GRAFT_BENCH_ONLY", _ONLY),
        ("SPARK_GRAFT_BENCH_SKIP", _SKIP),
        ("SPARK_GRAFT_BENCH_ENGINE_ONLY", _ENGINE_ONLY),
    ):
        bad = ids - known
        if bad:
            raise SystemExit(f"{env} ids not in HEADLINE: {sorted(bad)}")


def main() -> None:
    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import get_spark

    _validate_subsets()
    all_queries()  # trigger registration
    spark = get_spark(app_name="cassandra-syncer-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    vanilla = _vanilla_queries(spark, SF_DIR)
    timings: dict[str, float] = {}
    timings_cf: dict[str, float] = {}
    baseline_ss: dict[str, float] = {}
    ratios: dict[str, float] = {}

    def noop_time(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # non-registry resolvers: ids whose REGISTERED form changed semantics.
    # agg_approx_distinct's registration became the envelope certification
    # (exact + sketch + bound check) in round 6; the BASELINE.md row and
    # the vanilla counterpart are the PURE sketch, so the bench row times
    # the unregistered production sketch form — like for like.
    from cassandra_syncer_spark.queries.relational import agg_approx_distinct_sketch

    resolvers = {"agg_approx_distinct": agg_approx_distinct_sketch}

    for name in HEADLINE:
        if name in _SKIP or (_ONLY and name not in _ONLY):
            continue
        fn = resolvers.get(name) or (REGISTRY[name].fn if name in REGISTRY else None)
        if fn is None:
            continue
        df = fn(spark, SF_DIR)
        noop_time(df)  # warm: JIT, shuffle service, file listing
        if name in vanilla and name not in _ENGINE_ONLY:
            # interleave engine/vanilla so host-load noise hits both alike
            vdf = vanilla[name]
            noop_time(vdf)
            pairs = [(noop_time(df), noop_time(vdf)) for _ in range(2)]
            timings[name] = round(min(e for e, _ in pairs), 4)
            baseline_ss[name] = round(min(v for _, v in pairs), 4)
            ratios[name] = round(timings[name] / baseline_ss[name], 2)
        else:
            timings[name] = round(min(noop_time(df), noop_time(df)), 4)

        if name in BASELINE_COMPARABLE:
            def run_cf() -> float:
                t0 = time.perf_counter()
                df.count()
                return time.perf_counter() - t0

            run_cf()
            timings_cf[name] = round(min(run_cf(), run_cf()), 4)

    total = round(sum(timings.values()), 4)
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    detail = {
        "metric": "headline_queries_total_warm",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_count_forced": timings_cf,
        "baseline_same_session": baseline_ss,
        "ratio_vs_baseline_same_session": ratios,
        "forcing": "noop-write (honest full materialization); count_forced rows for BASELINE.md method parity; baseline_same_session = vanilla-PySpark counterparts timed interleaved in this same session (noise-cancelled 2x gate)",
        "sf": float(m.group(1)) if m else SF_DIR,
        "sf_dir": SF_DIR,
    }
    # sweep artifacts self-describe their active subset (absent in the
    # driver's per-round run, so that line is unchanged)
    if _ONLY or _SKIP or _ENGINE_ONLY:
        detail["subset"] = {
            k: sorted(v)
            for k, v in (
                ("only", _ONLY), ("skip", _SKIP), ("engine_only", _ENGINE_ONLY)
            )
            if v
        }
    # full artifact to a side file; stdout gets a COMPACT line — the driver
    # records only the tail of stdout and a >2000-char line truncates into
    # unparseable JSON (BENCH_r05/r06 both show parsed:null), so the line
    # keeps the contract keys + timings + the gate ratios and points at the
    # detail file for the rest
    detail_out = os.environ.get("SPARK_GRAFT_BENCH_DETAIL_OUT", "BENCH_DETAIL.json")
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_out), "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    compact = {
        "metric": detail["metric"],
        "value": total,
        "unit": "sec",
        "sf": detail["sf"],
        "queries": timings,
        "baseline_same_session": baseline_ss,
        "ratio_vs_baseline_same_session": ratios,
        "detail": detail_out,
    }
    if "subset" in detail:
        compact["subset"] = detail["subset"]
    # keep the whole line inside the driver's tail (a >1900-char line
    # truncates into unparseable JSON — the BENCH_r05/r06 regression).
    # Shedding order — EVERY timed row's timing stays on the line, always:
    # round 11's ratio-ordered row shedding made the line lossy in the worst
    # way (the better a query got, the likelier its timing vanished from the
    # driver's round-over-round comparison — the round's biggest win was
    # reported as "dropped_from_bench").  Now the sheddable payloads are, in
    # order: absolute vanilla timings (recoverable as timing/ratio), timing
    # precision (2 decimals), then the per-row gate-ratio map (replaced by
    # summary stats on the line; the full map is in the detail file), then
    # long subset lists.  All steps are deterministic and row-complete, so
    # the same query set appears on the line every round.
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact.pop("baseline_same_session")
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact["queries"] = {
            k: round(v, 2) for k, v in compact["queries"].items()
        }
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900 and ratios:
        compact.pop("ratio_vs_baseline_same_session")
        compact["gate_ratios_in_detail"] = len(ratios)
        compact["gate_ratio_max"] = max(ratios.values())
        line = json.dumps(compact, separators=(",", ":"))
    # last resort: a long SPARK_GRAFT_BENCH_SKIP/ONLY list can keep the
    # line over budget even after the payload sheds — collapse the
    # subset lists to counts (full lists live in the detail file)
    if len(line) > 1900 and "subset" in compact:
        compact["subset"] = {k: len(v) for k, v in compact["subset"].items()}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
