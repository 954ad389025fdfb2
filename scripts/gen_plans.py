#!/usr/bin/env python
"""Regenerate PLANS.md: the formatted physical plan of each flagship
query with a one-line reading of why the shape survives 100 TB.
Run from the repo root: python scripts/gen_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

#: (query id, what to read in the plan)
FLAGSHIPS = [
    (
        "agg_group_sum",
        "scan-filter-agg: predicate pushed to parquet, partial agg map-side, "
        "whole-stage codegen end to end — scan-bound at any scale",
    ),
    (
        "join_3table_topk",
        "fact shuffle join + broadcast dims + TakeOrderedAndProject: no global "
        "sort materializes for the top-k",
    ),
    (
        "q5_local_volume",
        "6-way star: region/nation/supplier broadcast, lineitem⋈orders is the "
        "one shuffle, customer join strategy left to AQE",
    ),
    (
        "q19_disjunctive_pushdown",
        "OR-of-ANDs split into per-side conjuncts: both scans pre-pruned "
        "before the broadcast join",
    ),
    (
        "text_minhash_dedup",
        "one md5 per shingle, banding via posexplode, single shuffle on "
        "(band_id, band_key); r5: pair expansion is a bucket-local SELF-JOIN "
        "(no per-bucket collect_list row, ReusedExchange plans the signature "
        "stage once); salted_self_pairs (dedup_minhash_salted) is the "
        "hot-bucket cap rule",
    ),
    (
        "join_range_banded",
        "large×large theta join rewritten as band-key equi join: SMJ/SHJ "
        "shape, no BroadcastNestedLoopJoin even with broadcast disabled",
    ),
    (
        "sim_ann_int8",
        "quantize per-row (no shuffle), probes broadcast against corpus scan, "
        "per-probe top-k via rank window",
    ),
    (
        "join_null_safe_rows",
        "split-null rewrite, row form: ONE shuffled equi join over "
        "isnotnull-prefiltered keys + the null block as a broadcast cross "
        "of the smaller null spool — no EqualNullSafe, no single-bucket "
        "null shuffle anywhere",
    ),
    (
        "dedup_cluster_components",
        "connected components: one equi-join + min-agg per round, driver sees "
        "one convergence scalar per round",
    ),
    (
        "dedup_simhash",
        "r4 rewrite: candidate pairs via bucket-local SELF-JOIN on "
        "(band_id, band_val) — no per-bucket collect_list row, ReusedExchange "
        "plans the signature stage once, AQE skew-split applies to hot bands; "
        "r11: the 1-row corpus-count aggregate broadcast (BNLJ cross) picks "
        "the band geometry — small corpora keep disjoint bands, large ones "
        "switch to Manku block-combination masks so chance collisions stop "
        "growing ~N²/2^w (259× fewer candidate pairs at the 500k-doc replica)",
    ),
    (
        "q21_late_suppliers",
        "correlated EXISTS/NOT-EXISTS folded into ONE orderkey aggregation "
        "over a single pass of lineitem⋈orders (n_s≥2 ∧ n_l=1) — the "
        "semi/anti spelling re-derived the join 3× and trended 1.9× at sf10",
    ),
    (
        "events_resample_gapfill",
        "generated dense spine (types × hours) LEFT-joins the aggregated "
        "facts: raw table scanned once, spine broadcastable at any scale",
    ),
    (
        "dedup_verify_jaccard",
        "two-stage near-dup: banding candidates (the minhash pair join) "
        "then exact Jaccard verify via two doc_id hash joins — verify cost "
        "bounded by candidate volume, never corpus²",
    ),
    (
        "text_contamination_prefiltered",
        "gram-hash equi prefilter (eval side broadcast, corpus grams never "
        "shuffle) then exact contains() verify on candidates only — replaces "
        "the corpus × |eval| nested-loop of text_contamination_exact",
    ),
    (
        "join_asof_nearest",
        "ONE key-sorted shuffle; backward (last over preceding) and forward "
        "(first over following) candidates are two frames on the same "
        "Window — no second pass, no range join (r5)",
    ),
    (
        "corpus_bigram_lm_score",
        "words array projected BEFORE the gram lambda (no CSE inside "
        "higher-order functions — inline split re-evaluates per element); "
        "vocabulary-bounded count dims broadcast against the token stream; "
        "one doc_id shuffle for the per-doc mean (r5).  r8 re-measure "
        "(VERDICT r7 item 5): the 0.79 → 1.41 gate-ratio swing between r6 "
        "and r7 was HOST NOISE, not a plan regression — this exact 36-node "
        "shape re-verified node-for-node in r8 (0 extra exchanges, 3 "
        "scan-side split() projections, CSE firing) and the clean-host r8 "
        "ratio is 1.21, inside BASELINE.md's documented ±50% sub-second band",
    ),
    (
        "agg_countmin_freq",
        "corpus folds into a fixed 4×8192-counter sketch: one md5 hash32 + "
        "four integer universal-hash perms per row, map-side combine; probe "
        "join broadcasts — nothing downstream depends on corpus size (r5)",
    ),
    (
        "join_bloom_prefilter",
        "explicit runtime bloom: 8 KiB bitmap built from the filtered dim, "
        "embedded as a constant predicate in the fact scan's Filter, exact "
        "broadcast LEFT SEMI after — shuffle volume |fact| → ~|matches| (r5)",
    ),
    (
        "sim_hamming_ann",
        "binary-code ANN: 8-byte sign codes, probe side broadcast (BNLJ), "
        "corpus never shuffles; distance is XOR+popcount, 32× narrower than "
        "the float scan (r5); r11: past the corpus-count gate "
        "(EMB_THRESHOLD, driver-side metadata count) a banded short-circuit "
        "answers saturated probes from radius-6 mask buckets (provably equal "
        "to brute top-5 by pigeonhole), brute fallback for sparse probes — "
        "below the gate (this sf) the plan IS the brute scan, since 20×200 "
        "XORs cost less than the banding pass's stage overhead",
    ),
    (
        "dedup_embed_simhash",
        "banded sign-code near-dup: the candidate join touches 8-byte codes "
        "only (band shuffle 32x narrower than the vectors); float vectors "
        "join back for surviving candidates only; r11: band geometry derived "
        "from the 1-row corpus-count broadcast (same masks in the DuckDB "
        "oracle — lockstep), bucket occupancy ~constant at any corpus size",
    ),
    (
        "win_sliding_distinct",
        "sliding distinct without re-scans: events fold once to bitmap "
        "partials, pane fan-out re-merges <=3 partial rows per pane — "
        "shuffle ∝ hours×idspace/64, independent of event volume",
    ),
    (
        "embed_pq_quantize",
        "PQ codes at scan speed: literal-array codebook + zip_with/aggregate "
        "loops (stays out of the huge-method codegen cliff), no joins, no "
        "shuffles",
    ),
    (
        "events_cooccurrence_lift",
        "distinct-shrink before pairing: the pair join consumes the "
        "(user,type) aggregate — user-local pairs, |types|² final keys, "
        "count dims broadcast",
    ),
    (
        "graph_pagerank",
        "iterative shape: 5 fixed node-key shuffle rounds over a once-"
        "materialized edge list; score frame stays node-dim-sized",
    ),
    (
        "join_full_outer_reconcile",
        "one key-partitioned full outer replaces three semi/anti/intersect "
        "passes; classification is a null-pattern projection",
    ),
    (
        "sim_knn_graph_ivf",
        "corpus-scaled quantizer: cell count from a 1-row count broadcast, "
        "cell-local self-join + per-vector rank — pairs linear in N",
    ),
    (
        "agg_weighted_median",
        "two-pass bucketed exact weighted percentile: histogram agg locates "
        "the cut bucket (map-side combine), only ~1/1024 of each group "
        "re-sorts — no single-task group sort even with a 3-value key; "
        "naive window form measured 7.7× at the 10× replica (r5)",
    ),
    (
        "agg_distinct_bitmap",
        "exact distinct without Expand: bit_or bitmap partials combine "
        "map-side, shuffle carries ≤ keys×idspace/64 longs — the roaring "
        "pattern, mergeable across batches (r5)",
    ),
    (
        "dedup_verify_pipeline",
        "staged verify chain: band candidates (bucket-local join) → Jaccard "
        "set algebra → edit DP on survivors only — DP cost tracks survivor "
        "count, measured by the SCALING.md threshold sweep (r6)",
    ),
    (
        "win_cume_dist_approx",
        "the ONLY Window runs over the ≤1024-bin histogram aggregate, never "
        "the row stream; rows rejoin their bin via broadcast — no single-task "
        "segment sort anywhere (r6)",
    ),
    (
        "join_dynamic_partition_prune",
        "fact scan carries dynamicpruningexpression injected from the "
        "run-time-filtered dim broadcast — only matching partition dirs are "
        "listed/read (r6)",
    ),
    (
        "sim_lsh_ann",
        "deterministic sign-projection coding is scan-fused literals; "
        "candidate join is equi on (table, bucket) with the probe side "
        "broadcast — the corpus never shuffles (r6)",
    ),
    (
        "events_sessionize_gap",
        "lag flag + running session id stacked over ONE user_id exchange and "
        "one sort; per-session agg collapses map-side to a 1-row dashboard "
        "output (r6)",
    ),
    (
        "graph_triangle_count",
        "degree-ORIENTED wedge join: both wedge sides read the same "
        "checkpointed oriented edge list, fan-out bounded by max out-degree "
        "= O(sqrt(m)); totals come from the degree table, no second corpus "
        "pass (r7)",
    ),
    (
        "sample_balanced_threshold",
        "the only corpus-wide ops are a map-side 4096-bucket histogram and a "
        "boundary-bucket-only rank — per-task work corpus/4096 regardless of "
        "class skew; selection identical to the rank form (r7)",
    ),
    (
        "mix_budget_waterfill",
        "corpus token count checkpointed ONCE; every later pass is "
        "|sources|-row dimension math with 1-row broadcast scalars — depth-k "
        "waterfilling never re-scans the corpus (r7)",
    ),
    (
        "embed_pca_power",
        "matrix-free power iteration: per-iteration vec-keyed dot agg + "
        "dim-keyed rank-1 agg, v (64 rows) broadcast both times, quantized "
        "rows checkpointed once — the Gram matrix never materializes",
    ),
    (
        "agg_ks_test",
        "distributed exact ECDF: per-value counts checkpoint once (single "
        "fact scan), 4096-bucket partials cumulate in a dimension window, "
        "bucket-local running sums + broadcast offsets — never a global "
        "single-task sort",
    ),
    (
        "select_pareto_skyline",
        "skyline via coarse-prune + refine: bucket-maxima cum-max window is "
        "dimension-sized and broadcasts back; bucket-local range windows do "
        "the exact dominance — no pair join, no global sort",
    ),
    (
        "dedup_substring_spans",
        "ExactSubstr span coverage: gram expansion fused into the scan "
        "projection (generator in the scan stage, no pre-shuffle "
        "materialization); ONE corpus-sized exchange keyed on the span for "
        "the count window, then the per-doc agg — at 100 TB the span key "
        "becomes xxhash64(span) to cut shuffle bytes, same tree",
    ),
    (
        "embed_cosine_histogram",
        "sampled quadratic made explicit: pushed sample filter at the scan, "
        "BroadcastNestedLoopJoin over the broadcast sample (pair expansion "
        "is shuffle-free map-side), dot-product fold JVM-side, tiny "
        "histogram agg — no SortMergeJoin, no cartesian of the full table",
    ),
    (
        "sim_mmr_rerank",
        "greedy MMR as ONE JVM fold: broadcast-probe cosine scan (corpus "
        "never shuffles), probe-keyed top-C window, then the 5-step greedy "
        "selection is a single projection over the per-probe candidate "
        "array — no per-step jobs, no EvalPython",
    ),
    (
        "agg_mannwhitney_u",
        "exact rank test with no global row sort: one corpus exchange to "
        "per-distinct-value arm counts, midrank prefix window on the value "
        "DOMAIN, single-row tie-corrected finale",
    ),
    (
        "agg_spearman_corr",
        "rank correlation via two value-domain midrank tables joined back "
        "to the row stream on equi keys — domain windows, HUGEINT/DECIMAL "
        "cross sums, no corpus-sized sort",
    ),
    (
        "events_peak_concurrency",
        "sweep line over the MINUTE domain: ±1 boundary deltas collapse "
        "map-side to minute keys, prefix window runs on |distinct minutes| "
        "rows per type, peak/argmin via a domain-table join",
    ),
    (
        "tokenizer_bpe_pair_step",
        "BPE pair counts off the frequency-collapsed VOCABULARY (pair "
        "Generate above the vocab exchange — the raw token stream is never "
        "pair-exploded); top-k window on the alphabet²-bounded pair table",
    ),
    (
        "agg_median_selection",
        "exact median WITHOUT sorting corpus rows (r8): rows collapse to "
        "(group, value) counts map-side, the cumulative window runs on the "
        "DISTINCT-VALUE domain (bounded by the centi grid, constant in "
        "corpus size), selection agg picks the two middle order stats — "
        "measured FLAT (0.94×) at 10× rows while the percentile sort form "
        "grows 2.0× (SCALING.md crossover table)",
    ),
    (
        "agg_bootstrap_ci",
        "Poisson bootstrap (r8): the 32× replicate explode collapses "
        "map-side to ≤32 partial rows per partition BEFORE the one "
        "hash exchange — the shuffle never sees the fan-out; percentile "
        "runs over exactly B=32 integer replicate means; the only join "
        "is the 1-row broadcast cross assembling the output",
    ),
    (
        "stream_session_window",
        "Spark's NATIVE session operator (r8): UpdatingSessionsExec merges "
        "gap-closed sessions partition-locally after ONE user-keyed "
        "exchange — no window function, no lag/cumsum; the physical "
        "strategy a streaming sessionizer runs with a watermark",
    ),
    (
        "cdc_apply_changelog",
        "ordered CDC apply (r8): snapshot ∪ changelog → one key-partitioned "
        "row_number window → post-window delete filter — NO join, so no "
        "skew pairing; the win_rownum_latest kernel doing table maintenance",
    ),
    (
        "audit_column_profile",
        "measured plan choice (r8): five column-PRUNED scans (ReadSchema = "
        "exactly one column each, plan-asserted) beat the one-scan "
        "multi-distinct draft 2.5× at every scale — the draft's Expand "
        "pushes 5× row volume through the distinct agg; columnar pruning "
        "makes five 1-column scans byte-equivalent to one 5-column scan",
    ),
    (
        "graph_link_prediction_ra",
        "RA link prediction (r8): wedges enumerate from the 50-neighbor "
        "md5-capped adjacency (per-center work ≤ cap², hub-proof) while "
        "true degrees come from a |nodes| agg; integer 1e6 div deg scores; "
        "anti-join strips known edges; top-20 via rank over candidates only",
    ),
    (
        "join_null_safe_split",
        "split-null-partition join (r9): ONE equi join over isnotnull-"
        "pre-filtered keys (no EqualNullSafe operator, so no all-nulls "
        "hash bucket — the skew AQE cannot split); the null partition is "
        "a metadata multiply assembled via broadcast 1-row crosses; "
        "measured 23.9× over the <=> plan at 40% nulls",
    ),
    (
        "win_outlier_iqr_fences",
        "Tukey fences (r9 selection swap): quartiles from a counting-"
        "selection window over the (group, value) DOMAIN table — no "
        "percentile() sort-buffer, no corpus-row sort; the |groups|-row "
        "quartile frame broadcasts back against the rescan for one "
        "conditional count (1.8× → 1.1× at 10×)",
    ),
]


def main() -> None:
    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import get_spark

    all_queries()
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — flagship physical plans, annotated",
        "",
        "Regenerate: `PYTHONPATH=. python scripts/gen_plans.py` (plans at "
        "sf0.01; shapes are asserted by tests/test_plans.py so they cannot "
        "silently regress).",
        "",
    ]
    for name, note in FLAGSHIPS:
        import contextlib
        import io

        df = REGISTRY[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + scans; drop the long per-node detail dump
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"*{note}*", "", "```", tree, "```", ""]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md: {len(FLAGSHIPS)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
