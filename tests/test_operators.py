"""Unit + property tests for custom operators: as-of join, multimodal
decode plumbing, LSH recall, and algebraic invariants (SURVEY.md §5.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators.asof import asof_join, nearest_join
from cassandra_syncer_spark.operators.multimodal import (
    attach_fake_payload,
    decode_media,
    frame_sample,
)


def test_asof_join_handcrafted(spark):
    left = spark.createDataFrame(
        [("u1", 10, "L1"), ("u1", 20, "L2"), ("u1", 5, "L0"), ("u2", 7, "L3")],
        "user_id string, ts_sec long, tag string",
    ).select("user_id", "ts_sec", "tag")
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 15, 150), ("u2", 99, 990)],
        "user_id string, ts_sec long, event_id long",
    )
    out = {
        (r.user_id, r.ts_sec): (r.matched_event_id, r.matched_ts)
        for r in asof_join(
            left, right, on="user_id", left_ts="ts_sec", right_ts="ts_sec",
            value_cols=["event_id"],
        ).collect()
    }
    assert out[("u1", 5)] == (None, None)       # nothing at-or-before 5
    assert out[("u1", 10)] == (100, 10)         # equal ts matches (<=)
    assert out[("u1", 20)] == (150, 15)         # latest before 20
    assert out[("u2", 7)] == (None, None)       # right row is in the future


def test_asof_join_tie_determinism(spark):
    left = spark.createDataFrame([("u1", 10)], "user_id string, ts_sec long")
    right = spark.createDataFrame(
        [("u1", 10, 1), ("u1", 10, 2)], "user_id string, ts_sec long, event_id long"
    )
    [row] = asof_join(
        left, right, on="user_id", left_ts="ts_sec", right_ts="ts_sec",
        value_cols=["event_id"],
    ).collect()
    assert row.matched_event_id == 2  # max tiebreak, deterministically


def test_nearest_join_handcrafted(spark):
    left = spark.createDataFrame(
        [("u1", 10), ("u1", 14), ("u1", 100), ("u2", 7), ("u3", 1)],
        "user_id string, ts_sec long",
    )
    right = spark.createDataFrame(
        [("u1", 8, 80), ("u1", 15, 150), ("u2", 99, 990)],
        "user_id string, ts_sec long, event_id long",
    )
    out = {
        (r.user_id, r.ts_sec): (r.matched_event_id, r.matched_ts)
        for r in nearest_join(
            left, right, on="user_id", left_ts="ts_sec", right_ts="ts_sec",
            value_cols=["event_id"],
        ).collect()
    }
    assert out[("u1", 10)] == (80, 8)    # backward 2 < forward 5
    assert out[("u1", 14)] == (150, 15)  # forward 1 < backward 6
    assert out[("u1", 100)] == (150, 15) # forward empty → backward
    assert out[("u2", 7)] == (990, 99)   # backward empty → forward
    assert ("u3", 1) not in out          # no right rows for key → dropped


def test_nearest_join_tie_prefers_backward(spark):
    left = spark.createDataFrame([("u1", 10)], "user_id string, ts_sec long")
    right = spark.createDataFrame(
        [("u1", 7, 70), ("u1", 13, 130)], "user_id string, ts_sec long, event_id long"
    )
    [row] = nearest_join(
        left, right, on="user_id", left_ts="ts_sec", right_ts="ts_sec",
        value_cols=["event_id"],
    ).collect()
    assert (row.matched_event_id, row.matched_ts) == (70, 7)  # equal d=3 → backward


def test_nearest_join_exact_ts_wins_with_zero_distance(spark):
    left = spark.createDataFrame([("u1", 10)], "user_id string, ts_sec long")
    right = spark.createDataFrame(
        [("u1", 10, 1), ("u1", 10, 2), ("u1", 11, 3)],
        "user_id string, ts_sec long, event_id long",
    )
    [row] = nearest_join(
        left, right, on="user_id", left_ts="ts_sec", right_ts="ts_sec",
        value_cols=["event_id"],
    ).collect()
    # exact-ts rows collapse deterministically (max event_id) and beat d=1
    assert (row.matched_event_id, row.matched_ts) == (2, 10)


def test_multimodal_decode_fake_and_real(spark, sf_dir):
    from cassandra_syncer_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    with_payload = attach_fake_payload(docs)
    decoded = decode_media(with_payload, fake=True).collect()
    assert len(decoded) == 20
    for r in decoded:
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert len(r.checksum) == 32 and r.n_bytes > 0
    # the real path sniffs magic bytes: text payloads are not images, so
    # they classify as opaque bytes with null dims — no error, no stub
    real = decode_media(with_payload, fake=False).collect()
    assert len(real) == 20
    for r in real:
        assert r.media_type == "application/octet-stream"
        assert r.width is None and r.height is None


def test_frame_sample_shape(spark, sf_dir):
    from cassandra_syncer_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    frames = frame_sample(attach_fake_payload(docs), every_n_bytes=512).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for idxs in by_doc.values():
        assert idxs == list(range(len(idxs)))  # contiguous frame indices


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """Deterministic sign-projection LSH must find a decent fraction of
    the true top-5 neighbors on the fixture corpus (structureless random
    unit vectors — LSH's documented worst case)."""
    from cassandra_syncer_spark.queries.llm_similarity import sim_cosine_topk, sim_lsh_ann

    truth = {
        (r.q_id, r.vec_id) for r in sim_cosine_topk(spark, sf_dir).collect()
    }
    lsh_pairs = {
        (r.q_id, r.vec_id) for r in sim_lsh_ann(spark, sf_dir).collect()
    }
    recall = len(truth & lsh_pairs) / len(truth)
    assert recall >= 0.5, f"LSH recall too low: {recall:.2f}"


def test_ivf_recall_both_quantizers(spark, sf_dir):
    """Both quantizer plugs of the unified IVF operator — fixed centroids
    (n_probe=1, the oracle path) and seeded k-means (n_probe=2, the
    production path) — measured against the same brute-force baseline in
    one test.  K-means must recover ≥ 0.8 of the true top-5 (the quality
    gate that stands in for an oracle); the fixed quantizer's recall is
    reported alongside (≥ 0.3 sanity floor at n_probe=1 on effectively
    random unit vectors, where recall tracks probed corpus fraction)."""
    from cassandra_syncer_spark.queries.llm_similarity import ivf_topk, sim_cosine_topk

    truth = {(r.q_id, r.vec_id) for r in sim_cosine_topk(spark, sf_dir).collect()}
    recalls = {}
    for quantizer, n_probe in [("fixed", 1), ("kmeans", 2)]:
        got = {
            (r.q_id, r.vec_id)
            for r in ivf_topk(spark, sf_dir, quantizer=quantizer, n_probe=n_probe).collect()
        }
        recalls[quantizer] = len(truth & got) / len(truth)
    assert recalls["kmeans"] >= 0.8, f"IVF recalls: {recalls}"
    assert recalls["fixed"] >= 0.3, f"IVF recalls: {recalls}"

    import pytest

    with pytest.raises(ValueError):
        ivf_topk(spark, sf_dir, quantizer="nope")


def test_connected_components_handcrafted(spark):
    """Min-label propagation on a known graph: two chains and an isolated
    pair — components labeled by their minimum member, chain diameter > 1
    exercises multi-round convergence."""
    from cassandra_syncer_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src long, dst long",
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_raises_when_round_budget_too_small(spark):
    """A chain with diameter > max_iterations must raise, never return
    silently-unmerged labels (the labels would diverge from the
    transitive-closure oracle)."""
    import pytest

    from cassandra_syncer_spark.operators.components import (
        ComponentsNotConverged,
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(ComponentsNotConverged):
        connected_components(chain, max_iterations=2)
    # same graph converges with an adequate budget
    got = {r.id: r.component for r in connected_components(chain).collect()}
    assert set(got.values()) == {0}


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The approx percentile (rows-only in t2) must sit within 2% relative
    error of the exact percentile per group — the accuracy contract that
    justifies swapping it in at scale."""
    from cassandra_syncer_spark.queries.incremental import (
        agg_percentile,
        agg_percentile_approx_sketch,
    )

    exact = {r.l_returnflag: (r.p50, r.p95) for r in agg_percentile(spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: (r.p50, r.p95)
        for r in agg_percentile_approx_sketch(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) / e < 0.02, f"{k}: approx {a} vs exact {e}"


def test_approx_distinct_tracks_exact(spark, sf_dir):
    """The HLL++ count-distinct (rows-only in t2) must sit within 5%
    (2.5σ at rsd=0.02) of the exact per-group distinct — the accuracy
    contract that justifies swapping it in at scale.  Also pins the row
    count to the event-type cardinality so the driver's rows-only check
    has a documented expectation."""
    from cassandra_syncer_spark.queries.relational import (
        agg_approx_distinct_sketch,
        agg_count_distinct,
    )

    exact = {r.event_type: r.n_users for r in agg_count_distinct(spark, sf_dir).collect()}
    approx = {
        r.event_type: r.approx_users
        for r in agg_approx_distinct_sketch(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    assert len(approx) == 5  # one row per event_type at every sf
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (
            f"{k}: approx {approx[k]} vs exact {exact[k]}"
        )


def test_hll_union_accuracy(spark, sf_dir):
    """Unioning per-(lang,source) HLL sketches must estimate per-lang
    distinct word counts within 5% of exact — the accuracy contract that
    makes the mergeable-partials path (agg_hll_union, rows-only in t2)
    substitutable for exact countDistinct at scale."""
    from cassandra_syncer_spark.queries.analytics_r3b import agg_hll_union_sketch
    from cassandra_syncer_spark.queries.relational import T

    est = {r.lang: r.est_words for r in agg_hll_union_sketch(spark, sf_dir).collect()}
    words = T(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    )
    exact = {
        r.lang: r.n
        for r in words.groupBy("lang")
        .agg(F.countDistinct("word").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        assert abs(est[k] - exact[k]) / exact[k] < 0.05, (
            f"{k}: HLL {est[k]} vs exact {exact[k]}"
        )


def test_filter_commutes_and_semi_subset(spark, sf_dir):
    from cassandra_syncer_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).filter(F.col("l_discount") < 0.05)
    b = li.filter(F.col("l_discount") < 0.05).filter(F.col("l_quantity") > 10)
    assert a.count() == b.count()

    orders = load_table(spark, sf_dir, "orders")
    semi = li.join(orders.limit(100), li.l_orderkey == orders.o_orderkey, "left_semi")
    assert semi.count() <= li.count()


def test_dropduplicates_idempotent_union_additive(spark, sf_dir):
    from cassandra_syncer_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    d1 = li.dropDuplicates()
    assert d1.count() == d1.dropDuplicates().count()

    part1 = li.limit(1000)
    assert part1.unionAll(li).count() == 1000 + li.count()


def test_malformed_json_props_yield_null(spark):
    """from_json must degrade to NULL on malformed documents (the reference
    would crash on JSON.parse; we keep the row and null the field)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("ok", '{"k": 5}'), ("bad", "{not json"), ("empty", None)],
        "tag string, props string",
    ).select("tag", F.from_json("props", "struct<k:int>").getField("k").alias("k"))
    out = {r.tag: r.k for r in df.collect()}
    assert out == {"ok": 5, "bad": None, "empty": None}


def test_int8_ann_recall_vs_float(spark, duck, sf_dir):
    """Quantization quality gate.  The fixture embeddings are near-random
    unit vectors (the IVF tests document the same property), so exact
    top-5 margins are at quantization-noise scale and strict top5-vs-top5
    recall is the worst case — gate it loosely (≥0.4), and gate the
    metric that actually matters for a quantized index (does int8 keep
    the true neighborhood?) tightly: every int8 top-5 hit should sit in
    the float top-20 (recall ≥0.8).  Oracle parity proves the int8
    ranking is computed correctly; this proves quantization doesn't
    wreck retrieval."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    got: dict[int, set[int]] = {}
    for r in REGISTRY["sim_ann_int8"].fn(spark, sf_dir).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)

    truth_rows = duck.execute(
        """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
                 list_sum(list_transform(range(1, len(a.v) + 1),
                                         i -> a.v[i] * b.v[i])) AS cos
          FROM e a JOIN e b ON b.vec_id >= 5
          WHERE a.vec_id < 5
        ),
        ranked AS (
          SELECT q_id, vec_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
          FROM pairs
        )
        SELECT q_id, vec_id, rn FROM ranked WHERE rn <= 20
        """
    ).fetchall()
    top5: dict[int, set[int]] = {}
    top20: dict[int, set[int]] = {}
    for q_id, vec_id, rn in truth_rows:
        top20.setdefault(q_id, set()).add(vec_id)
        if rn <= 5:
            top5.setdefault(q_id, set()).add(vec_id)

    n = sum(len(v) for v in top5.values())
    strict = sum(len(got[q] & top5[q]) for q in top5) / n
    neighborhood = sum(len(got[q] & top20[q]) for q in top20) / n
    assert neighborhood >= 0.8, f"int8 top-5 escaped the float top-20: {neighborhood:.2f}"
    assert strict >= 0.4, f"int8 strict top-5 recall collapsed: {strict:.2f}"


def test_doc_chunks_reconstruct_documents(spark, sf_dir):
    """doc_chunk_split invariant: chunks are substr(text, i*400+1, 500),
    so stitching the first 400 chars of every chunk plus the final
    chunk's tail reproduces the document exactly — verified against an
    independent Python reimplementation via the emitted md5s (the chunk
    hashes are the operator's output contract)."""
    import hashlib

    from cassandra_syncer_spark.queries.analytics_r4b import doc_chunk_split
    from cassandra_syncer_spark.queries.relational import T

    texts = {
        r.doc_id: r.text
        for r in T(spark, sf_dir, "documents").select("doc_id", "text").limit(25).collect()
    }
    got = {}
    for r in doc_chunk_split(spark, sf_dir).collect():
        if r.doc_id in texts:
            got.setdefault(r.doc_id, {})[r.chunk_id] = (r.chunk_md5, r.chunk_len)
    for doc_id, text in texts.items():
        l = max(len(text), 1)
        expected = {
            i: (
                hashlib.md5(text[i * 400 : i * 400 + 500].encode()).hexdigest(),
                len(text[i * 400 : i * 400 + 500]),
            )
            for i in range((l - 1) // 400 + 1)
        }
        assert got[doc_id] == expected, f"doc {doc_id} chunking mismatch"
        # coverage invariant: chunks tile the text with 100-char overlap
        assert sum(n for _, n in expected.values()) >= len(text)


def test_contamination_prefiltered_equals_exact(spark, sf_dir):
    """text_contamination_prefiltered's contract: the gram prefilter is a
    candidate SUPERSET on this corpus, so after the exact contains verify
    its output must equal the retired exact demo row for row."""
    from cassandra_syncer_spark.queries.analytics_r4 import (
        text_contamination_exact_demo,
    )
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    exact = {
        (r.doc_id, r.n_hits)
        for r in text_contamination_exact_demo(spark, sf_dir).collect()
    }
    pre = {
        (r.doc_id, r.n_hits)
        for r in REGISTRY["text_contamination_prefiltered"].fn(spark, sf_dir).collect()
    }
    assert exact, "exact query found no contamination — fixture drifted?"
    assert pre == exact


def test_verify_jaccard_subset_of_candidates(spark, sf_dir):
    """dedup_verify_jaccard keeps only candidate pairs from the MinHash
    banding front end, and every kept pair's exact word-set Jaccard is
    ≥ 0.5 — the two-stage candidate→verify contract."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    cand = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["text_minhash_dedup"].fn(spark, sf_dir).collect()
    }
    kept = REGISTRY["dedup_verify_jaccard"].fn(spark, sf_dir).collect()
    assert kept, "verify stage kept nothing — banding or threshold drifted"
    for r in kept:
        assert (r.doc_a, r.doc_b) in cand
        assert r.jaccard >= 0.5


def test_salted_self_pairs_equals_plain_join(spark, sf_dir):
    """salted_self_pairs contract: exact pair-set equality with the plain
    bucket-local self-join, under a planted hot bucket that forces S > 1
    salt groups (and small buckets that degenerate to S = 1)."""
    from pyspark.sql import functions as F

    from cassandra_syncer_spark.operators.skew import salted_self_pairs

    # 3 buckets: hot (500 ids -> S=10 at cap 50), warm (60 -> S=2), cold (7 -> S=1)
    rows = (
        [(0, "hot", i) for i in range(500)]
        + [(1, "warm", 10_000 + i) for i in range(60)]
        + [(0, "cold", 20_000 + i) for i in range(7)]
    )
    bands = spark.createDataFrame(rows, "band_id int, band_key string, doc_id long")
    a, b = bands.alias("a"), bands.alias("b")
    plain = {
        (r.band_id, r.band_key, r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.band_id").alias("band_id"),
            F.col("a.band_key").alias("band_key"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .collect()
    }
    salted = [
        (r.band_id, r.band_key, r.doc_a, r.doc_b)
        for r in salted_self_pairs(
            bands, key_cols=["band_id", "band_key"], id_col="doc_id", cap=50
        ).collect()
    ]
    assert len(salted) == len(set(salted)), "salted pair expansion duplicated pairs"
    assert set(salted) == plain
    # sanity: the hot bucket really exercised the multi-salt path
    assert 500 * 499 // 2 == sum(1 for p in salted if p[1] == "hot")


def test_minhash_estimate_tracks_jaccard(spark, sf_dir):
    """The 8-perm signature-agreement estimate must track exact shingle
    Jaccard on the band candidates: mean |est - exact| within the
    sampling error of 8 permutations (sigma = sqrt(j(1-j)/8) <= 0.18),
    and high-similarity pairs (>= 0.9) must estimate high (>= 0.5)."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    rows = REGISTRY["dedup_minhash_estimate"].fn(spark, sf_dir).collect()
    assert rows, "band candidates expected on the fixture corpus"
    mae = sum(abs(r.est_micro - r.jacc_micro) for r in rows) / len(rows) / 1e6
    assert mae <= 0.25, f"estimator MAE {mae:.3f} off the 8-perm envelope"
    for r in rows:
        if r.jacc_micro >= 900_000:
            assert r.est_micro >= 500_000, (r.doc_a, r.doc_b, r.est_micro)


def test_hist_percentile_within_bin(spark, sf_dir):
    """The 1024-bin histogram estimate must land within one bin width of
    the exact nearest-rank percentile (the sketch's error bound)."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import load_table

    all_queries()
    est = {r.l_returnflag: r for r in
           REGISTRY["agg_percentile_hist"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("vc"),
    )
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag").agg(
            F.expr("percentile(vc, 0.5)").alias("p50"),
            F.expr("percentile(vc, 0.95)").alias("p95"),
        ).collect()
    }
    for g, e in est.items():
        x = exact[g]
        assert abs(e.p50_est_centi - x.p50) <= 2 * e.bin_centi, (g, e, x.p50)
        assert abs(e.p95_est_centi - x.p95) <= 2 * e.bin_centi, (g, e, x.p95)


def test_simhash_bit_agreement_separates_dups_from_collisions(spark, sf_dir):
    """Bit agreement must separate true near-dups (high shingle Jaccard)
    from band-collision noise — the property the Hamming <= 3 cut in
    dedup_simhash relies on."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    rows = REGISTRY["dedup_simhash_estimate"].fn(spark, sf_dir).collect()
    assert rows
    dup = [r.hamming for r in rows if r.jacc_micro >= 500_000]
    noise = [r.hamming for r in rows if r.jacc_micro <= 200_000]
    assert dup, "fixture corpus should contain high-Jaccard candidate pairs"
    mean_dup = sum(dup) / len(dup)
    assert mean_dup <= 3.0, f"near-dup pairs should have tiny Hamming: {mean_dup}"
    if noise:
        mean_noise = sum(noise) / len(noise)
        assert mean_noise > mean_dup, (mean_dup, mean_noise)


def test_band_index_incremental_equals_batch(spark, sf_dir, tmp_path):
    """Probing batch B against a persisted index of A must yield exactly
    the A-to-B cross pairs of a full dedup over the union — the
    incremental lifecycle loses and invents nothing."""
    from cassandra_syncer_spark.operators.band_index import (
        append_index,
        build_bands,
        probe_index,
    )
    from cassandra_syncer_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 5 != 0)   # existing corpus
    b = docs.filter(F.col("doc_id") % 5 == 0)   # today's batch

    idx_path = str(tmp_path / "band_index")
    append_index(build_bands(a), idx_path)
    got = {
        (r.new_doc, r.existing_doc, r.n_shared_bands)
        for r in probe_index(spark, idx_path, build_bands(b)).collect()
    }

    # batch reference: all-pairs band join over the union, A-side x B-side
    all_bands = build_bands(docs)
    x, y = all_bands.alias("x"), all_bands.alias("y")
    want = {
        (r.new_doc, r.existing_doc, r.n)
        for r in x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key")),
        )
        .filter((F.col("x.doc_id") % 5 == 0) & (F.col("y.doc_id") % 5 != 0))
        .groupBy(
            F.col("x.doc_id").alias("new_doc"),
            F.col("y.doc_id").alias("existing_doc"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want and got, f"incremental {len(got)} vs batch {len(want)}"

    # appending B then probing a further batch C sees BOTH A and B docs
    append_index(build_bands(b), idx_path)
    c = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )  # shifted ids: every C doc is "new"
    hits = probe_index(spark, idx_path, build_bands(c))
    partners = {r.existing_doc % 5 == 0 for r in hits.collect()}
    assert partners == {True, False}, "probe must see both index generations"


def test_bloom_prefilter_no_false_negatives_and_selective(spark, sf_dir):
    """The bloom prefilter must pass EVERY true-matching fact row (no
    false negatives — else the exact join would silently lose rows) and
    drop most non-matching rows (else it isn't a useful runtime filter)."""
    from pyspark.sql import functions as F

    from cassandra_syncer_spark.queries.analytics_r5c import (
        bloom_bitmap,
        bloom_probe,
    )
    from cassandra_syncer_spark.queries.relational import T

    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    bitmap = bloom_bitmap(cust.select("c_custkey"), "c_custkey")
    orders = T(spark, sf_dir, "orders")

    true_match = orders.join(
        cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"), "left_semi"
    )
    n_true = true_match.count()
    # no false negatives: every true match passes the bloom
    assert true_match.filter(bloom_probe("o_custkey", bitmap)).count() == n_true

    n_all = orders.count()
    n_pass = orders.filter(bloom_probe("o_custkey", bitmap)).count()
    # selective: the pass set is far closer to |matches| than |fact|
    assert n_true <= n_pass <= n_true + max(10, int(0.05 * n_all)), (
        f"bloom passed {n_pass} of {n_all} rows for {n_true} true matches"
    )


def test_bitmap_distinct_equals_exact(spark, sf_dir):
    """Bitmap-partial distinct must equal count(DISTINCT) exactly."""
    from pyspark.sql import functions as F

    from cassandra_syncer_spark.queries.analytics_r5c import agg_distinct_bitmap
    from cassandra_syncer_spark.queries.relational import T

    got = {
        (r.event_type, r.n_users)
        for r in agg_distinct_bitmap(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.n)
        for r in T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("n"))
        .collect()
    }
    assert got == want


def test_hamming_ann_tracks_cosine(spark, sf_dir):
    """Sign-code Hamming neighbors must overlap brute-force cosine
    neighbors: Hamming distance estimates angular distance, so for each
    probe the top-5 Hamming set should hit the top-20 cosine set."""
    from pyspark.sql import functions as F

    from cassandra_syncer_spark.queries.analytics_r5c import sim_hamming_ann
    from cassandra_syncer_spark.queries.relational import T

    ham = sim_hamming_ann(spark, sf_dir).collect()
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    probes = sorted({r.probe_id for r in ham})
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    hits = total = 0
    for p in probes:
        top_cos = [
            r.vec_id
            for r in a.filter(F.col("a.vec_id") == p)
            .crossJoin(b)
            .filter(F.col("b.vec_id") != p)
            .select(F.col("b.vec_id").alias("vec_id"), dot.alias("cos"))
            .orderBy(F.desc("cos"), "vec_id")
            .limit(20)
            .collect()
        ]
        ham_top = [r.vec_id for r in ham if r.probe_id == p]
        hits += len(set(ham_top) & set(top_cos))
        total += len(ham_top)
    assert total > 0 and hits / total >= 0.4, f"overlap {hits}/{total}"


def test_zorder_buckets_bound_both_dims(spark, sf_dir):
    """layout_zorder_cluster: every z-prefix bucket must bound BOTH source
    dimensions (span <= 64 of a 0..255 domain) — the property that makes
    min/max file stats prune on either predicate.  A single-dim sort
    bucketing bounds only its leading key (the trailing dim spans ~the
    whole domain), which is what this gate distinguishes."""
    from cassandra_syncer_spark.queries.analytics_r5e import layout_zorder_cluster
    from cassandra_syncer_spark.queries.relational import T

    rows = layout_zorder_cluster(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pa_max - r.pa_min <= 64, r
        assert r.sb_max - r.sb_min <= 64, r
    # contrast: bucket by pa alone (linear clustering) and the OTHER dim
    # is unbounded — its span approaches the full observed domain
    k = T(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("pa"), (F.col("l_suppkey") % 256).alias("sb")
    )
    lin = (
        k.groupBy((F.col("pa") / 16).cast("long").alias("bkt"))
        .agg((F.max("sb") - F.min("sb")).alias("sb_span"))
        .agg(F.min("sb_span").alias("worst"))
        .collect()[0]
    )
    sb_domain = k.agg((F.max("sb") - F.min("sb")).alias("d")).collect()[0].d
    assert lin.worst >= sb_domain * 0.9, (lin.worst, sb_domain)


def test_embed_simhash_finds_all_close_pairs(spark, sf_dir):
    """dedup_embed_simhash: pigeonhole guarantee — 7 bands over a 63-bit
    code mean any pair with Hamming distance <= 6 shares at least one
    band, so the banded candidate set must contain EVERY such pair
    (recall is exact below the band count, probabilistic above)."""
    from cassandra_syncer_spark.queries.analytics_r5e import (
        _CODE_SPARK,
        dedup_embed_simhash,
    )
    from cassandra_syncer_spark.queries.relational import T

    got = {(r.vec_a, r.vec_b) for r in dedup_embed_simhash(spark, sf_dir).collect()}
    c = (
        T(spark, sf_dir, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .select("vec_id", F.expr(_CODE_SPARK).alias("code"))
    )
    a, b = c.alias("a"), c.alias("b")
    close = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.bit_count(F.expr("a.code ^ b.code")).alias("h"),
        )
        .filter(F.col("h") <= 6)
        .collect()
    )
    missed = [(r.vec_a, r.vec_b) for r in close if (r.vec_a, r.vec_b) not in got]
    assert not missed, f"pigeonhole violated: {missed}"


def test_sliding_distinct_partials_merge_across_shards(spark):
    """win_sliding_distinct's scale claim: per-hour bitmap partials are
    mergeable — folding two event shards to partials separately and
    bit_or-merging them yields the same pane counts as folding the union
    (the property that lets a steady-state pipeline keep yesterday's
    partials and fold only the new hour)."""
    rows = [(h, u) for h in range(4) for u in range(h * 10, h * 10 + 25)]
    ev = spark.createDataFrame(rows, "h long, user_id long")

    def partials(df):
        return (
            df.select(
                "h",
                (F.col("user_id") / 64).cast("long").alias("bucket"),
                F.expr("shiftleft(1L, int(user_id % 64))").alias("bit"),
            )
            .groupBy("h", "bucket")
            .agg(F.expr("bit_or(bit)").alias("bm"))
        )

    def panes(partial):
        return (
            partial.select(
                F.explode(F.expr("sequence(h, h + 2)")).alias("hour"), "bucket", "bm"
            )
            .groupBy("hour", "bucket")
            .agg(F.expr("bit_or(bm)").alias("bm"))
            .groupBy("hour")
            .agg(F.sum(F.bit_count("bm")).cast("long").alias("n_users"))
        )

    whole = {r.hour: r.n_users for r in panes(partials(ev)).collect()}
    shard_a, shard_b = ev.filter("user_id % 2 = 0"), ev.filter("user_id % 2 = 1")
    merged = (
        partials(shard_a)
        .unionByName(partials(shard_b))
        .groupBy("h", "bucket")
        .agg(F.expr("bit_or(bm)").alias("bm"))
    )
    sharded = {r.hour: r.n_users for r in panes(merged).collect()}
    assert whole == sharded


def test_time_travel_asof_boundaries(spark, sf_dir):
    """scan_time_travel resolves AS OF T to the latest manifest <= T:
    the module's T=250 probe must reproduce the ts=200 snapshot exactly
    (buckets 0-1), not the later ts=300 one — verified against the
    membership predicate each snapshot was written with."""
    from cassandra_syncer_spark.queries.analytics_r5g import scan_time_travel
    from cassandra_syncer_spark.queries.relational import T

    got = {(r.lang, r.n_docs, r.total_chars)
           for r in scan_time_travel(spark, sf_dir).collect()}
    want = {
        (r.lang, r.n_docs, r.total_chars)
        for r in T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 <= 1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .collect()
    }
    assert got == want
    # and the snapshot BEFORE the probe time differs (time travel is not
    # just reading the full table)
    full = {
        (r.lang, r.n_docs, r.total_chars)
        for r in T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .collect()
    }
    assert got != full


def test_scd2_apply_interval_invariants(spark, sf_dir):
    """merge_scd2_apply output must be a valid SCD2 table: exactly one
    current row per key, closed intervals end where the new ones begin,
    and unchanged keys keep their single open interval."""
    from cassandra_syncer_spark.queries.analytics_r5g import merge_scd2_apply

    rows = merge_scd2_apply(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key
    for key, rs in by_key.items():
        current = [r for r in rs if r.is_current]
        assert len(current) == 1, key
        assert current[0].valid_to is None, key
        if len(rs) == 2:  # changed key: [0,100) closed + [100,None) open
            closed = [r for r in rs if not r.is_current][0]
            assert (closed.valid_from, closed.valid_to) == (0, 100), key
            assert current[0].valid_from == 100, key
            assert closed.segment != current[0].segment, key
        else:
            assert len(rs) == 1 and rs[0].valid_from == 0, key


def test_real_media_decode_parses_actual_containers(spark):
    """decode_media(fake=False) must sniff the magic bytes and parse the
    true dimensions out of real PNG / JPEG / GIF / BMP containers — and
    yield null dims (not an error) for unrecognized payloads."""
    import struct

    from cassandra_syncer_spark.operators.multimodal import decode_media

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )
    jpg = (
        b"\xff\xd8"                       # SOI
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"  # APP0 skipped
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 1080, 1920)  # height, width
        + b"\x03" + b"\x00" * 9 + b"\xff\xd9"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 256, -128)  # top-down
    junk = b"not an image at all"
    rows = [(1, png, "x"), (2, jpg, "x"), (3, gif, "x"), (4, bmp, "x"), (5, junk, "x")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, media_type string")
    got = {r.doc_id: r for r in decode_media(df, fake=False).collect()}
    assert (got[1].media_type, got[1].width, got[1].height) == ("image/png", 640, 480)
    assert (got[2].media_type, got[2].width, got[2].height) == ("image/jpeg", 1920, 1080)
    assert (got[3].media_type, got[3].width, got[3].height) == ("image/gif", 320, 200)
    assert (got[4].media_type, got[4].width, got[4].height) == ("image/bmp", 256, 128)
    assert got[5].media_type == "application/octet-stream"
    assert got[5].width is None and got[5].height is None
    assert got[1].n_bytes == len(png)


def test_cume_dist_approx_tracks_exact(spark, sf_dir):
    """The histogram position estimate must bound the exact cume_dist
    from above with error at most the occupancy share of the row's own
    bin (the sketch's documented envelope)."""
    from cassandra_syncer_spark.queries.analytics_r3b import win_cume_dist
    from cassandra_syncer_spark.queries.analytics_r6 import win_cume_dist_approx

    exact = {
        r.c_custkey: (r.c_mktsegment, r.cd)
        for r in win_cume_dist(spark, sf_dir).collect()
    }
    est_rows = win_cume_dist_approx(spark, sf_dir).collect()
    # per-segment row counts for the bin-share bound
    seg_n: dict[str, int] = {}
    for seg, _ in exact.values():
        seg_n[seg] = seg_n.get(seg, 0) + 1
    assert est_rows and len(est_rows) == len(exact)
    for r in est_rows:
        seg, cd_exact = exact[r.c_custkey]
        est = r.cd_est_micro / 1_000_000
        # est floors to micro-units and the exact cd rounds to 6 dp, so
        # allow 2 micro-units of slack on the lower bound
        assert est >= cd_exact - 2e-6, (r.c_custkey, est, cd_exact)
        # max one-bin overshoot: at 1024 bins over n rows a bin rarely
        # holds more than ~1% of the segment; allow a generous 5%
        assert est - cd_exact <= 0.05, (r.c_custkey, est, cd_exact)


def test_bitmap_intersect_matches_hll_exact_columns(spark, sf_dir):
    """agg_bitmap_intersect (bitmap AND popcounts) and agg_hll_intersection
    (member-level exact side) compute the same ground truth through two
    unrelated dataflows — they must agree pair for pair."""
    from cassandra_syncer_spark.registry import REGISTRY, all_queries

    all_queries()
    bit = {
        (r.pa, r.pb): r.inter_exact
        for r in REGISTRY["agg_bitmap_intersect"].fn(spark, sf_dir).collect()
    }
    hll = {
        (r.pa, r.pb): r.inter_exact
        for r in REGISTRY["agg_hll_intersection"].fn(spark, sf_dir).collect()
    }
    assert bit and bit == hll


def test_sniff_and_parse_never_crashes_on_arbitrary_bytes():
    """The header parser is exposed to untrusted payloads: truncated
    containers, lying magic bytes, and random garbage must classify or
    yield null dims — never raise."""
    import random

    from cassandra_syncer_spark.operators.multimodal import _sniff_and_parse

    rng = random.Random(42)
    magics = [
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"BM", b"\xff\xd8", b""
    ]
    for trial in range(500):
        head = rng.choice(magics)
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        mt, w, h = _sniff_and_parse(head + body)
        assert isinstance(mt, str)
        assert w is None or isinstance(w, int)
        assert h is None or isinstance(h, int)
    # truncated real containers: magic present, header cut short
    import struct

    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
    for cut in range(len(png) + 8):
        _sniff_and_parse(png[:cut])  # must not raise


def test_table_row_count_paths(spark, sf_dir, tmp_path):
    """table_row_count must be exact on local footers, fall back to a
    count() job when the path is not visible to os.path (object-store /
    URI sf_dirs — VERDICT r11 item 7), and raise on a parquet-less
    replica dir instead of silently returning 0 (which would flip
    sim_hamming_ann's strategy gate)."""
    from cassandra_syncer_spark.session import load_table, table_row_count

    exact = load_table(spark, sf_dir, "nation").count()
    # local single-file fixture: footer metadata, no session needed
    assert table_row_count(sf_dir, "nation") == exact

    # directory replica: per-file footers summed
    rep = tmp_path / "rep"
    load_table(spark, sf_dir, "nation").repartition(3).write.parquet(
        str(rep / "nation.parquet")
    )
    assert table_row_count(str(rep), "nation") == exact

    # non-local path (file: URI — os.path can't see it, Spark can):
    # falls back to one exact count() job
    assert table_row_count(f"file://{rep}", "nation", spark) == exact
    # ... and without a session to fall back to, it raises
    with pytest.raises(FileNotFoundError):
        table_row_count(f"file://{rep}", "nation")

    # parquet-less replica dir: raise, never a silent 0
    empty = tmp_path / "empty"
    (empty / "nation.parquet").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        table_row_count(str(empty), "nation")
