"""Property tests for the round-7 batch 11 operators — each law checked
against an independent brute-force computation on randomized inputs, so
correctness doesn't rest only on the fixture-shaped oracle."""

from __future__ import annotations

import collections
import datetime
import math
import random


def _stage(spark, tmp_path, name, rows, schema, table):
    out = str(tmp_path / name)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{out}/{table}.parquet"
    )
    return out


def _round_half_away(x: float) -> int:
    """Mirror Spark/DuckDB ROUND (half away from zero) — Python's round()
    is banker's rounding and would diverge on exact .5 values."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def test_mmr_matches_bruteforce_greedy(spark, tmp_path):
    """The JVM aggregate-fold MMR == a plain Python greedy loop with the
    same integer-micro scoring (7·rel − 3·max-sim, ties by id), on random
    non-unit vectors (cosine≠dot doesn't matter — the operator is defined
    on dots, and determinism is what's under test)."""
    from cassandra_syncer_spark.queries.analytics_r7k import (
        _MMR_CANDS,
        _MMR_PROBES,
        _MMR_SELECT,
        sim_mmr_rerank,
    )

    rng = random.Random(7)
    for trial in range(3):
        n, dim = rng.randint(25, 60), rng.choice([4, 8])
        vecs = {
            i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)] for i in range(n)
        }
        sf = _stage(
            spark,
            tmp_path,
            f"mmr{trial}",
            [(i, v, 0) for i, v in vecs.items()],
            "vec_id long, embedding array<float>, label int",
            "embeddings",
        )
        got = [
            (r.q_id, r.sel_rank, r.vec_id, r.mmr_micro)
            for r in sim_mmr_rerank(spark, sf).collect()
        ]
        # float32 storage round-trip: mirror what Spark/DuckDB read back
        import struct as _s

        f32 = {
            i: [_s.unpack("f", _s.pack("f", x))[0] for x in v]
            for i, v in vecs.items()
        }
        want = []
        for qid in range(_MMR_PROBES):
            qv = f32[qid]
            rel = {}
            for i, v in f32.items():
                if i == qid:
                    continue
                d = 0.0
                for x, y in zip(qv, v):
                    d += x * y
                rel[i] = _round_half_away(1000000 * d)
            cands = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_CANDS]
            sel = []
            for step in range(_MMR_SELECT):
                best = None
                for c in cands:
                    if c in [s for s, _ in sel]:
                        continue
                    pen = 0
                    if sel:
                        pens = []
                        for s, _ in sel:
                            d = 0.0
                            for x, y in zip(f32[c], f32[s]):
                                d += x * y
                            pens.append(_round_half_away(1000000 * d))
                        pen = max(pens)
                    sc = 7 * rel[c] - 3 * pen
                    if best is None or (-sc, c) < best[0]:
                        best = ((-sc, c), sc)
                sel.append((best[0][1], best[1]))
            want += [
                (qid, k + 1, vid, sc) for k, (vid, sc) in enumerate(sel)
            ]
        assert got == sorted(want), (trial, got[:5], sorted(want)[:5])


def test_kcore_matches_bruteforce_peel(spark, tmp_path):
    """Three Spark peel rounds == a Python degree-peel on random bipartite
    graphs whose degrees straddle k (so every round actually removes
    something on at least one side)."""
    from cassandra_syncer_spark.queries.analytics_r7k import _KCORE_K, graph_kcore

    rng = random.Random(23)
    for trial in range(2):
        n_s, n_p = 50, 55
        edges = set()
        for s in range(n_s):
            for p in rng.sample(range(n_p), rng.randint(_KCORE_K - 8, _KCORE_K + 12)):
                edges.add((s, p))
        sf = _stage(
            spark,
            tmp_path,
            f"kc{trial}",
            # duplicates must collapse via distinct
            [(s, p) for s, p in edges] + [(s, p) for s, p in list(edges)[:10]],
            "l_suppkey long, l_partkey long",
            "lineitem",
        )
        got = [
            (r.round, r.n_suppliers, r.n_parts, r.n_edges)
            for r in graph_kcore(spark, sf).collect()
        ]
        e = set(edges)
        want = []
        for r in range(1, 4):
            ds = collections.Counter(s for s, _ in e)
            dp = collections.Counter(p for _, p in e)
            keep_s = {s for s, c in ds.items() if c >= _KCORE_K}
            keep_p = {p for p, c in dp.items() if c >= _KCORE_K}
            e = {(s, p) for s, p in e if s in keep_s and p in keep_p}
            want.append(
                (r, len({s for s, _ in e}), len({p for _, p in e}), len(e))
            )
        assert got == want, (trial, got, want)
        # peel is monotone: counts never grow round over round
        for a, b in zip(got, got[1:]):
            assert b[1] <= a[1] and b[2] <= a[2] and b[3] <= a[3]


def test_chi_square_cells_match_python(spark, tmp_path):
    """Cell table == Python contingency math (exact integer marginals,
    the one rounded float step replayed bit-identically)."""
    from cassandra_syncer_spark.queries.analytics_r7k import agg_chi_square

    rng = random.Random(41)
    langs, srcs = ["en", "de", "fr", "zz"], ["a", "b", "c"]
    rows = [
        (i, rng.choice(langs), rng.choices(srcs, weights=[5, 3, 1])[0])
        for i in range(400)
    ]
    sf = _stage(
        spark, tmp_path, "chi", rows, "doc_id long, lang string, source string",
        "documents",
    )
    got = {
        (r.lang, r.source): (
            r.n_obs,
            r.expected_milli,
            r.lift_micro,
            r.chi2_cell_micro,
        )
        for r in agg_chi_square(spark, sf).collect()
    }
    cells = collections.Counter((l, s) for _, l, s in rows)
    nl = collections.Counter(l for _, l, _ in rows)
    ns = collections.Counter(s for _, _, s in rows)
    n = len(rows)
    assert set(got) == set(cells)
    for (l, s), n_obs in cells.items():
        d = n * n_obs - nl[l] * ns[s]
        want = (
            n_obs,
            (1000 * nl[l] * ns[s]) // n,
            (1000000 * n_obs * n) // (nl[l] * ns[s]),
            _round_half_away(1000000.0 * d * d / (n * nl[l] * ns[s])),
        )
        assert got[(l, s)] == want, ((l, s), got[(l, s)], want)
    # chi2 additivity sanity: statistic is the cell sum, and a perfectly
    # independent table would put every lift at ~1e6
    assert sum(v[3] for v in got.values()) >= 0


def test_freq_spectrum_matches_python(spark, tmp_path):
    """Decade histogram == Python Counter over the same whitespace
    tokenization, including multi-space runs (empty tokens dropped)."""
    from cassandra_syncer_spark.queries.analytics_r7k import corpus_freq_spectrum

    rng = random.Random(59)
    vocab = [f"w{i}" for i in range(80)]
    docs = []
    for i in range(120):
        words = rng.choices(vocab, k=rng.randint(1, 40))
        sep = "  " if i % 7 == 0 else " "  # double-space runs → empty tokens
        docs.append((i, sep.join(words)))
    sf = _stage(spark, tmp_path, "spec", docs, "doc_id long, text string", "documents")
    got = {
        r.decade: (r.n_types, r.n_occurrences, r.occ_share_micro)
        for r in corpus_freq_spectrum(spark, sf).collect()
    }
    freq = collections.Counter(
        w for _, t in docs for w in t.split(" ") if len(w) > 0
    )
    spec = collections.Counter()
    occ = collections.Counter()
    for w, f in freq.items():
        d = len(str(f))
        spec[d] += 1
        occ[d] += f
    total = sum(occ.values())
    want = {
        d: (spec[d], occ[d], (1000000 * occ[d]) // total) for d in spec
    }
    assert got == want


def test_hourly_profile_matches_python(spark, tmp_path):
    """(isodow, hour) cells == Python mirror of the modular epoch math,
    cross-checked against datetime.isoweekday() so the +3 offset is
    provably the ISO convention and not just self-consistent."""
    from cassandra_syncer_spark.queries.analytics_r7k import events_hourly_profile

    rng = random.Random(83)
    rows = []
    for i in range(300):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=rng.randint(0, 40 * 86400)
        )
        rows.append((i, ts, rng.randint(0, 20), "click", round(rng.uniform(-5, 5), 3)))
    sf = _stage(
        spark,
        tmp_path,
        "hp",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    got = {
        (r.isodow, r.hour_utc): (r.n_events, r.n_users, r.value_micro)
        for r in events_hourly_profile(spark, sf).collect()
    }
    cells = collections.defaultdict(lambda: [0, set(), 0])
    for i, ts, uid, _, val in rows:
        sec = int(ts.timestamp())
        dow = ((sec // 86400 + 3) % 7) + 1
        assert dow == ts.isoweekday()  # modular math IS the ISO weekday
        cell = (dow, (sec // 3600) % 24)
        cells[cell][0] += 1
        cells[cell][1].add(uid)
        cells[cell][2] += _round_half_away(1000000 * val)
    want = {c: (v[0], len(v[1]), v[2]) for c, v in cells.items()}
    assert got == want


def test_anova_matches_python_and_float_reference(spark, tmp_path):
    """Integer-micro ANOVA == Python mirror of the exact formulas, AND
    the resulting F agrees with the textbook float computation to 1e-6
    relative — the quantization is measurement, not a different test."""
    from cassandra_syncer_spark.queries.analytics_r7l import agg_anova_f

    rng = random.Random(101)
    rows = []
    i = 0
    for src, mu in [("a", 200), ("b", 260), ("c", 240)]:
        for _ in range(rng.randint(40, 80)):
            rows.append((i, src, max(1, int(rng.gauss(mu, 40)))))
            i += 1
    sf = _stage(
        spark, tmp_path, "anova", rows,
        "doc_id long, source string, n_chars long", "documents",
    )
    got = agg_anova_f(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    groups = collections.defaultdict(list)
    for _, s, x in rows:
        groups[s].append(x)
    k, n = len(groups), len(rows)
    s_all = sum(x for _, _, x in rows)
    a_micro = sum((1000000 * sum(g) ** 2) // len(g) for g in groups.values())
    q_micro = 1000000 * sum(x * x for _, _, x in rows)
    ssb = a_micro - (1000000 * s_all * s_all) // n
    ssw = q_micro - a_micro
    assert (r.k_groups, r.n_total, r.ssb_micro, r.ssw_micro) == (k, n, ssb, ssw)
    assert r.f_micro == _round_half_away(1000000.0 * ssb * (n - k) / (ssw * (k - 1)))
    # float reference (textbook formulation, no quantization)
    grand = s_all / n
    ssb_f = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw_f = sum(
        (x - sum(g) / len(g)) ** 2 for g in groups.values() for x in g
    )
    f_ref = (ssb_f / (k - 1)) / (ssw_f / (n - k))
    assert abs(r.f_micro / 1e6 - f_ref) / f_ref < 1e-5


def test_benford_separates_logspace_from_uniform(spark, tmp_path):
    """Law + mirror: a log-space-uniform price sample (Benford's
    generative regime) must score a dramatically smaller chi-square than
    a uniform[1000,2000) sample (all first digits = 1); cells mirror the
    Python math exactly."""
    from cassandra_syncer_spark.queries.analytics_r7l import (
        _BENFORD_MICRO,
        agg_benford_digits,
    )

    rng = random.Random(131)
    benfordish = [(i, 10.0 ** rng.uniform(0, 4)) for i in range(3000)]
    uniform = [(i, rng.uniform(1000.0, 2000.0)) for i in range(3000)]
    chi2 = {}
    for tag, rows in [("benford", benfordish), ("uniform", uniform)]:
        sf = _stage(
            spark, tmp_path, f"bf_{tag}", rows,
            "o_orderkey long, o_totalprice double", "orders",
        )
        got = agg_benford_digits(spark, sf).collect()
        assert [r.digit for r in got] == list(range(1, 10))  # schema-stable
        n_total = sum(r.n_obs for r in got)
        assert n_total == 3000
        for r in got:
            e_milli = (n_total * _BENFORD_MICRO[r.digit - 1]) // 1000
            d_milli = 1000 * r.n_obs - e_milli
            assert r.obs_share_micro == (1000000 * r.n_obs) // n_total
            assert r.chi2_cell_micro == _round_half_away(
                1000000.0 * d_milli * d_milli / (1000.0 * e_milli)
            )
        chi2[tag] = sum(r.chi2_cell_micro for r in got)
    assert chi2["uniform"] > 50 * chi2["benford"], chi2


def test_histogram_partitions_range_and_counts(spark, tmp_path):
    """Equi-width histogram laws on random data: bins tile [lo, hi]
    exactly (no gaps/overlaps), counts sum to N, every value falls in
    its bin's [lo_micro, hi_micro) span, and the whole thing matches a
    Python mirror of the integer binning."""
    from cassandra_syncer_spark.queries.analytics_r7l import (
        _HIST_BINS,
        agg_histogram_equiwidth,
    )

    rng = random.Random(151)
    rows = [
        (i, datetime.datetime(2024, 1, 1), 1, "e", round(rng.gauss(0, 2.5), 4))
        for i in range(800)
    ]
    sf = _stage(
        spark, tmp_path, "hist", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    got = agg_histogram_equiwidth(spark, sf).collect()
    vm = [_round_half_away(1000000 * v) for *_, v in rows]
    lo, hi = min(vm), max(vm)
    span = hi - lo + 1
    mirror = collections.Counter(
        min((_HIST_BINS * (x - lo)) // span, _HIST_BINS - 1) for x in vm
    )
    assert {r.bin: r.n_rows for r in got} == dict(mirror)
    assert sum(r.n_rows for r in got) == len(rows)
    for r in got:
        assert r.lo_micro == lo + (r.bin * span) // _HIST_BINS
        assert r.hi_micro == lo + ((r.bin + 1) * span) // _HIST_BINS
    edges = sorted((r.lo_micro, r.hi_micro) for r in got)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(edges, edges[1:]):
        # adjacent present bins tile without overlap (gaps only where a
        # bin is empty, and then the edge arithmetic still lines up)
        assert a_hi <= b_lo


def test_bfs_matches_bruteforce_frontiers(spark, tmp_path):
    """Per-hop new-node counts == Python BFS with visited-set dedup on
    random sparse bipartite graphs (sparse so hops don't saturate in
    one step and the anti-join dedup actually matters)."""
    from cassandra_syncer_spark.queries.analytics_r7l import (
        _BFS_SEEDS,
        graph_bfs_hops,
    )

    rng = random.Random(173)
    for trial in range(2):
        edges = set()
        for s in range(40):
            for p in rng.sample(range(120), rng.randint(2, 5)):
                edges.add((s, p))
        sf = _stage(
            spark, tmp_path, f"bfs{trial}",
            [(s, p) for s, p in edges],
            "l_suppkey long, l_partkey long", "lineitem",
        )
        got = [(r.hop, r.side, r.n_new) for r in graph_bfs_hops(spark, sf).collect()]
        seen_s = {s for s, _ in edges if s < _BFS_SEEDS}
        p1 = {p for s, p in edges if s in seen_s}
        s2 = {s for s, p in edges if p in p1} - seen_s
        p3 = {p for s, p in edges if s in s2} - p1
        want = [(1, "part", len(p1)), (2, "supplier", len(s2)), (3, "part", len(p3))]
        assert got == want, (trial, got, want)


def test_langid_confusion_matches_python_mirror(spark, tmp_path):
    """Confusion cells == Python mirror of the marker-word classifier;
    recall shares per true lang sum to ≤1e6 with integer truncation."""
    from cassandra_syncer_spark.queries.analytics_r7l import text_langid_confusion

    markers = {
        "en": {"the", "a", "of", "and", "is"},
        "fr": {"le", "la", "de", "et", "un"},
        "es": {"el", "la", "de", "y", "un"},
        "de": {"der", "die", "das", "und", "ein"},
    }
    rng = random.Random(191)
    pool = sorted(set().union(*markers.values())) + ["xxx", "yyy", "zzz"]
    rows = []
    for i in range(300):
        true = rng.choice(["en", "fr", "es", "de", "nl"])
        rows.append((i, " ".join(rng.choices(pool, k=rng.randint(0, 12))), true))
    sf = _stage(
        spark, tmp_path, "conf", rows, "doc_id long, text string, lang string",
        "documents",
    )
    got = {
        (r.lang, r.pred_lang): (r.n_docs, r.recall_micro, r.precision_micro)
        for r in text_langid_confusion(spark, sf).collect()
    }

    def classify(text):
        ws = text.lower().split(" ")
        s = {k: sum(1 for w in ws if w in m) for k, m in markers.items()}
        if s["en"] >= s["fr"] and s["en"] >= s["es"] and s["en"] >= s["de"] and s["en"] > 0:
            return "en"
        if s["fr"] >= s["es"] and s["fr"] >= s["de"] and s["fr"] > 0:
            return "fr"
        if s["es"] >= s["de"] and s["es"] > 0:
            return "es"
        if s["de"] > 0:
            return "de"
        return "unknown"

    cells = collections.Counter((lang, classify(t)) for _, t, lang in rows)
    nl = collections.Counter(lang for _, _, lang in rows)
    np_ = collections.Counter(classify(t) for _, t, _ in rows)
    assert set(got) == set(cells)
    for (l, pr), n in cells.items():
        assert got[(l, pr)] == (
            n, (1000000 * n) // nl[l], (1000000 * n) // np_[pr]
        )
    for l in nl:
        tot = sum(v[1] for (tl, _), v in got.items() if tl == l)
        assert 1000000 - len(markers) - 1 <= tot <= 1000000


def test_bpe_pair_step_matches_python(spark, tmp_path):
    """Top-merge ranking == Python mirror: pair counts weighted by word
    frequency off the collapsed vocabulary, ties by (sym_a, sym_b)."""
    from cassandra_syncer_spark.queries.analytics_r7m import (
        _BPE_TOP,
        tokenizer_bpe_pair_step,
    )

    rng = random.Random(211)
    vocab = ["".join(rng.choices("abcdef", k=rng.randint(1, 7))) for _ in range(60)]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 30)))) for i in range(150)
    ]
    sf = _stage(spark, tmp_path, "bpe", docs, "doc_id long, text string", "documents")
    got = [
        (r.rank, r.sym_a, r.sym_b, r.pair_count)
        for r in tokenizer_bpe_pair_step(spark, sf).collect()
    ]
    wf = collections.Counter(
        w for _, t in docs for w in t.lower().split(" ") if len(w) >= 2
    )
    pc = collections.Counter()
    for w, f in wf.items():
        for i in range(len(w) - 1):
            pc[(w[i], w[i + 1])] += f
    ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_TOP]
    want = [(k + 1, a, b, c) for k, ((a, b), c) in enumerate(ranked)]
    assert got == want


def test_hhi_extremes_and_mirror(spark, tmp_path):
    """HHI laws: a single-whale type scores exactly 1e6; k perfectly
    uniform users score exactly 1e6·(k·c²)/(kc)² = 1e6/k; random data
    matches the Python mirror."""
    from cassandra_syncer_spark.queries.analytics_r7m import agg_hhi_concentration

    rng = random.Random(223)
    rows, eid = [], 0
    # whale: one user owns all 40 'solo' events
    for _ in range(40):
        rows.append((eid, datetime.datetime(2024, 1, 1), 7, "solo", 1.0)); eid += 1
    # uniform: 8 users x 5 events each
    for u in range(8):
        for _ in range(5):
            rows.append((eid, datetime.datetime(2024, 1, 1), u, "uniform", 1.0)); eid += 1
    # random type
    for _ in range(200):
        rows.append(
            (eid, datetime.datetime(2024, 1, 1), rng.randint(0, 12), "rand", 1.0)
        ); eid += 1
    sf = _stage(
        spark, tmp_path, "hhi", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    got = {
        r.event_type: (r.n_events, r.n_users, r.hhi_micro, r.effective_n_milli)
        for r in agg_hhi_concentration(spark, sf).collect()
    }
    assert got["solo"] == (40, 1, 1000000, 1000)
    assert got["uniform"] == (40, 8, 1000000 // 8, 8000)
    cnt = collections.Counter(
        (et, u) for _, _, u, et, _ in rows if et == "rand"
    )
    n = sum(cnt.values())
    s2 = sum(c * c for c in cnt.values())
    assert got["rand"] == (
        n, len(cnt), (1000000 * s2) // (n * n), (1000 * n * n) // s2
    )


def test_rolling_corr_perfect_and_mirror(spark, tmp_path):
    """A strictly linear ramp gives corr exactly 1.0 in every full
    window; random data matches a Python mirror of the exact-integer
    window sums to ≤1e-6 (the rounding quantum)."""
    from cassandra_syncer_spark.queries.analytics_r7m import (
        _CORR_WIN,
        win_rolling_corr,
    )

    rng = random.Random(241)
    rows, eid = [], 0
    # user 0: perfect ramp value = t  → x and lag(x) perfectly correlated
    for t in range(30):
        rows.append((eid, datetime.datetime(2024, 1, 1, 0, 0, t), 0, "e", float(t))); eid += 1
    # user 1: random walk
    v = 0.0
    for t in range(60):
        v += rng.uniform(-1, 1)
        rows.append((eid, datetime.datetime(2024, 1, 1, 0, 0, t), 1, "e", round(v, 2))); eid += 1
    sf = _stage(
        spark, tmp_path, "rc", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    got = [
        (r.user_id, r.event_id, r.n_win, r.corr_r6)
        for r in win_rolling_corr(spark, sf).collect()
    ]
    ramp = [g for g in got if g[0] == 0 and g[2] >= 3]
    assert ramp and all(abs(g[3] - 1.0) < 1e-9 for g in ramp)
    # mirror user 1
    series = sorted(
        (int(ts.timestamp()), e, _round_half_away(100 * v))
        for e, ts, u, _, v in rows if u == 1
    )
    xs = [x for _, _, x in series]
    want = {}
    for i in range(1, len(xs)):
        window = [(xs[j], xs[j - 1]) for j in range(max(1, i - _CORR_WIN + 1), i + 1)]
        n = len(window)
        sx = sum(a for a, _ in window); sy = sum(b for _, b in window)
        sxy = sum(a * b for a, b in window)
        sxx = sum(a * a for a, _ in window); syy = sum(b * b for _, b in window)
        den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        want[series[i][1]] = None if den == 0 else (n * sxy - sx * sy) / den
    for u, e, nw, c in got:
        if u != 1:
            continue
        w = want[e]
        if w is None:
            assert c is None
        else:
            assert c is not None and abs(c - w) <= 1.0001e-6, (e, c, w)


def test_dyn_overwrite_preserves_untouched_partitions(spark, tmp_path):
    """Partition-scoped overwrite law on staged data: row counts per
    flag are unchanged (no append-doubling), non-'R' sums are the
    original, 'R' sums are exactly doubled."""
    from cassandra_syncer_spark.queries.analytics_r7m import (
        sink_dynamic_partition_overwrite,
    )

    rng = random.Random(263)
    rows = [
        (i, rng.choice(["A", "N", "R"]), rng.choice(["O", "F"]),
         round(rng.uniform(1, 50), 2))
        for i in range(300)
    ]
    sf = _stage(
        spark, tmp_path, "dyn", rows,
        "l_orderkey long, l_returnflag string, l_linestatus string, l_quantity double",
        "lineitem",
    )
    got = {r.l_returnflag: (r.n, r.qty_centi)
           for r in sink_dynamic_partition_overwrite(spark, sf).collect()}
    mirror = collections.defaultdict(lambda: [0, 0])
    for _, flag, _, q in rows:
        mirror[flag][0] += 1
        c = _round_half_away(q * 100.0)
        mirror[flag][1] += 2 * c if flag == "R" else c
    assert got == {k: tuple(v) for k, v in mirror.items()}


def test_degree_hist_consistent_with_pairs_query(spark, sf_dir):
    """Consistency law on the real fixture: the histogram must equal the
    degree distribution derived from the REGISTERED pair generator
    (text_minhash_dedup) plus a zero-degree row covering the rest of the
    corpus — proving the shared band kernel really is shared."""
    from cassandra_syncer_spark.queries.analytics_r7m import (
        dedup_candidate_degree_hist,
    )
    from cassandra_syncer_spark.queries.llm_dedup import text_minhash_dedup
    from cassandra_syncer_spark.queries.relational import T

    got = {r.degree: r.n_docs for r in dedup_candidate_degree_hist(spark, sf_dir).collect()}
    pairs = [(r.doc_a, r.doc_b) for r in text_minhash_dedup(spark, sf_dir).collect()]
    deg = collections.Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    hist = collections.Counter(deg.values())
    total = T(spark, sf_dir, "documents").count()
    want = dict(hist)
    zero = total - len(deg)
    if zero > 0:
        want[0] = zero
    assert got == want
    assert sum(got.values()) == total


def test_welch_matches_float_reference(spark, tmp_path):
    """Integer-sum Welch t == the textbook float computation replayed in
    Python with the same md5 arm assignment, to within the 1e-6 rounding
    quantum; planted mean shift must surface as |t| > 3."""
    import hashlib

    from cassandra_syncer_spark.queries.analytics_r7n import events_welch_ttest

    rng = random.Random(307)
    rows, eid = [], 0
    arm_of = lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
    for u in range(120):
        # plant a strong effect: arm-1 users spend ~60% more, many events
        # per user so the per-user-total variance doesn't drown it
        base = 10.0 if arm_of(u) == 0 else 16.0
        for _ in range(rng.randint(8, 12)):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1), u, "e",
                 round(rng.uniform(0.5, 1.5) * base, 2))
            ); eid += 1
    sf = _stage(
        spark, tmp_path, "welch", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    got = events_welch_ttest(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    totals = collections.defaultdict(int)
    for _, _, u, _, v in rows:
        totals[u] += _round_half_away(100 * v)
    a = [t for u, t in totals.items() if arm_of(u) == 0]
    b = [t for u, t in totals.items() if arm_of(u) == 1]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t_ref = (mb - ma) / math.sqrt(va / len(a) + vb / len(b))
    assert abs(r.t_welch_r6 - t_ref) <= 1.001e-6, (r.t_welch_r6, t_ref)
    assert abs(r.t_welch_r6) > 3  # the planted 20% effect is detectable
    assert abs(r.mean_a_r6 - ma / 100) <= 1.001e-6
    assert abs(r.mean_b_r6 - mb / 100) <= 1.001e-6


def test_max_records_file_count_law(spark, tmp_path):
    """File count == Σ_shard ceil(n_shard/cap) across boundary sizes:
    below the cap, an exact multiple, and one-over — proving the cap is
    enforced per directory even though shards share write tasks."""
    import collections as _c

    from cassandra_syncer_spark.queries.analytics_r7n import (
        _EXPORT_SHARDS,
        _MAX_PER_FILE,
        sink_max_records_per_file,
    )

    for n in [
        _MAX_PER_FILE - 1,
        2 * _EXPORT_SHARDS * _MAX_PER_FILE,
        2 * _EXPORT_SHARDS * _MAX_PER_FILE + 1,
    ]:
        rows = [(i, float(i)) for i in range(n)]
        sf = _stage(
            spark, tmp_path, f"cap{n}", rows,
            "o_orderkey long, o_totalprice double", "orders",
        )
        r = sink_max_records_per_file(spark, sf).collect()[0]
        assert (r.n_rows, r.n_keys) == (n, n)
        per_shard = _c.Counter(i % _EXPORT_SHARDS for i in range(n))
        want = sum(-(-c // _MAX_PER_FILE) for c in per_shard.values())
        assert r.n_files == want, (n, r.n_files, want)


def test_assortativity_mirror_and_degenerate(spark, tmp_path):
    """Random bipartite graphs match the Python Pearson mirror within
    the rounding quantum; a degree-regular graph (zero variance) yields
    NULL correlation rather than a crash or fake zero."""
    from cassandra_syncer_spark.queries.analytics_r7n import (
        graph_degree_assortativity,
    )

    rng = random.Random(331)
    edges = set()
    for s in range(30):
        for p in rng.sample(range(80), rng.randint(1, 12)):
            edges.add((s, p))
    sf = _stage(
        spark, tmp_path, "asst", [(s, p) for s, p in edges],
        "l_suppkey long, l_partkey long", "lineitem",
    )
    r = graph_degree_assortativity(spark, sf).collect()[0]
    ds = collections.Counter(s for s, _ in edges)
    dp = collections.Counter(p for _, p in edges)
    xs = [(ds[s], dp[p]) for s, p in edges]
    n = len(xs)
    sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs); syy = sum(y * y for _, y in xs)
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    ref = (n * sxy - sx * sy) / den
    assert r.n_edges == n
    assert abs(r.assortativity_r6 - ref) <= 1.001e-6
    # degree-regular: perfect matching, every degree = 1 → zero variance
    sf2 = _stage(
        spark, tmp_path, "asst_reg", [(i, i) for i in range(20)],
        "l_suppkey long, l_partkey long", "lineitem",
    )
    r2 = graph_degree_assortativity(spark, sf2).collect()[0]
    assert r2.n_edges == 20 and r2.assortativity_r6 is None


def test_stream_enrich_equals_batch_join(spark, tmp_path):
    """The drained stream-static enrichment == the same join+agg run as
    a plain batch query on the staged tables (no event lost, none
    duplicated, dim-less users dropped by the inner join)."""
    from cassandra_syncer_spark.queries.analytics_r7n import stream_static_enrich

    rng = random.Random(353)
    events = [
        (i, datetime.datetime(2024, 1, 1), rng.randint(0, 30), "e",
         round(rng.uniform(-3, 3), 3))
        for i in range(400)
    ]
    customers = [(c, f"cust{c}", c % 7) for c in range(25)]  # users 25-30 dimless
    out = str(tmp_path / "enr")
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    spark.createDataFrame(
        customers, "c_custkey long, c_name string, c_nationkey long"
    ).write.mode("overwrite").parquet(f"{out}/customer.parquet")
    got = {
        r.nationkey: (r.n_events, r.value_micro)
        for r in stream_static_enrich(spark, out).collect()
    }
    mirror = collections.defaultdict(lambda: [0, 0])
    for _, _, u, _, v in events:
        if u < 25:
            mirror[u % 7][0] += 1
            mirror[u % 7][1] += _round_half_away(1000000 * v)
    assert got == {k: tuple(v) for k, v in mirror.items()}


def test_mannwhitney_matches_rank_mirror(spark, tmp_path):
    """U and z == a Python midrank mirror; a planted stochastic shift
    drives |z| large while identical arm distributions keep it small."""
    import hashlib

    from cassandra_syncer_spark.queries.analytics_r7o import agg_mannwhitney_u

    arm_of = lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
    rng = random.Random(401)

    def build(shift):
        rows, eid = [], 0
        for u in range(80):
            for _ in range(6):
                base = rng.choice([1.0, 2.0, 3.0, 4.0])
                if arm_of(u) == 1:
                    base += shift
                rows.append((eid, datetime.datetime(2024, 1, 1), u, "e", base)); eid += 1
        return rows

    for shift, big in [(0.0, False), (1.5, True)]:
        rows = build(shift)
        sf = _stage(
            spark, tmp_path, f"mwu{shift}", rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double",
            "events",
        )
        r = agg_mannwhitney_u(spark, sf).collect()[0]
        vals = [
            (_round_half_away(100 * v), arm_of(u)) for _, _, u, _, v in rows
        ]
        # python midrank mirror
        from collections import Counter

        cnt = Counter(v for v, _ in vals)
        order = sorted(cnt)
        cum, mid2 = 0, {}
        for v in order:
            mid2[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        nb = sum(1 for _, a in vals if a == 1)
        na = len(vals) - nb
        rb2 = sum(mid2[v] for v, a in vals if a == 1)
        u2 = rb2 - nb * (nb + 1)
        assert (r.n_a, r.n_b, r.u_b_2x) == (na, nb, u2)
        n = na + nb
        tt = sum(t * t * t - t for t in cnt.values())
        var = na * nb / 12.0 * ((n + 1.0) - tt / (n * (n - 1.0)))
        z_ref = (u2 / 2.0 - na * nb / 2.0) / math.sqrt(var)
        assert abs(r.z_r6 - z_ref) <= 1.001e-6
        assert (abs(r.z_r6) > 5) == big, (shift, r.z_r6)


def test_sampled_duprate_covers_planted_rate(spark, tmp_path):
    """Planted-duplicate corpus: the in-sample estimate matches the
    Python replay exactly, and the Wilson interval brackets the point
    estimate with lo <= p <= hi strictly widening for small samples."""
    import hashlib

    from cassandra_syncer_spark.queries.analytics_r7o import (
        _SAMPLE_MOD,
        dedup_rate_sampled_estimate,
    )

    rng = random.Random(421)
    docs = []
    for i in range(4000):
        if rng.random() < 0.3:  # ~30% dup mass: copies of 20 templates
            docs.append((i, f"template {i % 20} body text"))
        else:
            docs.append((i, f"unique doc {i} payload {rng.random()}"))
    sf = _stage(spark, tmp_path, "dr", docs, "doc_id long, text string", "documents")
    r = dedup_rate_sampled_estimate(spark, sf).collect()[0]
    in_sample = [
        t for i, t in docs
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _SAMPLE_MOD == 0
    ]
    n = len(in_sample)
    k = n - len(set(in_sample))
    assert (r.n_sampled, r.n_dups) == (n, k)
    assert r.dup_rate_micro == (1000000 * k) // n
    assert r.wilson_lo_r6 <= k / n <= r.wilson_hi_r6
    assert 0.0 <= r.wilson_lo_r6 < r.wilson_hi_r6 <= 1.0


def test_nested_roundtrip_matches_flat_mirror(spark, tmp_path):
    """Nested rollup aggregates == flat-table mirror on random line
    items with variable fan-out (1..9 items per order)."""
    from cassandra_syncer_spark.queries.analytics_r7o import (
        sink_nested_struct_roundtrip,
    )

    rng = random.Random(443)
    rows = []
    for o in range(120):
        for ln in range(1, rng.randint(2, 10)):
            rows.append((o, ln, round(rng.uniform(1, 50), 2)))
    sf = _stage(
        spark, tmp_path, "nst", rows,
        "l_orderkey long, l_linenumber int, l_quantity double", "lineitem",
    )
    r = sink_nested_struct_roundtrip(spark, sf).collect()[0]
    per = collections.Counter(o for o, _, _ in rows)
    assert r.n_orders == len(per)
    assert r.n_items == len(rows)
    assert r.max_items == max(per.values())
    assert r.qty_centi == sum(_round_half_away(q * 100.0) for _, _, q in rows)


def test_jackknife_matches_loo_mirror(spark, tmp_path):
    """Leave-one-out means == recomputing the mean WITHOUT each group in
    Python; influences roughly sum toward zero (exact under no
    truncation; bounded by per-group milli truncation here)."""
    from cassandra_syncer_spark.queries.analytics_r7p import agg_jackknife_groups

    rng = random.Random(467)
    rows, i = [], 0
    for src, mu in [("a", 100), ("b", 500), ("c", 300), ("d", 250)]:
        for _ in range(rng.randint(20, 60)):
            rows.append((i, src, max(1, int(rng.gauss(mu, 30))))); i += 1
    sf = _stage(
        spark, tmp_path, "jk", rows,
        "doc_id long, source string, n_chars long", "documents",
    )
    got = {
        r.source: (r.n_docs, r.mean_milli, r.loo_mean_milli, r.influence_milli)
        for r in agg_jackknife_groups(spark, sf).collect()
    }
    groups = collections.defaultdict(list)
    for _, s, x in rows:
        groups[s].append(x)
    N = len(rows)
    S = sum(x for _, _, x in rows)
    for src, xs in groups.items():
        loo = (1000 * (S - sum(xs))) // (N - len(xs))
        want = (
            len(xs),
            (1000 * sum(xs)) // len(xs),
            loo,
            (1000 * S) // N - loo,
        )
        assert got[src] == want, (src, got[src], want)
    # the heavy group must drag the mean the most
    assert max(got, key=lambda s: abs(got[s][3])) in ("b", "a")


def test_drift_centroids_shifted_halves(spark, tmp_path):
    """A planted mean shift between the halves yields a large L2 gap and
    a cosine well below the identical-halves case; values mirror the
    integer math exactly."""
    from cassandra_syncer_spark.queries.analytics_r7p import embed_drift_centroids

    rng = random.Random(487)
    dim = 8

    def build(shift):
        vecs = []
        for i in range(200):
            base = [rng.uniform(-0.1, 0.1) for _ in range(dim)]
            if i % 2 == 1:
                base = [b + shift for b in base]
            vecs.append((i, [round(b, 4) for b in base], 0))
        return vecs

    results = {}
    for shift in (0.0, 0.5):
        sf = _stage(
            spark, tmp_path, f"drift{shift}", build(shift),
            "vec_id long, embedding array<float>, label int", "embeddings",
        )
        r = embed_drift_centroids(spark, sf).collect()[0]
        assert r.n_a == 100 and r.n_b == 100
        results[shift] = r
    assert results[0.5].l2sq_micro2 > 100 * max(results[0.0].l2sq_micro2, 1)
    assert results[0.5].centroid_cos_r6 < 0.9  # shifted: centroids diverge


def test_peak_concurrency_matches_sweepline_mirror(spark, tmp_path):
    """Peak and first-peak minute == a Python sweep line over the same
    5-minute presence intervals, including an engineered burst."""
    from cassandra_syncer_spark.queries.analytics_r7p import (
        _SESSION_MIN,
        events_peak_concurrency,
    )

    rng = random.Random(509)
    rows, eid = [], 0
    base = datetime.datetime(2024, 3, 1)
    for _ in range(150):
        rows.append(
            (eid, base + datetime.timedelta(minutes=rng.randint(0, 600)),
             1, "bg", 1.0)
        ); eid += 1
    for k in range(12):  # burst: 12 events within 3 minutes
        rows.append(
            (eid, base + datetime.timedelta(minutes=300, seconds=k * 14),
             1, "bg", 1.0)
        ); eid += 1
    sf = _stage(
        spark, tmp_path, "pc", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    r = events_peak_concurrency(spark, sf).collect()
    assert len(r) == 1 and r[0].event_type == "bg"
    deltas = collections.Counter()
    for _, ts, _, _, _ in rows:
        m = int(ts.timestamp()) // 60
        deltas[m] += 1
        deltas[m + _SESSION_MIN] -= 1
    conc, peak, first = 0, -1, None
    for m in sorted(deltas):
        conc += deltas[m]
        if conc > peak:
            peak, first = conc, m
    assert (r[0].peak_concurrency, r[0].first_peak_minute) == (peak, first)
    assert peak >= 12  # the engineered burst dominates


def test_keep_best_prefers_longest_member(spark, sf_dir):
    """Consistency on the real fixture: every keeper is the longest
    member of its cluster (ties to the smaller doc_id), clusters match
    dedup_cluster_components, and dropped_chars is the non-keeper sum."""
    from cassandra_syncer_spark.queries.analytics_r7q import dedup_keep_best_quality
    from cassandra_syncer_spark.queries.llm_dedup import dedup_cluster_components
    from cassandra_syncer_spark.queries.relational import T

    labels = {
        r.doc_id: r.component
        for r in dedup_cluster_components(spark, sf_dir).collect()
    }
    chars = {
        r.doc_id: r.n_chars
        for r in T(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    clusters = collections.defaultdict(list)
    for d, c in labels.items():
        clusters[c].append(d)
    got = {
        r.component: (r.n_members, r.keeper_doc, r.keeper_chars, r.dropped_chars)
        for r in dedup_keep_best_quality(spark, sf_dir).collect()
    }
    want = {}
    for c, members in clusters.items():
        if len(members) < 2:
            continue
        keeper = sorted(members, key=lambda d: (-chars[d], d))[0]
        want[c] = (
            len(members),
            keeper,
            chars[keeper],
            sum(chars[d] for d in members if d != keeper),
        )
    assert got == want


def test_spearman_monotone_extremes_and_mirror(spark, tmp_path):
    """Spearman laws: a strictly increasing monotone (nonlinear) map
    gives exactly 1.0, a decreasing one −1.0, and random data matches a
    Python midrank mirror within the rounding quantum."""
    from cassandra_syncer_spark.queries.analytics_r7q import agg_spearman_corr

    rng = random.Random(541)

    def run(rows):
        sf = _stage(
            spark, tmp_path, f"sp{len(rows)}{rows[0][1]}", rows,
            "l_orderkey long, l_quantity double, l_extendedprice double",
            "lineitem",
        )
        return agg_spearman_corr(spark, sf).collect()[0]

    inc = [(i, float(i + 1), float((i + 1) ** 2)) for i in range(60)]
    dec = [(i, float(i + 2), 1000.0 / (i + 2)) for i in range(60)]
    assert run(inc).spearman_r6 == 1.0
    assert run(dec).spearman_r6 == -1.0
    rnd = [
        (i, rng.choice([1.0, 2.0, 5.0, 9.0]), round(rng.uniform(1, 50), 2))
        for i in range(300)
    ]
    r = run(rnd)
    q = [_round_half_away(100 * a) for _, a, _ in rnd]
    p = [_round_half_away(100 * b) for _, _, b in rnd]

    def mid2(vals):
        cnt = collections.Counter(vals)
        cum, m = 0, {}
        for v in sorted(cnt):
            m[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return [m[v] for v in vals]

    xs, ys = mid2(q), mid2(p)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs); syy = sum(b * b for b in ys)
    ref = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(r.spearman_r6 - ref) <= 1.001e-6


def test_vocab_jaccard_matches_set_mirror(spark, tmp_path):
    """Pairwise vocabulary Jaccard == Python set arithmetic, including
    a disjoint pair (jaccard 0 row absent — inner join semantics) and an
    identical pair (jaccard exactly 1e6)."""
    from cassandra_syncer_spark.queries.analytics_r7r import (
        text_jaccard_source_similarity,
    )

    docs = [
        (0, "alpha beta gamma", "s1"),
        (1, "alpha beta gamma", "s2"),     # s2 identical vocab to s1
        (2, "delta epsilon", "s3"),        # s3 overlaps nothing
        (3, "alpha zeta", "s4"),           # s4 partial overlap with s1/s2
    ]
    sf = _stage(
        spark, tmp_path, "vj", docs, "doc_id long, text string, source string",
        "documents",
    )
    got = {
        (r.src_a, r.src_b): (r.vocab_a, r.vocab_b, r.n_shared, r.jaccard_micro)
        for r in text_jaccard_source_similarity(spark, sf).collect()
    }
    vocab = collections.defaultdict(set)
    for _, t, s in docs:
        vocab[s].update(t.split())
    want = {}
    for a in sorted(vocab):
        for b in sorted(vocab):
            if a >= b:
                continue
            ni = len(vocab[a] & vocab[b])
            if ni == 0:
                continue
            want[(a, b)] = (
                len(vocab[a]), len(vocab[b]), ni,
                (1000000 * ni) // (len(vocab[a]) + len(vocab[b]) - ni),
            )
    assert got == want
    assert got[("s1", "s2")][3] == 1000000
    assert ("s1", "s3") not in got


def test_acf_detects_planted_period(spark, tmp_path):
    """A strict 3-minute periodic load pattern puts the ACF maximum at
    lag 3; values match a Python mirror of the per-lag Pearson."""
    from cassandra_syncer_spark.queries.analytics_r7r import (
        _ACF_LAGS,
        events_autocorr_lags,
    )

    base = datetime.datetime(2024, 5, 1)
    rows, eid = [], 0
    pattern = [9, 1, 1]  # burst every 3rd minute
    for m in range(240):
        for _ in range(pattern[m % 3]):
            rows.append((eid, base + datetime.timedelta(minutes=m), 1, "e", 1.0))
            eid += 1
    sf = _stage(
        spark, tmp_path, "acf", rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )
    got = {r.lag: (r.n_pairs, r.acf_r6) for r in events_autocorr_lags(spark, sf).collect()}
    counts = collections.Counter(
        int(ts.timestamp()) // 60 for _, ts, _, _, _ in rows
    )
    for lag in range(1, _ACF_LAGS + 1):
        pairs = [
            (counts[m], counts[m + lag]) for m in counts if m + lag in counts
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
        den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ref = (n * sxy - sx * sy) / den
        assert got[lag][0] == n
        assert abs(got[lag][1] - ref) <= 1.001e-6
    assert max(got, key=lambda l: got[l][1]) == 3  # the planted period


def test_mmr_short_pool_returns_short_list(spark, tmp_path):
    """A corpus smaller than the selection budget must yield the short
    greedy list (pool-exhaustion guard) — not an element_at crash; the
    short list still matches the Python greedy."""
    from cassandra_syncer_spark.queries.analytics_r7k import sim_mmr_rerank

    vecs = {0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0]}
    sf = _stage(
        spark, tmp_path, "mmr_short",
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int", "embeddings",
    )
    got = [
        (r.q_id, r.sel_rank, r.vec_id)
        for r in sim_mmr_rerank(spark, sf).collect()
    ]
    # 3 probes exist (vec_id < 5 limited by corpus), each has exactly 2
    # candidates → 2 selections per probe, 6 rows total
    assert len(got) == 6
    for qid in (0, 1, 2):
        sel = [g for g in got if g[0] == qid]
        assert [s[1] for s in sel] == [1, 2]
        assert len({s[2] for s in sel}) == 2 and qid not in {s[2] for s in sel}


def test_upsert_partitioned_matches_python_merge(spark, tmp_path):
    """Staged-table law: the partition-scoped upsert equals a Python
    dict merge (update keys overwrite, new keys insert, other partitions
    byte-identical), with no row duplication anywhere."""
    from cassandra_syncer_spark.queries.analytics_r7s import merge_upsert_partitioned

    rng = random.Random(571)
    rows = [
        (k, rng.choice(["O", "F", "P"]), round(rng.uniform(10, 500), 2))
        for k in range(200)
    ]
    sf = _stage(
        spark, tmp_path, "up", rows,
        "o_orderkey long, o_orderstatus string, o_totalprice double", "orders",
    )
    got = {r.o_orderstatus: (r.n, r.price_centi)
           for r in merge_upsert_partitioned(spark, sf).collect()}
    table = {}
    for k, s, p in rows:
        table[(k, s)] = _round_half_away(100 * p)
    o_keys = sorted(k for k, s in table if s == "O")
    for k, s in list(table):
        if s == "O" and k % 10 == 0:
            table[(k, s)] *= 2
    for k in o_keys[:3]:
        table[(k + 1000000000, "O")] = _round_half_away(
            100 * dict((kk, pp) for kk, ss, pp in rows)[k]
        )
    want = collections.defaultdict(lambda: [0, 0])
    for (k, s), c in table.items():
        want[s][0] += 1
        want[s][1] += c
    assert got == {s: tuple(v) for s, v in want.items()}


def test_kendall_tau_matches_bruteforce_pairs(spark, tmp_path):
    """Grid-based tau-b == the O(n²) brute-force pair count on small
    random data (ties included), and a strictly monotone map gives
    exactly 1.0."""
    from cassandra_syncer_spark.queries.analytics_r7s import agg_kendall_tau

    rng = random.Random(593)
    rows = [
        (i, float(rng.randint(1, 8)), rng.choice([0.0, 0.01, 0.02, 0.05]))
        for i in range(120)
    ]
    sf = _stage(
        spark, tmp_path, "kt", rows,
        "l_orderkey long, l_quantity double, l_discount double", "lineitem",
    )
    r = agg_kendall_tau(spark, sf).collect()[0]
    xs = [(_round_half_away(100 * q), _round_half_away(10000 * d)) for _, q, d in rows]
    cc = dd = 0
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            dx = xs[i][0] - xs[j][0]
            dy = xs[i][1] - xs[j][1]
            if dx * dy > 0:
                cc += 1
            elif dx * dy < 0:
                dd += 1
    assert (r.n_rows, r.n_concordant, r.n_discordant) == (n, cc, dd)
    from collections import Counter

    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in xs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in xs).values())
    ref = (cc - dd) / math.sqrt((n0 - n1) * (n0 - n2))
    assert abs(r.tau_b_r6 - ref) <= 1.001e-6
    # strictly monotone → exactly 1.0
    mono = [(i, float(i + 1), 0.0001 * (i + 1)) for i in range(40)]
    sf2 = _stage(
        spark, tmp_path, "kt_mono", mono,
        "l_orderkey long, l_quantity double, l_discount double", "lineitem",
    )
    assert agg_kendall_tau(spark, sf2).collect()[0].tau_b_r6 == 1.0
