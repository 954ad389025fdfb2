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
