"""Property tests for the round-7 batch 5-7 operators — each law checked
against an independent brute-force computation on randomized inputs, so
correctness doesn't rest only on the fixture-shaped oracle."""

from __future__ import annotations

import datetime
import hashlib
import random

from pyspark.sql import functions as F


def _stage(spark, tmp_path, name, rows, schema, table):
    out = str(tmp_path / name)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{out}/{table}.parquet"
    )
    return out


def test_skyline_matches_bruteforce_random_points(spark, tmp_path):
    """Bucket-pruned skyline == brute-force dominance filter, including
    duplicate points and frontier ties."""
    from cassandra_syncer_spark.queries.analytics_r7g import select_pareto_skyline

    rng = random.Random(11)
    for trial in range(3):
        n = rng.randint(20, 120)
        pts = []
        for k in range(n):
            price = rng.choice([10.0, 999.99, 2500.5, 4001.25, rng.uniform(1, 5000)])
            day = rng.randint(0, 400)
            pts.append(
                (
                    k,
                    round(price, 2),
                    datetime.datetime(2020, 1, 1) + datetime.timedelta(days=day),
                )
            )
        # inject exact duplicates (both must survive if on the frontier)
        pts.append((n, pts[0][1], pts[0][2]))
        sf = _stage(
            spark,
            tmp_path,
            f"sky{trial}",
            pts,
            "o_orderkey long, o_totalprice double, o_orderdate timestamp",
            "orders",
        )
        got = {
            (r.o_orderkey, r.price_centi, r.order_date)
            for r in select_pareto_skyline(spark, sf).collect()
        }
        cent = [(k, round(p * 100), d.date()) for k, p, d in pts]
        want = {
            (k, pc, str(d))
            for k, pc, d in cent
            if not any(
                qpc >= pc and qd >= d and (qpc > pc or qd > d)
                for _, qpc, qd in cent
            )
        }
        assert got == want, (trial, got ^ want)


def test_lpa_wave_matches_bruteforce_random_graphs(spark):
    """One synchronous LPA round (vote by labeled neighbors, count desc /
    min-label tie-break, seeds immutable) == brute force."""
    from cassandra_syncer_spark.queries.analytics_r7e import _lpa_wave

    rng = random.Random(23)
    for trial in range(3):
        n = rng.randint(6, 25)
        edges = sorted(
            {
                (a, b)
                for a in range(n)
                for b in range(a + 1, n)
                if rng.random() < 0.25
            }
        )
        if not edges:
            continue
        labels = {v: f"L{v % 3}" for v in range(n) if rng.random() < 0.4}
        e = spark.createDataFrame(edges, "u long, v long")
        adj = e.select(F.col("u").alias("ctr"), F.col("v").alias("nbr")).unionAll(
            e.select(F.col("v").alias("ctr"), F.col("u").alias("nbr"))
        )
        lab = spark.createDataFrame(
            [(k, v) for k, v in labels.items()] or [(-1, "none")],
            "node long, label string",
        )
        got = {
            (r.node, r.label) for r in _lpa_wave(adj, lab).collect()
        }
        # brute force
        nbrs = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        want = set()
        for v in range(n):
            if v in labels:
                continue
            votes = {}
            for u in nbrs.get(v, ()):  # labeled neighbors only
                if u in labels:
                    votes[labels[u]] = votes.get(labels[u], 0) + 1
            if votes:
                best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                want.add((v, best))
        assert got == want, (trial, got ^ want)


def test_pca_power_rayleigh_quotient_improves(spark, tmp_path):
    """Power iteration's defining property: the Rayleigh quotient of the
    iterate is non-decreasing (allowing 1% slack for the integer
    quantization), and both iterates correlate with the true top
    eigenvector far better than a random direction would."""
    import numpy as np

    from cassandra_syncer_spark.queries.analytics_r7f import embed_pca_power

    rng = np.random.default_rng(5)
    # anisotropic cloud with a dominant direction
    base = rng.normal(size=(300, 64)) * 0.05
    direction = rng.normal(size=64)
    direction /= np.linalg.norm(direction)
    x = base + np.outer(rng.normal(size=300) * 0.5, direction)
    rows = [(int(i), [float(v) for v in x[i]], 0) for i in range(len(x))]
    sf = _stage(
        spark,
        tmp_path,
        "pca",
        rows,
        "vec_id long, embedding array<float>, label int",
        "embeddings",
    )
    out = embed_pca_power(spark, sf).collect()
    v1 = np.array([r.v_iter1 for r in sorted(out, key=lambda r: r.dim)], float)
    v2 = np.array([r.v_iter2 for r in sorted(out, key=lambda r: r.dim)], float)
    xc = np.round(x.astype(np.float32).astype(np.float64) * 1e6)  # micro ints
    gram = xc.T @ xc

    def rq(v):
        return (v @ gram @ v) / (v @ v)

    assert rq(v2) >= rq(v1) * 0.99, (rq(v1), rq(v2))
    true_top = np.linalg.eigh(gram)[1][:, -1]
    for v in (v1, v2):
        cos = abs(v @ true_top) / (np.linalg.norm(v) * np.linalg.norm(true_top))
        assert cos > 0.9, cos


def test_survival_and_cohort_match_bruteforce(spark, tmp_path):
    """events_survival_curve and events_cohort_matrix == brute force on a
    random event log (shared staging)."""
    from cassandra_syncer_spark.queries.analytics_r7e import events_cohort_matrix
    from cassandra_syncer_spark.queries.analytics_r7f import events_survival_curve

    rng = random.Random(31)
    rows = []
    eid = 0
    for u in range(25):
        for _ in range(rng.randint(1, 12)):
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=rng.randint(0, 70), seconds=rng.randint(0, 86399)
            )
            rows.append((eid, ts, u, "click", 1.0))
            eid += 1
    sf = _stage(
        spark,
        tmp_path,
        "surv",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )

    # survival: brute force lifetimes
    by_user = {}
    for _, ts, u, _, _ in rows:
        lo, hi = by_user.get(u, (ts, ts))
        by_user[u] = (min(lo, ts), max(hi, ts))
    # both engines count calendar-day boundaries (datediff on DATEs), not
    # floor(elapsed/24h) — mirror that
    lifetimes = [(hi.date() - lo.date()).days // 7 for lo, hi in by_user.values()]
    total = len(lifetimes)
    got = {r.week: (r.n_ending, r.n_surviving, r.survival_micro)
           for r in events_survival_curve(spark, sf).collect()}
    for wk in sorted(set(lifetimes)):
        n_end = sum(1 for l in lifetimes if l == wk)
        n_surv = sum(1 for l in lifetimes if l >= wk)
        assert got[wk] == (n_end, n_surv, 1000000 * n_surv // total), wk
    assert set(got) == set(lifetimes)

    # cohort matrix: brute force weekly activity (ISO-Monday truncation)
    def monday(ts):
        d = ts.date()
        return d - datetime.timedelta(days=d.weekday())

    uw = {(u, monday(ts)) for _, ts, u, _, _ in rows}
    cwk = {}
    for u, wk in uw:
        cwk[u] = min(cwk.get(u, wk), wk)
    want = {}
    for u, wk in uw:
        key = (str(cwk[u]), (wk - cwk[u]).days // 7)
        want[key] = want.get(key, 0) + 1
    got_m = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in events_cohort_matrix(spark, sf).collect()
    }
    assert got_m == want


def test_ab_srm_assignment_replayable_in_python(spark, tmp_path):
    """The md5 arm assignment must be replayable from plain Python
    (deterministic cross-engine contract), and the chi-square math must
    match integer brute force."""
    from cassandra_syncer_spark.queries.analytics_r7g import sample_ab_srm

    rng = random.Random(43)
    rows = []
    for eid in range(300):
        rows.append(
            (
                eid,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=eid),
                rng.randint(0, 80),
                rng.choice(["click", "view"]),
                1.0,
            )
        )
    sf = _stage(
        spark,
        tmp_path,
        "srm",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
        "events",
    )

    def arm(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2

    seen = {}
    for _, _, u, t, _ in rows:
        seen.setdefault(t, set()).add(u)
    for r in sample_ab_srm(spark, sf).collect():
        users = seen[r.event_type]
        n_a = sum(1 for u in users if arm(u) == 0)
        n_b = len(users) - n_a
        chi = 1000000 * (n_a - n_b) * (n_a - n_b) // (n_a + n_b)
        assert (r.n_a, r.n_b, r.srm_chi2_micro, r.srm_flag) == (
            n_a,
            n_b,
            chi,
            chi > 3_841_459,
        ), r.event_type


def test_variance_prune_integer_exact_vs_numpy(spark, tmp_path):
    """embed_variance_prune's integer variance quotient == exact integer
    arithmetic replayed in Python over the micro-quantized values."""
    import numpy as np

    from cassandra_syncer_spark.queries.analytics_r7e import embed_variance_prune

    rng = np.random.default_rng(17)
    x = rng.normal(size=(50, 64)) * np.linspace(0.001, 0.3, 64)
    rows = [(int(i), [float(v) for v in x[i]], 0) for i in range(len(x))]
    sf = _stage(
        spark,
        tmp_path,
        "varp",
        rows,
        "vec_id long, embedding array<float>, label int",
        "embeddings",
    )
    xi = np.round(x.astype(np.float32).astype(np.float64) * 1e6).astype(object)
    n = len(x)
    for r in embed_variance_prune(spark, sf).collect():
        col = xi[:, r.dim - 1]
        num = n * int((col * col).sum()) - int(col.sum()) ** 2
        q = num // (n * (n - 1)) if num >= 0 else -((-num) // (n * (n - 1)))
        # Spark div truncates toward zero; num >= 0 always here (variance)
        assert r.var_q == q, r.dim
        assert r.keep == (q >= 10_000_000_000), r.dim
