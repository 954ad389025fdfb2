"""Property test: the two-pass bucketed weighted median must agree with
a naive per-group reference on randomized inputs — including the edge
shapes the fixture can't produce (single-value groups, all weight on one
row, duplicate values across tiebreaks, tiny and huge weights)."""

from __future__ import annotations

import random

from cassandra_syncer_spark.operators.weighted_median import weighted_median


def naive_weighted_median(rows):
    """rows: (group, value, weight, tb). Smallest value whose cumulative
    weight under (value, tb) order reaches half the group total."""
    out = {}
    groups = {}
    for g, v, w, tb in rows:
        groups.setdefault(g, []).append((v, tb, w))
    for g, items in groups.items():
        items.sort()
        total = sum(w for _, _, w in items)
        cum = 0
        for v, _tb, w in items:
            cum += w
            if 2 * cum >= total:
                out[g] = v
                break
    return out


def test_weighted_median_matches_naive_on_random_frames(spark):
    rng = random.Random(7)
    for trial in range(6):
        n_groups = rng.choice([1, 2, 5])
        rows = []
        for i in range(rng.choice([1, 17, 200])):
            rows.append(
                (
                    f"g{rng.randrange(n_groups)}",
                    # duplicate-heavy small value space on some trials,
                    # wide float space on others
                    float(rng.choice([rng.randrange(4), rng.uniform(-1e6, 1e6)])),
                    rng.choice([1, 1, 1, 5, 1000]),
                    i,
                )
            )
        df = spark.createDataFrame(rows, "g string, v double, w long, tb long")
        got = {
            r.g: r.w_median
            for r in weighted_median(
                df, group_col="g", value_col="v", weight_col="w", tiebreak_cols=["tb"]
            ).collect()
        }
        want = naive_weighted_median(rows)
        assert got == want, f"trial {trial}: {got} != {want}"
