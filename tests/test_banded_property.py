"""Property tests: the banded range join and connected components must
agree with naive reference implementations on randomized inputs
(SURVEY.md §5.4 — algebraic/semantic invariants over seeded random frames).
"""

from __future__ import annotations

import random

from cassandra_syncer_spark.operators.banded import (
    banded_interval_join,
    banded_proximity_join,
    banded_range_join,
)
from cassandra_syncer_spark.operators.components import connected_components


def test_banded_range_join_matches_naive(spark):
    """banded_range_join == brute-force point-in-interval filter, across
    band widths (narrower/wider than intervals, boundary-aligned values,
    negatives)."""
    rng = random.Random(7)
    for trial, band_width in enumerate([5.0, 17.0, 64.0]):
        points = [(i, rng.uniform(-100, 100)) for i in range(60)]
        # intervals of assorted widths, some empty (lo == hi), some negative
        intervals = []
        for j in range(40):
            lo = rng.uniform(-110, 110)
            intervals.append((1000 + j, lo, lo + rng.choice([0.0, 1.0, 8.0, 30.0])))
        left = spark.createDataFrame(points, "pid long, v double")
        right = spark.createDataFrame(intervals, "iid long, lo double, hi double")
        got = {
            (r.pid, r.iid)
            for r in banded_range_join(
                left, right, left_point="v", right_lo="lo", right_hi="hi",
                band_width=band_width,
            ).collect()
        }
        want = {
            (pid, iid)
            for pid, v in points
            for iid, lo, hi in intervals
            if lo <= v < hi
        }
        assert got == want, f"band_width={band_width}: {got ^ want}"


def test_banded_join_outer_variants_match_naive(spark):
    """left / left_semi / left_anti agree with the brute-force reference:
    unmatched-left preservation (nulls), semi multiplicity (each left row
    at most once), and the anti prune set — across band widths."""
    rng = random.Random(23)
    points = [(i, rng.uniform(-100, 100)) for i in range(80)]
    intervals = []
    for j in range(30):
        lo = rng.uniform(-110, 110)
        intervals.append((1000 + j, lo, lo + rng.choice([0.0, 2.0, 12.0, 40.0])))
    left = spark.createDataFrame(points, "pid long, v double")
    right = spark.createDataFrame(intervals, "iid long, lo double, hi double")
    want_pairs = {
        (pid, iid)
        for pid, v in points
        for iid, lo, hi in intervals
        if lo <= v < hi
    }
    matched = {pid for pid, _ in want_pairs}
    for band_width in [5.0, 17.0, 64.0]:
        kw = dict(
            left_point="v", right_lo="lo", right_hi="hi", band_width=band_width
        )
        rows = banded_range_join(left, right, how="left", **kw).collect()
        got_pairs = {(r.pid, r.iid) for r in rows if r.iid is not None}
        got_unmatched = {r.pid for r in rows if r.iid is not None} ^ {r.pid for r in rows}
        assert got_pairs == want_pairs
        assert got_unmatched == {pid for pid, _ in points} - matched
        # every left row survives: matches + null-extended rows
        assert len(rows) == len(want_pairs) + len(got_unmatched)

        semi = {r.pid for r in banded_range_join(left, right, how="left_semi", **kw).collect()}
        assert semi == matched
        anti = {r.pid for r in banded_range_join(left, right, how="left_anti", **kw).collect()}
        assert anti == {pid for pid, _ in points} - matched

    import pytest

    with pytest.raises(ValueError):
        banded_range_join(left, right, how="right", **kw)


def test_banded_proximity_join_matches_naive(spark):
    rng = random.Random(11)
    lpts = [(i, float(rng.randrange(-50, 50))) for i in range(50)]
    rpts = [(100 + i, float(rng.randrange(-50, 50))) for i in range(50)]
    left = spark.createDataFrame(lpts, "lid long, lv double")
    right = spark.createDataFrame(rpts, "rid long, rv double")
    got = {
        (r.lid, r.rid)
        for r in banded_proximity_join(
            left, right, left_val="lv", right_val="rv", radius=7.0
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, lv in lpts
        for rid, rv in rpts
        if rv - 7.0 <= lv < rv + 7.0
    }
    assert got == want


def test_banded_interval_join_matches_naive(spark):
    """Interval×interval overlap: each overlapping pair surfaces EXACTLY
    once (the first-band rule replaces DISTINCT), across band widths
    narrower and wider than the intervals; empty and negative intervals
    included."""
    rng = random.Random(31)
    a_rows, b_rows = [], []
    for i in range(60):
        lo = rng.uniform(-100, 100)
        a_rows.append((i, lo, lo + rng.choice([0.0, 3.0, 20.0, 75.0])))
    for j in range(50):
        lo = rng.uniform(-120, 120)
        b_rows.append((1000 + j, lo, lo + rng.choice([0.0, 5.0, 33.0])))
    left = spark.createDataFrame(a_rows, "aid long, alo double, ahi double")
    right = spark.createDataFrame(b_rows, "bid long, blo double, bhi double")
    want = [
        (aid, bid)
        for aid, alo, ahi in a_rows
        for bid, blo, bhi in b_rows
        if alo < bhi and blo < ahi
    ]
    for band_width in [4.0, 21.0, 80.0]:
        rows = banded_interval_join(
            left, right, "alo", "ahi", "blo", "bhi", band_width=band_width
        ).collect()
        got = [(r.aid, r.bid) for r in rows]
        assert sorted(got) == sorted(want), f"band_width={band_width}"
        assert len(got) == len(set(got)), "pair duplicated across bands"


def _naive_components(edges):
    """Union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark):
    rng = random.Random(13)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(0, n), rng.randrange(0, n)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.id: r.component for r in connected_components(df).collect()}
        want = _naive_components(edges)
        assert got == want, f"trial {trial}"


def test_incremental_components_equal_batch(spark):
    """incremental_components over any wave split must equal one-shot
    connected_components over the union — including waves that MERGE two
    previously separate components and vertices only present in the old
    labeling (singletons must survive)."""
    from cassandra_syncer_spark.operators.components import incremental_components

    rng = random.Random(23)
    edges = []
    for _ in range(120):
        a, b = rng.randrange(0, 60), rng.randrange(0, 60)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    waves = [edges[:40], edges[40:80], edges[80:]]

    batch = {
        (r.id, r.component)
        for r in connected_components(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    labels = connected_components(
        spark.createDataFrame(waves[0], "src long, dst long")
    )
    for wave in waves[1:]:
        labels = incremental_components(
            labels, spark.createDataFrame(wave, "src long, dst long")
        )
    got = {(r.id, r.component) for r in labels.collect()}
    assert got == batch
