"""Property test: the union+window as-of join must agree with a naive
per-row reference implementation on randomized inputs (SURVEY.md §5.4)."""

from __future__ import annotations

import random

from cassandra_syncer_spark.operators.asof import asof_join


def naive_asof(left_rows, right_rows):
    """O(n·m) reference: for each left row, max-(ts, id) right row with
    right.ts <= left.ts in the same key."""
    out = {}
    for key, lts, lid in left_rows:
        best = None
        for rkey, rts, rid in right_rows:
            if rkey == key and rts <= lts:
                cand = (rts, rid)
                if best is None or cand > best:
                    best = cand
        out[(key, lts, lid)] = best
    return out


def test_asof_matches_naive_on_random_frames(spark):
    rng = random.Random(42)
    for trial in range(5):
        keys = ["a", "b", "c"]
        left_rows = [
            (rng.choice(keys), rng.randrange(0, 50), i) for i in range(40)
        ]
        right_rows = [
            (rng.choice(keys), rng.randrange(0, 50), 1000 + i) for i in range(30)
        ]
        left = spark.createDataFrame(left_rows, "k string, ts_sec long, lid long")
        right = spark.createDataFrame(right_rows, "k string, ts_sec long, event_id long")
        got = {
            (r.k, r.ts_sec, r.lid): (
                None if r.matched_event_id is None else (r.matched_ts, r.matched_event_id)
            )
            for r in asof_join(
                left, right, on="k", left_ts="ts_sec", right_ts="ts_sec",
                value_cols=["event_id"],
            ).collect()
        }
        want = naive_asof(left_rows, right_rows)
        assert got == want, f"trial {trial}: mismatch"


def naive_nearest(left_rows, right_rows):
    """O(n·m) reference for nearest_join: min |dt|, ties prefer the
    at-or-before row; among right rows at the same ts, max event_id
    (the collapse rule); keys with no right rows are dropped."""
    # collapse right side to one row per (key, ts), max id
    collapsed = {}
    for rkey, rts, rid in right_rows:
        k = (rkey, rts)
        collapsed[k] = max(collapsed.get(k, rid), rid)
    out = {}
    for key, lts, lid in left_rows:
        best = None
        for (rkey, rts), rid in collapsed.items():
            if rkey != key:
                continue
            # order: smaller distance wins; tie -> smaller rts (backward)
            cand = (abs(rts - lts), rts, rid)
            if best is None or cand[:2] < best[:2]:
                best = cand
        if best is not None:
            out[(key, lts, lid)] = (best[1], best[2])
    return out


def test_nearest_matches_naive_on_random_frames(spark):
    from cassandra_syncer_spark.operators.asof import nearest_join

    rng = random.Random(7)
    for trial in range(5):
        keys = ["a", "b", "c", "d"]  # d sometimes absent on the right
        left_rows = [
            (rng.choice(keys), rng.randrange(0, 40), i) for i in range(35)
        ]
        right_rows = [
            (rng.choice(keys[:3]), rng.randrange(0, 40), 1000 + i) for i in range(25)
        ]
        left = spark.createDataFrame(left_rows, "k string, ts_sec long, lid long")
        right = spark.createDataFrame(right_rows, "k string, ts_sec long, event_id long")
        got = {
            (r.k, r.ts_sec, r.lid): (r.matched_ts, r.matched_event_id)
            for r in nearest_join(
                left, right, on="k", left_ts="ts_sec", right_ts="ts_sec",
                value_cols=["event_id"],
            ).collect()
        }
        want = naive_nearest(left_rows, right_rows)
        assert got == want, f"trial {trial}: mismatch"
