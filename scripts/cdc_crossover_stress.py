"""CDC crossover stress: the one-window changelog apply vs the multi-pass
broadcast MERGE, with the snapshot KEY SPACE scaled with the corpus.

Context (SCALING.md round-9 "sf1 gate-suite run"): `cdc_apply_changelog`
was the worst sf1 gate row (1.98×) because at that replica the three-pass
MERGE vanilla rides BROADCAST joins against a fixed 150k-key snapshot —
the changelog sides fit under the 10 MB auto-broadcast threshold, so the
vanilla pays no shuffle at all while the engine's row_number window
shuffles snapshot∪log once.  That advantage is an artifact of the replica
holding the key space constant while fact volume grows; in production the
snapshot IS the big table (CDC maintains it), so its keys scale with the
corpus and the vanilla's join sides outgrow every broadcast threshold.

This script makes that claim measurable: synthesize a K-key snapshot and
the same deterministic changelog recipe the registered query uses
(every 3rd key updated, every 7th deleted, every 11th spawning an
insert), then time both formulations at K = 1.5M, 15M, 60M keys with
default AQE/broadcast settings (no knobs forced — the point is what the
planner actually does as the sides grow).

Run:  PYTHONPATH=. python scripts/cdc_crossover_stress.py [K ...]
Evidence recorded in SCALING.md (round-10 "CDC crossover" section).
"""

import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_syncer_spark.session import get_spark

spark = get_spark(app_name="cdc-crossover-stress")
spark.sparkContext.setLogLevel("ERROR")


def frames(k: int):
    # snapshot: K keys, a small payload; changelog derived exactly like
    # the registered query's recipe so the work shape matches
    snap = spark.range(k).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(25)).alias("nat"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("bal"),
    )
    upd = snap.filter(F.col("k") % 3 == 0).select(
        "k", "nat", (F.col("bal") + 100000).alias("bal"),
        F.lit(1).cast("long").alias("seq"), F.lit("U").alias("op"),
    )
    dele = snap.filter(F.col("k") % 7 == 0).select(
        "k", "nat", F.lit(0).cast("long").alias("bal"),
        F.lit(2).cast("long").alias("seq"), F.lit("D").alias("op"),
    )
    ins = snap.filter(F.col("k") % 11 == 0).select(
        (F.col("k") + 10 * k).alias("k"), "nat",
        F.lit(555500).cast("long").alias("bal"),
        F.lit(3).cast("long").alias("seq"), F.lit("I").alias("op"),
    )
    snap_tagged = snap.select(
        "k", "nat", "bal",
        F.lit(0).cast("long").alias("seq"), F.lit("I").alias("op"),
    )
    return snap_tagged, snap, upd, dele, ins


def engine_window(k: int):
    snap_tagged, _, upd, dele, ins = frames(k)
    merged = snap_tagged.unionByName(upd).unionByName(dele).unionByName(ins)
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    latest = merged.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") == 1) & (F.col("op") != "D")
    )
    return latest.groupBy("nat").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        F.sum("bal").cast("long").alias("sum_bal_centi"),
    )


def vanilla_multipass(k: int):
    _, snap, upd, dele, ins = frames(k)
    after_upd = snap.join(
        upd.select("k", F.col("bal").alias("new_bal")), "k", "left"
    ).select("k", "nat", F.coalesce("new_bal", "bal").alias("bal"))
    after_del = after_upd.join(dele.select("k"), "k", "left_anti")
    live = after_del.unionByName(ins.select("k", "nat", "bal"))
    return live.groupBy("nat").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        F.sum("bal").cast("long").alias("sum_bal_centi"),
    )


def noop_time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# --- experiment 2: multi-epoch changelogs ---------------------------------
# The single-epoch log above is the multipass's BEST case: at most one op
# of each type per key, so "updates then deletes then inserts" is correct
# in three fixed passes, and those passes are competitive shuffled hash
# joins at any K (experiment 1 measures exactly that).  Real CDC logs are
# not single-epoch — a maintained table sees MANY sequenced ops per key —
# and there the multipass degenerates structurally: correctness forces one
# join pass PER EPOCH (each later epoch's values override the earlier),
# O(E) shuffles of the full table, while the window form stays ONE
# shuffle+sort of snapshot ∪ all epochs regardless of E.


def epoch_frames(k: int, epochs: int):
    snap = spark.range(k).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(25)).alias("nat"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000))).alias("bal"),
    )
    logs = [
        snap.filter(F.col("k") % 3 == 0).select(
            "k",
            "nat",
            (F.col("bal") + 100_000 * e).alias("bal"),
            F.lit(e).cast("long").alias("seq"),
        )
        for e in range(1, epochs + 1)
    ]
    return snap, logs


def engine_window_epochs(k: int, epochs: int):
    snap, logs = epoch_frames(k, epochs)
    merged = snap.select(
        "k", "nat", "bal", F.lit(0).cast("long").alias("seq")
    )
    for lg in logs:
        merged = merged.unionByName(lg)
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    latest = merged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return latest.groupBy("nat").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        F.sum("bal").cast("long").alias("sum_bal_centi"),
    )


def vanilla_multipass_epochs(k: int, epochs: int):
    snap, logs = epoch_frames(k, epochs)
    cur = snap
    for lg in logs:  # one full-table join pass per epoch — the O(E) shape
        cur = cur.join(
            lg.select("k", F.col("bal").alias("new_bal")), "k", "left"
        ).select("k", "nat", F.coalesce("new_bal", "bal").alias("bal"))
    return cur.groupBy("nat").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        F.sum("bal").cast("long").alias("sum_bal_centi"),
    )


def run_pair(label: str, e_df, v_df, extra: dict) -> None:
    er = {r.nat: (r.n_live, r.sum_bal_centi) for r in e_df.collect()}
    vr = {r.nat: (r.n_live, r.sum_bal_centi) for r in v_df.collect()}
    assert er == vr, f"{label}: formulations disagree"
    noop_time(e_df), noop_time(v_df)  # warm
    te = min(noop_time(e_df), noop_time(e_df))
    tv = min(noop_time(v_df), noop_time(v_df))
    print(
        {
            **extra,
            "engine_window_s": round(te, 2),
            "vanilla_multipass_s": round(tv, 2),
            "ratio_engine_vs_vanilla": round(te / tv, 2),
        },
        flush=True,
    )


ks = [int(a) for a in sys.argv[1:]] or [1_500_000, 15_000_000, 60_000_000]
for k in ks:
    run_pair(f"K={k}", engine_window(k), vanilla_multipass(k), {"keys": k})

K_EPOCH = 15_000_000
for epochs in (1, 4, 8, 16):
    run_pair(
        f"E={epochs}",
        engine_window_epochs(K_EPOCH, epochs),
        vanilla_multipass_epochs(K_EPOCH, epochs),
        {"keys": K_EPOCH, "epochs": epochs},
    )
spark.stop()
