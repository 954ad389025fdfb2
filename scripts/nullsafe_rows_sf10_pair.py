"""Same-session sf10 pairing for join_null_safe_rows (VERDICT r10 ask #3).

The round-10 sf10 sweep recorded the engine row at 293 s ENGINE-ONLY —
the naive `<=>` port was skipped because the replica multiplies BOTH null
spools by the replica factor N, so the null x null output block grows N^2
(the same measuring-the-replica clause SCALING.md applies to the
identical-copy dedup family).  This script closes the ask with the real
pairing: it first prints the measured null-spool / output-row volumes
(driver-side counts, cheap), then times engine vs naive warm once +
best-of-2, noop-write-forced, interleaved in ONE session so host drift
cancels — the BENCH_SF10_R10 method.

Run:  PYTHONPATH=. SPARK_GRAFT_SF_DIR=/tmp/sf10_replica \
        python scripts/nullsafe_rows_sf10_pair.py
Writes BENCH_SF10_NULLROWS_R11.json; evidence recorded in SCALING.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r10 import join_null_safe_rows
from cassandra_syncer_spark.queries.analytics_r7w import _NULL_L, _NULL_R
from cassandra_syncer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10_replica")

spark = get_spark(app_name="nullsafe-rows-sf10-pair")
spark.sparkContext.setLogLevel("ERROR")


def naive_rows():
    # the single-`<=>` plan the split rewrite replaces, key recipe
    # identical to scripts/vanilla_queries.py::null_safe_rows_vanilla
    l = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.expr(
            f"CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL ELSE o_custkey END"
        ).alias("k"),
        "o_orderkey",
    )
    r = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.expr(
            f"CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL ELSE c_custkey END"
        ).alias("rk"),
        "c_custkey",
    )
    return (
        l.join(r, F.col("k").eqNullSafe(F.col("rk")))
        .select(
            "o_orderkey",
            "c_custkey",
            F.coalesce(F.col("k"), F.lit(-1)).cast("long").alias("join_key"),
        )
        .orderBy("o_orderkey", "c_custkey")
    )


def engine_rows():
    return join_null_safe_rows(spark, SF_DIR)


# --- volume audit (drives the materialization-bound read) ---------------
orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
n_null_l = orders.filter(F.col("o_orderkey") % _NULL_L == 0).count()
n_null_r = customer.filter(F.col("c_custkey") % _NULL_R == 0).count()
null_block = n_null_l * n_null_r
# equi-side volume via the split count form (metadata multiply is free)
equi_rows = (
    orders.withColumn(
        "k",
        F.expr(
            f"CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL ELSE o_custkey END"
        ),
    )
    .filter(F.col("k").isNotNull())
    .join(
        customer.withColumn(
            "rk",
            F.expr(
                f"CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL ELSE c_custkey END"
            ),
        ).filter(F.col("rk").isNotNull()),
        F.col("k") == F.col("rk"),
    )
    .count()
)
total_rows = equi_rows + null_block
print(
    f"null spools: L={n_null_l} R={n_null_r}  null block={null_block:,}  "
    f"equi={equi_rows:,}  total output={total_rows:,}",
    flush=True,
)


def timed_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


results = {}
# interleave: warm pass (engine, naive), then two timed passes each
for label, build in (("engine", engine_rows), ("naive", naive_rows)):
    t = timed_noop(build())
    print(f"warm {label}: {t:.1f} s", flush=True)
    results.setdefault(label, []).append(t)
for _ in range(2):
    for label, build in (("engine", engine_rows), ("naive", naive_rows)):
        t = timed_noop(build())
        print(f"timed {label}: {t:.1f} s", flush=True)
        results[label].append(t)

best = {k: round(min(v[1:]), 2) for k, v in results.items()}
out = {
    "metric": "join_null_safe_rows_sf10_same_session_pair",
    "unit": "sec",
    "sf": 10.0,
    "sf_dir": SF_DIR,
    "forcing": "noop-write, warm once then best-of-2, engine/naive interleaved same-session",
    "engine_best": best["engine"],
    "naive_best": best["naive"],
    "ratio_engine_vs_naive": round(best["engine"] / best["naive"], 3),
    "all_runs": {k: [round(t, 2) for t in v] for k, v in results.items()},
    "volumes": {
        "null_spool_left": n_null_l,
        "null_spool_right": n_null_r,
        "null_block_rows": null_block,
        "equi_rows": equi_rows,
        "total_output_rows": total_rows,
    },
}
with open("BENCH_SF10_NULLROWS_R11.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
