#!/usr/bin/env python
"""Re-measure the BASELINE.md vanilla-PySpark queries under BOTH forcing
methods, like-for-like with bench.py.

Why: BASELINE.md (survey session) forced queries with ``count()``, under
which Catalyst prunes every output column a count doesn't need — for the
window row that deletes the window computation itself, so the published
0.07 s measures a shell of the query.  bench.py forces a noop write of
every output column (the honest cost of producing the result).  Comparing
those two methods against each other produced the round-1 "weak" rows.
This script produces the apples-to-apples table: each baseline query,
vanilla PySpark (no engine code), original config (local[8],
shuffle.partitions=16), forced both ways, best of 3 warm runs.

Run:  python scripts/measure_baseline.py   (writes BASELINE_REMEASURE.json)
"""

from __future__ import annotations

import json
import time

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("baseline-remeasure")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t = {
        name: spark.read.parquet(f"{SF_DIR}/{name}.parquet")
        for name in ["lineitem", "orders", "customer", "nation", "region", "events"]
    }
    events = t["events"].withColumn(
        "ts_sec", (F.col("ts") / F.lit(1_000_000_000)).cast("long")
    )

    # -- the five BASELINE.md queries, vanilla PySpark ---------------------

    def q1_pricing():
        li = t["lineitem"]
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum("l_extendedprice").alias("sum_base_price"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc"),
                F.avg("l_quantity").alias("avg_qty"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    def q1_pricing_exact8():
        # The engine's agg_group_sum VERBATIM (same query text as
        # cassandra_syncer_spark/queries/relational.py:agg_group_sum), as
        # vanilla PySpark: 8 outputs, exact-integer-unit money sums.  This is
        # the like-for-like noop row for the bench's agg_group_sum gate —
        # q1_pricing above (5 plain double aggs) is NOT the same query.
        li = t["lineitem"]
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        staged = li.filter(
            F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
        ).select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_quantity") * 100.0).cast("long").alias("qty_c"),
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias("price_c"),
            F.round(disc_price * 10000.0).cast("long").alias("disc_price_u"),
            F.round(charge * 1000000.0).cast("long").alias("charge_u"),
            F.round(F.col("l_discount") * 100.0).cast("long").alias("disc_c"),
        )
        agg = staged.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("qty_c").alias("s_qty"),
            F.sum("price_c").alias("s_price"),
            F.sum("disc_price_u").alias("s_disc_price"),
            F.sum("charge_u").alias("s_charge"),
            F.sum("disc_c").alias("s_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        n = F.col("count_order")
        return agg.select(
            "l_returnflag",
            "l_linestatus",
            (F.col("s_qty") / 100.0).alias("sum_qty"),
            (F.col("s_price") / 100.0).alias("sum_base_price"),
            (F.col("s_disc_price") / 10000.0).alias("sum_disc_price"),
            (F.col("s_charge") / 1000000.0).alias("sum_charge"),
            (F.col("s_qty") / (n * 100.0)).alias("avg_qty"),
            (F.col("s_price") / (n * 100.0)).alias("avg_price"),
            (F.col("s_disc") / (n * 100.0)).alias("avg_disc"),
            "count_order",
        ).orderBy("l_returnflag", "l_linestatus")

    def q_join3():
        return (
            t["customer"]
            .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
            .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("c_custkey", "c_name")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
            .orderBy(F.desc("revenue"))
            .limit(10)
        )

    def q_star5():
        return (
            t["region"]
            .join(t["nation"], F.col("r_regionkey") == F.col("n_regionkey"))
            .join(t["customer"], F.col("n_nationkey") == F.col("c_nationkey"))
            .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
            .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("r_name", "n_name")
            .agg(F.sum("l_quantity").alias("qty"), F.count(F.lit(1)).alias("n"))
            .orderBy("r_name", "n_name")
        )

    def q_window():
        w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
        return events.select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.sum("value")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("running"),
        )

    def q_window_frames_exact():
        # the engine's win_running_frame VERBATIM (running total + 3-row
        # moving average, rounded) — like-for-like row for that gate; the
        # q_window row above computes row_number+running (different query)
        w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
        return events.select(
            "event_id",
            "user_id",
            "ts_sec",
            F.round(
                F.sum("value").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                2,
            ).alias("running_total"),
            F.round(F.avg("value").over(w.rowsBetween(-2, Window.currentRow)), 4).alias(
                "moving_avg3"
            ),
        )

    def q_distinct_both():
        return t["events"].groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )

    def q_distinct_exact():
        return t["events"].groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )

    def q_distinct_approx():
        return t["events"].groupBy("event_type").agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users")
        )

    queries = {
        "q1_pricing": q1_pricing,
        "q1_pricing_exact8": q1_pricing_exact8,
        "join3_topk": q_join3,
        "star5": q_star5,
        "window_rownum_running": q_window,
        "window_frames_exact": q_window_frames_exact,
        "distinct_both": q_distinct_both,
        "distinct_exact_only": q_distinct_exact,
        "distinct_approx_only": q_distinct_approx,
    }

    def best_of_3(force) -> float:
        force()  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            force()
            times.append(time.perf_counter() - t0)
        return round(min(times), 4)

    out: dict[str, dict[str, float]] = {}
    for name, build in queries.items():
        df = build()
        out[name] = {
            "count_forced": best_of_3(lambda: df.count()),
            "noop_write_forced": best_of_3(
                lambda: df.write.format("noop").mode("overwrite").save()
            ),
        }
        print(name, out[name])

    with open("BASELINE_REMEASURE.json", "w") as fh:
        json.dump({"sf_dir": SF_DIR, "config": "local[8], shuffle=16", "queries": out}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
