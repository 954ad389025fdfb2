"""SparkSession factory + fixture-table registry.

Reference parity note: the reference is a single Node.js process
(``/root/reference/bin/cassandra-syncer:243-280``); our unit of execution is
a SparkSession.  All scale-relevant defaults (AQE, shuffle partitions, Arrow)
live here so every entry point — driver contract, tests, bench — gets the
same tuned session.

Known fixture gotcha (FIXTURES.md): ``events.parquet`` stores ``ts`` as
INT64 TIMESTAMP(NANOS), which Spark cannot read natively.  We set
``spark.sql.legacy.parquet.nanosAsLong=true`` and rebuild the column as a
microsecond timestamp in :func:`load_table`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tables the driver materializes at every scale factor (TESTDATA.md)
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "cassandra-syncer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults are sized for the local[32] harness but expressed so the same
    code runs unchanged on a multi-executor cluster: AQE handles runtime
    partition coalescing / skew joins, broadcast threshold is explicit, and
    shuffle partitions are a starting hint that AQE re-plans.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        # fixture requirement: events.ts is INT64 TIMESTAMP(NANOS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # scale posture: adaptive execution re-plans partition counts,
        # converts to broadcast joins at runtime, and splits skewed joins
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))),
        )
        # Arrow for every pandas_udf / toPandas boundary
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical-type quirks.

    ``events.ts`` arrives as nanosecond epoch longs (because of the
    ``nanosAsLong`` session flag); rebuild it as a proper microsecond
    ``timestamp`` and keep the raw value as ``ts_ns`` for exact-epoch
    comparisons against the DuckDB oracle (which reads ns natively).
    """
    # defensive session-conf pinning: the driver may call queries with its
    # own SparkSession.  Timestamp rendering (date_format/year/month) is
    # session-timezone-dependent, and the DuckDB oracle formats wall-clock —
    # pin UTC so results agree regardless of the caller's JVM default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # without this runtime-settable conf the ns-timestamp parquet fails
        # to load at all (PARQUET_TYPE_ILLEGAL, FIXTURES.md)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division (`div`), not `/`: ns epochs overflow double precision
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def fan_out(df: DataFrame, spark: SparkSession, min_partitions: int | None = None) -> DataFrame:
    """Ensure compute-heavy per-row work runs on all cores.

    Small inputs (one parquet row group → one scan partition; AQE coalescing
    tiny shuffles to one partition) serialize expression-heavy stages like
    the minhash/simhash signatures onto a single task — measured 0.9 s of a
    1.7 s query on 1/32 cores at sf0.1.  An *explicit* ``repartition(n)`` is
    preserved by AQE (only implicit shuffle partition counts are coalesced),
    so it fans the work out.

    Scale posture: at 100 TB the scan already has ≥ defaultParallelism
    partitions and this is a no-op — the guard checks the planned partition
    count and never *reduces* parallelism, so no shuffle is added on big
    inputs.
    """
    n = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
