"""SparkSession factory + fixture-table registry.

Reference parity note: the reference is a single Node.js process
(``/root/reference/bin/cassandra-syncer:243-280``); our unit of execution is
a SparkSession.  All scale-relevant defaults (AQE, shuffle partitions, Arrow)
live here so every entry point — driver contract, tests, bench — gets the
same tuned session.

Known fixture gotcha (FIXTURES.md): ``events.parquet`` has shipped ``ts``
in two physical shapes across driver rounds — INT64 TIMESTAMP(NANOS)
(rounds 1–2) and plain ``timestamp[us]`` (round 3+).  :func:`load_table`
normalizes BOTH to the same logical schema: ``ts`` as a microsecond
timestamp plus a derived ``ts_ns`` bigint (nanosecond epoch) for
exact-epoch arithmetic.  ``spark.sql.legacy.parquet.nanosAsLong=true``
stays set so the old shape remains loadable; it is a no-op for the new
shape.  tests/test_fixture_schema_canary.py exercises both branches.
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
        # back-compat: lets the old INT64 TIMESTAMP(NANOS) events fixture
        # load (as bigint); no-op for the current timestamp[us] fixture
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

    ``events.ts`` has two known physical shapes (see module docstring):

    - INT64 TIMESTAMP(NANOS) → read as bigint under ``nanosAsLong``; we
      keep the raw value as ``ts_ns`` and rebuild ``ts`` as a microsecond
      timestamp (integer ``div``, not ``/`` — ns epochs overflow doubles).
    - ``timestamp[us]`` (current fixtures) → ``ts`` loads natively; we
      derive ``ts_ns = unix_micros(ts) * 1000``.

    Either way callers see the same logical schema: ``ts: timestamp`` +
    ``ts_ns: bigint``.  The DuckDB oracles use ``epoch_ns(ts)``, which is
    shape-agnostic, so only this Spark-side loader needs the dual branch.
    """
    # defensive session-conf pinning: the driver may call queries with its
    # own SparkSession.  Timestamp rendering (date_format/year/month) is
    # session-timezone-dependent, and the DuckDB oracle formats wall-clock —
    # pin UTC so results agree regardless of the caller's JVM default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # back-compat with the old ns-timestamp fixture shape, which fails
        # to load at all without this (PARQUET_TYPE_ILLEGAL, FIXTURES.md);
        # harmless no-op for the current timestamp[us] shape
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # old INT64-nanos shape: integer division (`div`), not `/` —
            # ns epochs overflow double precision
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type is not None and ts_type.startswith("timestamp"):
            # current timestamp[us] shape (reads as TIMESTAMP_NTZ); the
            # NTZ→LTZ cast is a wall-clock reinterpret under the UTC
            # session tz pinned above, and unix_micros needs LTZ
            ts_ltz = F.col("ts").cast("timestamp")
            df = df.withColumn("ts", ts_ltz).withColumn(
                "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
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
    partitions and this is a no-op — the guard never *reduces* parallelism,
    so no shuffle is added on big inputs.

    The guard reads scan metadata the planner already has — file list
    (``df.inputFiles()``) and optimizer size stats — NOT
    ``df.rdd.getNumPartitions()``, which would convert the whole plan to
    an RDD on the driver per call (wasted planning work at scale).  The
    scan is under-parallel only when BOTH hold: fewer files than cores
    (small files pack, so many files ⇒ many partitions) AND total bytes
    under ``n × maxPartitionBytes`` (big files split, so big bytes ⇒ many
    partitions).  Callers only pass raw scans here.
    """
    n = min_partitions or spark.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= n:
            return df
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # non-file-backed / stat-less plan: fan out
        return df.repartition(n)
    if size >= n * 128 * 1024 * 1024:  # spark.sql.files.maxPartitionBytes default
        return df
    return df.repartition(n)


def table_row_count(sf_dir: str, name: str, spark: SparkSession | None = None) -> int:
    """Exact row count of a fixture table from parquet FOOTER metadata —
    no Spark job on a local filesystem.

    Strategy-gating counts (e.g. sim_hamming_ann's corpus-size gate) only
    need the table's cardinality; running ``df.count()`` for it paid a
    full scan job per invocation.  Parquet footers carry the exact row
    count per file, so this is driver-side metadata on the same footing
    as ``df.inputFiles()`` in :func:`fan_out` — and it is exact, not an
    estimate.  Handles both single-file fixtures and directory-style
    replicas (Spark-written ``part-*.parquet``).

    Non-local ``sf_dir`` (``s3://``, ``hdfs://``, ``file:`` URIs — anything
    ``os.path`` cannot see): the footers are not listable from here, so
    fall back to one exact ``count()`` job through whatever filesystem the
    session can read.  A directory replica with ZERO parquet files raises
    instead of returning 0 — a silent 0 would flip the caller's strategy
    gate on what is actually a broken path.
    """
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = [e for e in os.listdir(path) if e.endswith(".parquet")]
        if not files:
            raise FileNotFoundError(f"no *.parquet files under {path}")
        return sum(
            pq.ParquetFile(os.path.join(path, e)).metadata.num_rows for e in files
        )
    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    if spark is not None:
        return spark.read.parquet(path).count()
    raise FileNotFoundError(
        f"{path} is not a local file/dir and no SparkSession was given "
        "for the non-local fallback"
    )


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
