"""Cassandra table source/sink — the engine's read/write-sync face for live
Cassandra clusters (BASELINE.json north star: "Spark DataFrame + Cassandra
connector for read/write sync").

Uses the public Spark Cassandra Connector format
(``org.apache.spark.sql.cassandra``, options keyspace/table) when its jar is
on the session classpath; this container ships no connector jar and no
cluster, so availability is probed and every entry point degrades to a
clear error (tests skip).  The sync dataflows themselves are
connector-agnostic: SyncPipeline only sees DataFrames, so a Cassandra table
scan slots in wherever a directory scan does.

Scale notes (how the connector maps onto the 100 TB posture):
- reads are partitioned by Cassandra token range — Spark partitions align
  with the ring, so a full-table scan never hotspots one node;
- predicate pushdown applies to partition-key equality and clustering-key
  ranges (``pushdown=true``), everything else filters in Spark;
- writes batch by partition key per task; idempotent upserts give the same
  at-least-once + idempotent-re-put contract as the reference's uploader
  (core.js:403-417).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def cassandra_connector_available(spark: SparkSession) -> bool:
    """True iff the Spark Cassandra Connector classes are on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.cassandra.DefaultSource"
        )
        return True
    except Exception:
        return False


class CassandraTableSource:
    """Read/write one Cassandra table as a DataFrame."""

    def __init__(self, keyspace: str, table: str):
        self.keyspace = keyspace
        self.table = table

    def _require(self, spark: SparkSession) -> None:
        if not cassandra_connector_available(spark):
            raise RuntimeError(
                "Spark Cassandra Connector not on the classpath; add "
                "com.datastax.spark:spark-cassandra-connector and set "
                "spark.cassandra.connection.host"
            )

    def read(self, spark: SparkSession) -> DataFrame:
        self._require(spark)
        return (
            spark.read.format(CASSANDRA_FORMAT)
            .options(keyspace=self.keyspace, table=self.table, pushdown="true")
            .load()
        )

    def write(self, df: DataFrame, mode: str = "append") -> None:
        self._require(df.sparkSession)
        (
            df.write.format(CASSANDRA_FORMAT)
            .options(keyspace=self.keyspace, table=self.table)
            .mode(mode)
            .save()
        )

    def snapshot_to_parquet(self, spark: SparkSession, path: str, partition_by: list[str] | None = None) -> None:
        """Batch ETL sync: Cassandra table → partitioned parquet snapshot
        (the engine-native form of the reference's backup EP1)."""
        df = self.read(spark)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
