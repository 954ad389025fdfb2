"""Sources & sinks: parquet/json/binaryFile fixtures, directory targets,
and the Cassandra table connector adapter (import-gated)."""

from cassandra_syncer_spark.sources.cassandra import (
    CassandraTableSource,
    cassandra_connector_available,
)

__all__ = ["CassandraTableSource", "cassandra_connector_available"]
