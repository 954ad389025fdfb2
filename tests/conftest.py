from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    from cassandra_syncer_spark.session import get_spark

    spark = get_spark(app_name="cassandra-syncer-spark-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views,
    mirroring the driver's oracle setup (__spark_entry__.py docstring)."""
    import duckdb

    from cassandra_syncer_spark.session import FIXTURE_TABLES

    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(ORACLE_SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
