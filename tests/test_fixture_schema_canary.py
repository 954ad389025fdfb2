"""Fixture-schema canary: ``load_table`` must normalize EVERY known
physical shape of ``events.ts`` to the same logical schema.

Round-3 postmortem: the driver regenerated ``events.parquet`` with ``ts``
as ``timestamp[us]`` instead of INT64 TIMESTAMP(NANOS) and 12 queries +
17 tests + the bench harness silently died on the missing derived
``ts_ns`` column.  This test writes a tiny events table in BOTH physical
shapes and asserts the loader yields identical logical output for each —
so the next fixture-shape drift fails HERE, loudly, not in the driver's
correctness artifact.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cassandra_syncer_spark.session import load_table

# wall-clock instants (UTC) with sub-second precision; ns values chosen
# µs-aligned because the timestamp[us] shape cannot carry finer precision
_EPOCH_NS = [
    1_700_000_000_000_000_000,
    1_700_000_000_123_456_000,
    1_700_086_400_500_000_000,
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 10], type=pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def shape_dirs(tmp_path_factory):
    """Two sf-dir layouts holding the same events rows in each physical
    shape the fixtures have ever shipped."""
    base = tmp_path_factory.mktemp("fixture_shapes")
    nanos_dir = base / "nanos"
    micros_dir = base / "micros"
    nanos_dir.mkdir()
    micros_dir.mkdir()
    _write_events(
        str(nanos_dir / "events.parquet"),
        pa.array(_EPOCH_NS, type=pa.timestamp("ns")),
    )
    _write_events(
        str(micros_dir / "events.parquet"),
        pa.array([ns // 1000 for ns in _EPOCH_NS], type=pa.timestamp("us")),
    )
    return str(nanos_dir), str(micros_dir)


def _load_normalized(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp", dtypes
    assert dtypes["ts_ns"] == "bigint", dtypes
    return {
        r["event_id"]: (r["ts_ns"], str(r["ts"]))
        for r in df.select("event_id", "ts", "ts_ns").collect()
    }


def test_both_shapes_normalize_identically(spark, shape_dirs):
    nanos_dir, micros_dir = shape_dirs
    from_nanos = _load_normalized(spark, nanos_dir)
    from_micros = _load_normalized(spark, micros_dir)
    assert from_nanos == from_micros
    assert sorted(ns for ns, _ in from_nanos.values()) == sorted(_EPOCH_NS)


def test_real_fixture_has_ts_ns(spark, sf_dir):
    """Whatever shape the CURRENT driver fixture ships, the loader must
    produce the normalized logical schema."""
    dtypes = dict(load_table(spark, sf_dir, "events").dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
