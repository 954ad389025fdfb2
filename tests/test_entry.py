"""Smoke tests for the driver contract surface (t1 analog)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_consistent():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "no queries registered"
    # every oracle key must have a query; not vice versa (rows-only allowed)
    assert set(o) <= set(q)


def test_priority_rotation_ids_are_registered():
    """_ordered silently skips PRIORITY ids missing from the registry —
    a typo'd or stale rotation entry would quietly burn a slot in the
    driver's ~50-query verification window.  Also reject duplicates:
    one id must not occupy two slots."""
    from cassandra_syncer_spark.registry import PRIORITY, REGISTRY, all_queries

    all_queries()
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY lists unregistered ids: {missing}"
    dupes = [n for n in set(PRIORITY) if PRIORITY.count(n) > 1]
    assert not dupes, f"PRIORITY lists duplicate ids: {dupes}"


def test_all_queries_run_and_have_schema(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
