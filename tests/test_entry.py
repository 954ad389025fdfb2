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


def test_all_queries_run_and_have_schema(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: empty schema"
