"""Round-10 property tests — the row-returning split-null join must be
output-identical to the naive `<=>` join it replaces, row for row, and
its null block must contribute exactly n_left_null × n_right_null rows
(the count form's algebra realized as a dataflow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_syncer_spark.queries.analytics_r7w import _NULL_L, _NULL_R
from cassandra_syncer_spark.queries.relational import T
from cassandra_syncer_spark.registry import REGISTRY, all_queries


def _load():
    all_queries()


def _naive_null_safe_rows(spark, sf_dir):
    """The single `<=>` join the rewrite replaces — built inline so the
    test cannot drift from the registered query's key recipe."""
    l = T(spark, sf_dir, "orders").select(
        F.expr(
            f"CASE WHEN o_orderkey % {_NULL_L} = 0 THEN NULL ELSE o_custkey END"
        ).alias("k"),
        "o_orderkey",
    )
    r = T(spark, sf_dir, "customer").select(
        F.expr(
            f"CASE WHEN c_custkey % {_NULL_R} = 0 THEN NULL ELSE c_custkey END"
        ).alias("rk"),
        "c_custkey",
    )
    return l.join(r, F.col("k").eqNullSafe(F.col("rk"))).select(
        "o_orderkey",
        "c_custkey",
        F.coalesce(F.col("k"), F.lit(-1)).cast("long").alias("join_key"),
    )


def test_null_safe_rows_equals_naive_null_safe_join(spark, sf_dir):
    """Row-for-row identity: split rewrite output == the `<=>` join
    output, as multisets of (o_orderkey, c_custkey, join_key)."""
    _load()
    got = sorted(
        map(tuple, REGISTRY["join_null_safe_rows"].fn(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, _naive_null_safe_rows(spark, sf_dir).collect()))
    assert got == want


def test_null_safe_rows_null_block_is_count_form_product(spark, sf_dir):
    """The row form's null block must realize exactly the count form's
    n_left_null × n_right_null term, and its equi remainder the n_equi
    term — the two registered queries prove each other."""
    _load()
    counts = REGISTRY["join_null_safe_split"].fn(spark, sf_dir).collect()[0]
    rows = REGISTRY["join_null_safe_rows"].fn(spark, sf_dir)
    n_null_rows = rows.filter(F.col("join_key") == -1).count()
    n_equi_rows = rows.filter(F.col("join_key") != -1).count()
    assert n_null_rows == counts.n_left_null * counts.n_right_null
    assert n_equi_rows == counts.n_equi
    assert n_null_rows + n_equi_rows == counts.n_null_safe
