"""Local replay of the driver's t2 gate: every registered query with an
oracle must match DuckDB on row count, column names, and values
(order-insensitive).  Stricter than the driver's hash (we diff values), so
passing here should imply passing t2.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from cassandra_syncer_spark.registry import REGISTRY, all_queries


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — mirrors an
    order-insensitive value comparison."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif s.dtype == object:
            s = s.apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        out[c] = s
    ndf = pd.DataFrame(out)
    return ndf.sort_values(by=list(ndf.columns), ignore_index=True)


def _assert_frames_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    # dtype parity: the driver's schema check may compare types; engines must
    # agree on physical widths (int32 vs int64 etc.), not just values
    for c in spark_pdf.columns:
        st, dt = str(spark_pdf[c].dtype), str(duck_pdf[c].dtype)
        assert st == dt, f"{name}.{c}: dtype spark={st} != duckdb={dt}"
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            fa, fb = a[c].to_numpy(), b[c].to_numpy()
            for i, (x, y) in enumerate(zip(fa, fb)):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
                assert ok, f"{name}: col {c} row {i}: {x!r} != {y!r} (float mismatch — hash would differ)"
        else:
            mism = a[c].astype(str).to_numpy() != b[c].astype(str).to_numpy()
            if mism.any():
                i = int(mism.argmax())
                raise AssertionError(
                    f"{name}: col {c} first mismatch at sorted-row {i}: "
                    f"{a[c].iloc[i]!r} != {b[c].iloc[i]!r}"
                )


ALL = sorted(all_queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert len(spark_pdf) >= 0
        return
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    _assert_frames_match(name, spark_pdf, duck_pdf)
