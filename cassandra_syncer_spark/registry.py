"""Query registry — single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers here with a Spark callable and
(usually) a DuckDB-equivalent oracle SQL string.  ``__spark_entry__.py``
exposes the registry verbatim as ``queries()`` / ``oracle_sql()``, and
``tests/test_oracle_parity.py`` replays the driver's t2 comparison locally.

Contract discipline (see __spark_entry__.py docstring):
- every computed column aliased identically on both sides;
- float aggregates rounded identically on both sides (double sum order
  differs between engines, rounding makes the hash stable);
- timestamps emitted as strings or epoch integers (never raw timestamp
  columns — ns/µs physical precision differs between the engines);
- oracle omitted only for genuinely non-SQL-expressible ops (driver then
  records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import cassandra_syncer_spark.queries  # noqa: F401  (triggers registration)

    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    import cassandra_syncer_spark.queries  # noqa: F401

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
