"""Plan-inspection utilities (used by tests/test_plans.py and for manual
`.explain` audits during development)."""

from cassandra_syncer_spark.plans.inspect import (
    broadcast_join_count,
    executed_plan,
    has_cartesian,
    pushed_filters,
)

__all__ = ["broadcast_join_count", "executed_plan", "has_cartesian", "pushed_filters"]
