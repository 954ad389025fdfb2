"""Import every query module so its ``@register`` decorators run."""

from cassandra_syncer_spark.queries import joins, relational, windows  # noqa: F401
