"""Import every query module so its ``@register`` decorators run."""

from cassandra_syncer_spark.queries import (  # noqa: F401
    analytics_extras,
    analytics_r3,
    analytics_r3b,
    analytics_r4,
    analytics_r4b,
    analytics_r5,
    approx_bounds,
    incremental,
    joins,
    llm_dedup,
    llm_similarity,
    llm_text,
    llm_udf,
    multimodal,
    relational,
    scalar_funcs,
    streaming_source,
    tpch_style,
    tpch_style_r4,
    windows,
)
