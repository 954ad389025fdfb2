"""cassandra_syncer_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of ``rax-maas/cassandra-syncer`` (a Node.js
SSTable backup/sync/restore pipeline, see SURVEY.md) as Spark DataFrame
dataflows, and extends the surface with large-scale training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design posture (100 TB mandate):
- DataFrame/SQL only — every operator visible to Catalyst; no RDDs.
- Pandas/Arrow UDFs only where built-ins genuinely can't express semantics.
- AQE on; broadcast hints for dimension tables; explicit aliasing so results
  are oracle-comparable.
"""

from cassandra_syncer_spark.session import get_spark, load_table

__all__ = ["get_spark", "load_table"]
