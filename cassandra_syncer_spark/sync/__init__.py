"""Sync/restore/prune — the reference's first-party capability surface
(backup pipeline EP1/EP2/EP3, SURVEY.md §3) as DataFrame dataflows."""

from cassandra_syncer_spark.sync.object_store import (
    ObjectStore,
    ObjectStoreTarget,
    scan_directory_with_etags,
)
from cassandra_syncer_spark.sync.pipeline import (
    FILE_SCHEMA,
    MANIFEST_SCHEMA,
    SyncPipeline,
)

__all__ = [
    "FILE_SCHEMA",
    "MANIFEST_SCHEMA",
    "ObjectStore",
    "ObjectStoreTarget",
    "SyncPipeline",
    "scan_directory_with_etags",
]
