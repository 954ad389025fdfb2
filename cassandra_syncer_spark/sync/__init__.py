"""Sync/restore/prune — the reference's first-party capability surface
(backup pipeline EP1/EP2/EP3, SURVEY.md §3) as DataFrame dataflows."""

from cassandra_syncer_spark.sync.http_target import (
    HttpObjectStoreTarget,
    SwiftClient,
)
from cassandra_syncer_spark.sync.object_store import (
    EtagMismatch,
    ObjectStore,
    ObjectStoreTarget,
    scan_directory_with_etags,
)
from cassandra_syncer_spark.sync.swift_server import SwiftServer
from cassandra_syncer_spark.sync.pipeline import (
    FILE_SCHEMA,
    MANIFEST_SCHEMA,
    SyncPipeline,
)

__all__ = [
    "EtagMismatch",
    "FILE_SCHEMA",
    "HttpObjectStoreTarget",
    "MANIFEST_SCHEMA",
    "ObjectStore",
    "ObjectStoreTarget",
    "SwiftClient",
    "SwiftServer",
    "SyncPipeline",
    "scan_directory_with_etags",
]
