"""SyncPipeline — the reference's backup/restore/prune semantics as
declarative DataFrame dataflows.

Reference parity map (file:line cites into /root/reference):

| capability               | reference                                   | here |
|--------------------------|---------------------------------------------|------|
| full-backup detection    | container probe `bin/cassandra-syncer:154-177` | :meth:`full_backup_needed` |
| temp-file exclusion      | isTempFile `bin/cassandra-syncer:208-210`   | :meth:`live_files` |
| incremental upload plan  | only-new-files `bin/cassandra-syncer:268-277` + etag identity `storage-object.js:123-124` | :meth:`plan_upload` |
| skip-deleted (ENOENT)    | `bin/cassandra-syncer:120-132`              | :meth:`plan_upload` (anti vs tombstones) |
| manifest snapshot        | walk→array→JSON `bin/cassandra-syncer:83-110` | :meth:`build_manifest` |
| latest-manifest pick     | sort+take-last `bin/cassandra-syncer-restore:82-89` (buggy comparator — intended semantics implemented) | :meth:`latest_manifests` |
| minimum restore set      | `bin/cassandra-syncer-restore:93-109`, README:19-21 | :meth:`restore_plan` |
| prune unreferenced       | fsck spec README:23-28 (21-day retention)   | :meth:`prune_plan` |

Scale posture: every method returns a lazy DataFrame; keys are file names
(semi/anti joins hash-shuffle once on name), manifests store path arrays
(exploded on read, so the manifest log stays tiny), and the physical copy
runs partition-parallel with Spark's own retry (`spark.task.maxFailures`)
supplying the reference's re-enqueue-on-error loop
(`bin/cassandra-syncer:71-80`) — at-least-once with idempotent overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

#: file record — shape from the object-store listing (core.js:355-367)
FILE_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("container", StringType(), False),
        StructField("bytes", LongType(), True),
        StructField("etag", StringType(), True),
        StructField("last_modified", TimestampType(), True),
        StructField("content_type", StringType(), True),
        StructField("is_temp", BooleanType(), True),
    ]
)

#: manifest snapshot — {dirname: [paths]} keyed by Date.now()
#: (bin/cassandra-syncer:103-104)
MANIFEST_SCHEMA = StructType(
    [
        StructField("manifest_ts", LongType(), False),
        StructField("container", StringType(), False),
        StructField("paths", ArrayType(StringType()), False),
    ]
)


class SyncPipeline:
    """Pure dataflow planning for sync/restore/prune.  Stateless; every
    method maps input DataFrames to an output DataFrame."""

    TEMP_MARKER = "-tmp"  # bin/cassandra-syncer:208-210

    # -- EP1: backup -------------------------------------------------------

    def full_backup_needed(self, remote_containers: DataFrame, container: str) -> bool:
        """Container-existence probe (bin/cassandra-syncer:162-177): a full
        scan-and-upload is needed iff the container is absent remotely."""
        return (
            remote_containers.filter(F.col("name") == container).limit(1).count() == 0
        )

    def live_files(self, local_files: DataFrame) -> DataFrame:
        """Exclude in-flight temp files (name contains '-tmp')."""
        return local_files.filter(~F.col("name").contains(self.TEMP_MARKER))

    def plan_upload(
        self,
        local_files: DataFrame,
        remote_files: DataFrame,
        tombstones: DataFrame | None = None,
    ) -> DataFrame:
        """Incremental upload plan: live local files whose (name, etag) is
        not already stored — the only-new-files invariant
        (bin/cassandra-syncer:268-277) with content identity
        (storage-object.js:123-124).  ``tombstones`` (names deleted locally
        since listing) reproduces the ENOENT skip (:120-132)."""
        # null-safe content key: etag-less listings (directory targets)
        # reconcile by name alone; a null etag must still join-match
        local_keyed = self.live_files(local_files).withColumn(
            "__ck", F.coalesce(F.col("etag"), F.lit(""))
        )
        remote_keyed = remote_files.select(
            "name", F.coalesce(F.col("etag"), F.lit("")).alias("__ck")
        )
        plan = local_keyed.join(remote_keyed, ["name", "__ck"], "left_anti").drop("__ck")
        if tombstones is not None:
            plan = plan.join(tombstones.select("name"), ["name"], "left_anti")
        return plan

    def build_manifest(self, local_files: DataFrame, manifest_ts: int) -> DataFrame:
        """Snapshot the live file set into one manifest row per container
        (walk→collect→serialize, bin/cassandra-syncer:83-110).  Sorted so
        the snapshot is deterministic.

        The result is lazy: persist it to the manifest log (parquet append)
        before building the next snapshot.  Unioning two *unpersisted*
        manifests whose scans cover the same directory is unsafe — Spark
        canonicalizes the two identical-looking file scans into one, so
        both legs would see a single listing and one snapshot silently
        loses rows.  The append-only log (the reference's one-object-per-
        snapshot model, bin/cassandra-syncer:104) is the contract."""
        return (
            self.live_files(local_files)
            .groupBy("container")
            .agg(F.sort_array(F.collect_set("name")).alias("paths"))
            .withColumn("manifest_ts", F.lit(manifest_ts).cast("long"))
            .select("manifest_ts", "container", "paths")
        )

    # -- EP3: restore ------------------------------------------------------

    def latest_manifests(self, manifests: DataFrame) -> DataFrame:
        """Latest manifest per container — max_by, not sort-take-last (the
        reference's comparator at bin/cassandra-syncer-restore:69-71 is
        buggy; this is the intended semantics, and one aggregation pass
        instead of a global sort).  Ties on manifest_ts (two writers in the
        same millisecond) are broken deterministically by the paths array
        itself, so restore never picks a nondeterministic snapshot."""
        return manifests.groupBy("container").agg(
            F.max("manifest_ts").alias("manifest_ts"),
            F.max_by("paths", F.struct("manifest_ts", "paths")).alias("paths"),
        )

    def restore_plan(self, manifests: DataFrame, stored_files: DataFrame) -> DataFrame:
        """Minimum restore set (README:19-21): explode the latest manifest's
        paths, semi-join against stored files.  Files named by the manifest
        but absent remotely are surfaced with is_missing=true rather than
        invented (FIXTURES.md §B)."""
        wanted = self.latest_manifests(manifests).select(
            "container", F.explode("paths").alias("name")
        )
        stored = stored_files.select(
            "container", "name", "etag", "bytes", F.lit(True).alias("__stored")
        )
        return (
            wanted.join(stored, ["container", "name"], "left")
            .withColumn("is_missing", F.col("__stored").isNull())
            .drop("__stored")
        )

    # -- prune (fsck spec) -------------------------------------------------

    def prune_plan(
        self,
        manifests: DataFrame,
        stored_files: DataFrame,
        now_ms: int,
        older_than_ms: int = 21 * 24 * 3600 * 1000,  # README:26-28 default
    ) -> DataFrame:
        """Prunable set: stored files that (a) no *retained* manifest
        references and (b) are older than the retention window.  Retained =
        manifests newer than the cutoff, plus always the latest per
        container (restorability invariant)."""
        cutoff = now_ms - older_than_ms
        latest = self.latest_manifests(manifests).select("container", "manifest_ts")
        retained = manifests.join(latest, ["container", "manifest_ts"], "left_semi").unionByName(
            manifests.filter(F.col("manifest_ts") >= cutoff)
        )
        referenced = retained.select("container", F.explode("paths").alias("name")).distinct()
        old_enough = stored_files.filter(
            F.col("last_modified").cast("double") * 1000 < F.lit(cutoff)
        )
        return old_enough.join(referenced, ["container", "name"], "left_anti")

    def manifests_asof(self, manifests: DataFrame, as_of_ms: int) -> DataFrame:
        """Snapshot state as of a past instant: the newest manifest per
        container with ``manifest_ts <= as_of_ms`` (time travel over the
        append-only log — the reference only exposes 'latest'; the log
        model gives every historical snapshot for free)."""
        return self.latest_manifests(
            manifests.filter(F.col("manifest_ts") <= F.lit(as_of_ms))
        )

    def compact_manifests(self, manifests: DataFrame, keep_since_ms: int) -> DataFrame:
        """Log compaction: retain the latest manifest per container plus
        everything newer than ``keep_since_ms``.  Bounds log growth under
        snapshot-per-commit (EP2 writes one manifest per event batch);
        rewrite the log table with this result periodically."""
        latest = self.latest_manifests(manifests).select("container", "manifest_ts")
        return (
            manifests.join(latest, ["container", "manifest_ts"], "left_semi")
            .unionByName(manifests.filter(F.col("manifest_ts") >= F.lit(keep_since_ms)))
            .distinct()
        )

    # -- file-set reconciliation helpers (§2.7 semantics) ------------------

    def dedup_by_content(self, files: DataFrame) -> DataFrame:
        """Keep one row per etag (deterministic keep-first-by-name)."""
        w = Window.partitionBy("container", "etag").orderBy("name")
        return (
            files.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
