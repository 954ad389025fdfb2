"""Object-store target — the reference's ``cloudfiles://`` deployment shape.

The reference's primary target is a Rackspace Cloud Files bucket driven by
the vendored node-cloudfiles client: paginated container listing
(``node_modules/cloudfiles/lib/cloudfiles/core.js:238-310``), streamed GET
into a local cache (``:336-368``), idempotent PUT with md5-etag
verification (``:377-418``), DELETE, and per-object metadata records
(``storage-object.js:117-129`` — name/bytes/etag/last_modified/
content_type).  No public object store exists in this environment, so
:class:`ObjectStore` is an in-process, filesystem-backed implementation of
exactly that API surface — real enough to test store *semantics*
(conditional put, etag mismatch, list pagination) rather than mock calls.

Store layout (all under one root, reachable from every executor in local
mode — on a cluster this root would be shared storage, and the class maps
1:1 onto any S3/Swift-style HTTP client):

- ``<root>/<container>/<name>``            object bytes
- ``<root>/.meta/<container>/<name>.json`` metadata record (the listing
  *table*: ``spark.read.json`` over this directory is a distributed
  listing scan — the engine never funnels a billion-object listing
  through a driver loop)

:class:`ObjectStoreTarget` adapts the store to the sync pipeline's
``Target`` protocol: distributed upload/download/delete via
``foreachPartition`` (bounded-concurrency queue + retry semantics come
from Spark's task scheduler, as in ``bin/cassandra-syncer:47-80``), with
md5-etag conditional put supplying re-put idempotence
(``core.js:403-417``).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LISTING_SCHEMA = (
    "name string, bytes long, etag string, last_modified_ms long, content_type string"
)


class EtagMismatch(Exception):
    """PUT integrity failure — stored bytes do not hash to the expected
    etag (the reference raises on a response-ETag mismatch,
    core.js:414-417)."""


def _inflight(path: str) -> str:
    """Dot-prefixed temp name for write-then-rename commits.

    The leading dot matters: Spark's file index skips basenames starting
    with ``.`` or ``_``, and :meth:`ObjectStore.list_objects` filters on the
    ``.json`` suffix — so a listing racing an in-flight put can never see a
    duplicate or partially-written record (a bare ``<name>.json.inflight``
    WOULD be read by ``spark.read.json(recursiveFileLookup)``)."""
    d, b = os.path.split(path)
    return os.path.join(d, "." + b + ".inflight")


class ObjectStore:
    """In-process object store with cloudfiles API semantics.

    Picklable (holds only the root path), so executors construct per-task
    clients the way the reference constructs per-queue-worker HTTP
    clients."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    # -- containers (core.js:118-161) -----------------------------------

    def _cdir(self, container: str) -> str:
        return os.path.join(self.root, container)

    def _mdir(self, container: str) -> str:
        return os.path.join(self.root, ".meta", container)

    def create_container(self, container: str) -> None:
        os.makedirs(self._cdir(container), exist_ok=True)
        os.makedirs(self._mdir(container), exist_ok=True)

    def list_containers(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root)
            if d != ".meta" and os.path.isdir(os.path.join(self.root, d))
        )

    def container_exists(self, container: str) -> bool:
        return os.path.isdir(self._cdir(container))

    # -- objects ---------------------------------------------------------

    def _meta_path(self, container: str, name: str) -> str:
        return os.path.join(self._mdir(container), name + ".json")

    def _data_path(self, container: str, name: str) -> str:
        return os.path.join(self._cdir(container), name)

    def put_object(
        self,
        container: str,
        name: str,
        data: bytes,
        content_type: str = "application/octet-stream",
        if_none_match: str | None = None,
    ) -> tuple[str, bool]:
        """Idempotent PUT (core.js:377-418).  Returns ``(etag, stored)``.

        ``if_none_match=etag`` is the conditional form: when the object
        already exists with that etag the put is skipped (``stored=False``)
        — the transfer-avoidance the reference gets from its only-new-files
        invariant.  Every actual store verifies the written bytes hash to
        the computed etag and raises :class:`EtagMismatch` otherwise."""
        etag = hashlib.md5(data).hexdigest()
        if if_none_match is not None and if_none_match == etag:
            existing = self.stat_object(container, name)
            if existing is not None and existing["etag"] == etag:
                return etag, False
        self.create_container(container)
        dpath = self._data_path(container, name)
        os.makedirs(os.path.dirname(dpath), exist_ok=True)
        tmp = _inflight(dpath)
        with open(tmp, "wb") as fh:
            fh.write(data)
        with open(tmp, "rb") as fh:  # integrity check before commit
            written = hashlib.md5(fh.read()).hexdigest()
        if written != etag:
            os.remove(tmp)
            raise EtagMismatch(f"{container}/{name}: wrote {written}, expected {etag}")
        os.replace(tmp, dpath)  # atomic commit — retries are idempotent
        mpath = self._meta_path(container, name)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        mtmp = _inflight(mpath)
        with open(mtmp, "w") as fh:
            json.dump(
                {
                    "name": name,
                    "bytes": len(data),
                    "etag": etag,
                    "last_modified_ms": int(time.time() * 1000),
                    "content_type": content_type,
                },
                fh,
            )
        os.replace(mtmp, mpath)
        return etag, True

    def put_file(
        self,
        container: str,
        name: str,
        src_path: str,
        content_type: str = "application/octet-stream",
        skip_unchanged: bool = False,
        chunk_size: int = 8 << 20,
    ) -> tuple[str, bool]:
        """Streamed/chunked PUT from a local file — the reference pipes
        uploads without buffering the object (common.js:193-198, chunked
        when size unknown :166-171).  Bytes stream through ``chunk_size``
        buffers (hash computed en route), so a multi-GB SSTable never
        loads into memory.  ``skip_unchanged=True`` discards the transfer
        when the store already holds identical content (etag match) —
        single read of the source either way.  Integrity: the staged file
        is re-hashed in chunks before the atomic commit."""
        self.create_container(container)
        dpath = self._data_path(container, name)
        os.makedirs(os.path.dirname(dpath), exist_ok=True)
        tmp = _inflight(dpath)
        h = hashlib.md5()
        n = 0
        with open(src_path, "rb") as src, open(tmp, "wb") as out:
            while chunk := src.read(chunk_size):
                h.update(chunk)
                out.write(chunk)
                n += len(chunk)
        etag = h.hexdigest()
        if skip_unchanged:
            existing = self.stat_object(container, name)
            if existing is not None and existing["etag"] == etag:
                os.remove(tmp)
                return etag, False
        verify = hashlib.md5()
        with open(tmp, "rb") as fh:
            while chunk := fh.read(chunk_size):
                verify.update(chunk)
        if verify.hexdigest() != etag:
            os.remove(tmp)
            raise EtagMismatch(f"{container}/{name}: staged bytes hash mismatch")
        os.replace(tmp, dpath)
        mpath = self._meta_path(container, name)
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        mtmp = _inflight(mpath)
        with open(mtmp, "w") as fh:
            json.dump(
                {
                    "name": name,
                    "bytes": n,
                    "etag": etag,
                    "last_modified_ms": int(time.time() * 1000),
                    "content_type": content_type,
                },
                fh,
            )
        os.replace(mtmp, mpath)
        return etag, True

    def get_object(self, container: str, name: str) -> bytes:
        """GET (core.js:336-368)."""
        with open(self._data_path(container, name), "rb") as fh:
            return fh.read()

    def get_file(
        self,
        container: str,
        name: str,
        dst_path: str,
        chunk_size: int = 8 << 20,
        skip_etag: str | None = None,
    ) -> tuple[int, bool]:
        """Streamed GET into a local file (restore path): chunked copy,
        write-to-temp + atomic rename (idempotent on retry).  Returns
        ``(bytes_transferred, transferred)``.

        ``skip_etag`` is the restore-side cache semantics of the
        reference's GET-through-cache (core.js:336-342, cache keyed by
        container): when the destination file already exists AND its
        content hashes to the stored etag, the download is skipped
        entirely (``(0, False)``) — a re-restore over an intact tree
        transfers zero bytes.  The local hash is chunked, so the check
        never loads the file into memory."""
        if skip_etag is not None and os.path.exists(dst_path):
            h = hashlib.md5()
            with open(dst_path, "rb") as fh:
                while chunk := fh.read(chunk_size):
                    h.update(chunk)
            if h.hexdigest() == skip_etag:
                return 0, False
        os.makedirs(os.path.dirname(dst_path), exist_ok=True)
        tmp = _inflight(dst_path)
        n = 0
        with open(self._data_path(container, name), "rb") as src, open(tmp, "wb") as out:
            while chunk := src.read(chunk_size):
                out.write(chunk)
                n += len(chunk)
        os.replace(tmp, dst_path)
        return n, True

    def stat_object(self, container: str, name: str) -> dict | None:
        """HEAD — metadata record (storage-object.js:117-129)."""
        try:
            with open(self._meta_path(container, name)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def delete_object(self, container: str, name: str) -> bool:
        """DELETE; returns whether the object existed."""
        existed = False
        for path in (self._data_path(container, name), self._meta_path(container, name)):
            try:
                os.remove(path)
                existed = True
            except FileNotFoundError:
                pass
        return existed

    def list_objects(
        self,
        container: str,
        prefix: str = "",
        marker: str = "",
        limit: int = 10_000,
    ) -> list[dict]:
        """Paginated listing (core.js:238-310: marker + limit semantics).
        Names sort ascending; a page continues strictly after ``marker``.

        Driver-side convenience for small listings and pagination tests —
        dataflows use :meth:`ObjectStoreTarget.list_files`, which reads the
        same records as a distributed json scan."""
        mdir = self._mdir(container)
        if not os.path.isdir(mdir):
            return []
        names = []
        for dirpath, _dirs, files in os.walk(mdir):
            for f in files:
                if not f.endswith(".json"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, f), mdir)[: -len(".json")]
                if rel.startswith(prefix) and rel > marker:
                    names.append(rel)
        out = []
        for name in sorted(names)[:limit]:
            meta = self.stat_object(container, name)
            if meta is not None:
                out.append(meta)
        return out


class ObjectStoreTarget:
    """``cloudfiles://``-analog sync target over :class:`ObjectStore`."""

    def __init__(self, root: str, container: str = "default"):
        self.root = os.path.abspath(root)
        self.container = container

    def store(self) -> ObjectStore:
        return ObjectStore(self.root)

    def list_files(self, spark: SparkSession) -> DataFrame:
        """Distributed listing scan: the metadata records ARE a json table.
        No driver-side pagination loop — at 10⁹ objects this is a normal
        partitioned read."""
        mdir = os.path.join(self.root, ".meta", self.container)
        if not os.path.isdir(mdir) or not any(os.scandir(mdir)):
            return spark.createDataFrame(
                [],
                schema="name string, container string, bytes long, etag string, "
                "last_modified timestamp, content_type string, is_temp boolean",
            )
        return (
            spark.read.schema(LISTING_SCHEMA)
            .option("recursiveFileLookup", "true")
            .json(mdir)
            .select(
                "name",
                F.lit(self.container).alias("container"),
                "bytes",
                "etag",
                F.timestamp_millis("last_modified_ms").alias("last_modified"),
                "content_type",
                F.col("name").contains("-tmp").alias("is_temp"),
            )
        )

    def upload(self, plan: DataFrame, src_root: str | None = None) -> int:
        """Distributed conditional PUT of every planned file.

        Per file: streamed/chunked PUT (multi-GB SSTables never load into
        memory), skipped if the store already holds identical content
        (etag match — re-put idempotence).  Vanished sources are skipped
        (ENOENT, bin/cassandra-syncer:120-132).  Multi-path plans carry a
        per-row ``src_root`` column that overrides the argument (as in
        DirectoryTarget.upload).  Returns files actually stored (skips
        excluded), tallied in the same single execution."""
        root, container = self.root, self.container
        stored_n = plan.sparkSession.sparkContext.accumulator(0)
        per_row_root = "src_root" in plan.columns
        cols = ["name", "src_root"] if per_row_root else ["name"]

        def put_partition(rows):
            store = ObjectStore(root)
            n = 0
            for row in rows:
                src = os.path.join(row.src_root if per_row_root else src_root, row.name)
                try:
                    _etag, did_store = store.put_file(
                        container, row.name, src, skip_unchanged=True
                    )
                except FileNotFoundError:
                    continue
                n += int(did_store)
            stored_n.add(n)

        plan.select(*cols).foreachPartition(put_partition)
        return stored_n.value

    def download(self, plan: DataFrame, dst_root: str, cache_root: str | None = None) -> int:
        """Distributed GET → local files (restore path, core.js:336-368);
        write-to-temp + atomic rename, so task retries are idempotent.

        When the plan carries an ``etag`` column, a destination file whose
        content already hashes to it is skipped (the reference's local
        restore cache, core.js:336-342): a second restore over an intact
        tree transfers 0 files.  ``cache_root`` additionally routes every
        GET through a write-through :class:`~cassandra_syncer_spark.sync.
        cache.DownloadCache` (core.js getFile-into-cacheDir semantics):
        restores to a NEW destination reuse cached bytes and touch the
        store only for objects not yet cached.  Returns files actually
        transferred from the store."""
        from cassandra_syncer_spark.sync.cache import DownloadCache, cached_get

        root, container = self.root, self.container
        got_n = plan.sparkSession.sparkContext.accumulator(0)
        has_etag = "etag" in plan.columns
        cols = ["name", "etag"] if has_etag else ["name"]

        def get_partition(rows):
            store = ObjectStore(root)
            cache = DownloadCache(cache_root) if cache_root else None
            n = 0
            for row in rows:
                try:
                    _bytes, transferred = cached_get(
                        store.get_file,
                        container,
                        row.name,
                        row.etag if has_etag else None,
                        cache,
                        os.path.join(dst_root, row.name),
                    )
                except FileNotFoundError:
                    continue
                n += int(transferred)
            got_n.add(n)

        plan.select(*cols).foreachPartition(get_partition)
        return got_n.value

    def delete(self, plan: DataFrame) -> int:
        """Distributed DELETE of every planned name (prune execution) —
        partition-parallel, never a driver loop over collected names."""
        root, container = self.root, self.container
        deleted_n = plan.sparkSession.sparkContext.accumulator(0)

        def delete_partition(rows):
            store = ObjectStore(root)
            n = 0
            for row in rows:
                n += int(store.delete_object(container, row.name))
            deleted_n.add(n)

        plan.select("name").foreachPartition(delete_partition)
        return deleted_n.value


def scan_directory_with_etags(spark: SparkSession, root: str, container: str) -> DataFrame:
    """Directory walk that also computes content etags (md5) distributed —
    the local half of etag-identity sync (storage-object.js:123-124).
    Reads file bytes once per file on executors; use the metadata-only
    ``scan_directory`` when content identity is not needed."""
    from cassandra_syncer_spark.sync.targets import strip_root

    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        # a file deleted between listing and content read is skipped, not a
        # job failure — the scan-level form of the reference's ENOENT skip
        # (bin/cassandra-syncer:120-132)
        .option("ignoreMissingFiles", "true")
        .load(root)
        .select(
            strip_root(root).alias("name"),
            F.lit(container).alias("container"),
            F.col("length").alias("bytes"),
            F.md5("content").alias("etag"),
            F.col("modificationTime").alias("last_modified"),
            F.lit("application/octet-stream").alias("content_type"),
            F.col("path").contains("-tmp").alias("is_temp"),
        )
    )
