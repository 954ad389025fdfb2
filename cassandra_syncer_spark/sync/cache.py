"""Restore-side write-through download cache — parity with the
reference's GET-through-cache (core.js:336-368: `getFile` downloads into
a per-container cache directory, `_performDownload` then copies
cache → target; a later restore finds the cached copy and never
re-fetches).

The cache is CONTENT-VALIDATED, not name-trusted: an entry only counts
as a hit when its bytes hash to the stored etag (the reference trusts
names; etag validation closes the stale/truncated-entry hole a
name-keyed cache has after a crashed download or an object overwrite).
All writes are temp + atomic rename, so concurrent executor tasks
filling the same entry race benignly — last rename wins with identical
content.

At scale the cache root sits on executor-local disk (each executor
caches the objects its tasks restore); cross-restore reuse is what the
reference built the cache for — nightly restore drills re-fetch only
objects that changed since yesterday.
"""

from __future__ import annotations

import hashlib
import os
import uuid

_CHUNK = 8 << 20


def _content_matches(path: str, etag: str, chunk_size: int = _CHUNK) -> bool:
    """Chunked md5-vs-etag check; never loads the file into memory."""
    if not os.path.exists(path):
        return False
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while chunk := fh.read(chunk_size):
            h.update(chunk)
    return h.hexdigest() == etag


def _atomic_copy(src: str, dst: str, chunk_size: int = _CHUNK) -> int:
    """Chunked copy, write-to-temp + atomic rename (idempotent on retry)."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = f"{dst}.inflight-{uuid.uuid4().hex}"
    n = 0
    with open(src, "rb") as fh, open(tmp, "wb") as out:
        while chunk := fh.read(chunk_size):
            out.write(chunk)
            n += len(chunk)
    os.replace(tmp, dst)
    return n


class DownloadCache:
    """Filesystem cache keyed (container, name), etag-validated."""

    def __init__(self, root: str):
        self.root = root

    def path(self, container: str, name: str) -> str:
        return os.path.join(self.root, container, name)

    def has(self, container: str, name: str, etag: str | None) -> bool:
        """Hit = entry present AND content hashes to the etag.  Without an
        etag nothing can be validated, so everything is a miss."""
        return etag is not None and _content_matches(self.path(container, name), etag)


def cached_get(
    get_file,
    container: str,
    name: str,
    etag: str | None,
    cache: DownloadCache | None,
    dst_path: str,
) -> tuple[int, bool]:
    """One restore GET routed through the write-through cache.

    ``get_file(container, name, dst, skip_etag=...)`` is either
    ObjectStore.get_file or CloudFilesClient.get_file — the two share the
    signature, so targets reuse this helper verbatim.

    Order of checks mirrors the reference's restore path:
      1. destination already intact (etag match) → nothing to do;
      2. cache hit → copy cache → dst, zero store traffic;
      3. miss → GET into the cache (temp+rename), then copy cache → dst
         (write-through: the fetch itself populates the cache).

    Returns ``(bytes_fetched_from_store, fetched_from_store)`` — cache
    hits report (0, False), keeping the targets' "files transferred"
    accumulator meaning network/store transfers, same as without a cache.
    """
    if etag is not None and _content_matches(dst_path, etag):
        return 0, False
    if cache is None:
        return get_file(container, name, dst_path, skip_etag=etag)
    cpath = cache.path(container, name)
    nbytes, fetched = 0, False
    if not cache.has(container, name, etag):
        os.makedirs(os.path.dirname(cpath), exist_ok=True)
        nbytes, fetched = get_file(container, name, cpath, skip_etag=None)
    _atomic_copy(cpath, dst_path)
    return nbytes, fetched
