"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps exactly one piece of cross-event state: which files it
has already uploaded (the only-new-files invariant,
``bin/cassandra-syncer:268-277``) plus a per-file retry count
(``:71-80``).  ``upload_ledger`` generalizes that: per key (container),
maintain a running ledger {files_seen, bytes_total, new_in_batch} across
microbatches, emitting the updated ledger row each batch.

Why applyInPandasWithState: aggregations cover sums, dropDuplicates covers
identity — but a ledger that must *decide* per event against its own
history (skip already-seen names, count retries) needs arbitrary state.

State bounds (what keeps this runnable against an unbounded 100 TB stream):

- **Idle-key eviction.** With ``idle_evict_ms`` set (the long-running
  default), the operator runs under
  ``GroupStateTimeout.ProcessingTimeTimeout``: a container idle for that
  long has its ledger removed, so state size tracks *live* keys, not every
  container ever seen.  Eviction requires a live trigger (processingTime)
  to fire timeout batches; bounded drain jobs (``availableNow``) must pass
  ``idle_evict_ms=None`` — a drain's state-cleanup batch would otherwise
  block until the processing-time timeout falls due.  Tested at
  tests/test_stateful_streaming.py::test_idle_container_state_evicted.
- **Bounded per-entry memory.** State stores an 8-byte md5-derived hash
  per seen file name, never the name itself — a billion-file container
  costs ~8 GB of state rather than unbounded string storage.  Collisions
  (~p=n²/2⁶⁴) can only under-count ``new_in_batch`` — the safe direction
  for a dedup ledger (a colliding file is skipped, never double-counted).
  A corpus whose *per-key* live-file count is itself unbounded should
  lower ``idle_evict_ms`` or shard containers (documented, not silently
  lossy).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LEDGER_SCHEMA = "container string, files_seen long, bytes_total long, new_in_batch long"
STATE_SCHEMA = "name_hashes array<long>, bytes_total long"

#: default idle-eviction horizon for long-running watch deployments
IDLE_EVICT_MS = 30 * 60 * 1000


def _name_hash(name: str) -> int:
    """Deterministic 63-bit hash of a file name (md5-derived — stable across
    processes, unlike Python's seeded ``hash``)."""
    return int.from_bytes(hashlib.md5(name.encode()).digest()[:8], "big") >> 1


def _make_update_fn(idle_evict_ms: int | None):
    def update_ledger(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (container,) = key
        if idle_evict_ms is not None and state.hasTimedOut:
            # idle container: evict its ledger entirely (a later event
            # restarts from empty — the same at-least-once posture as the
            # reference's restart-from-scratch full-backup probe)
            state.remove()
            return
        if state.exists:
            hashes, bytes_total = state.get
            seen = set(hashes)
        else:
            seen, bytes_total = set(), 0
        new = 0
        for pdf in pdfs:
            for name, nbytes in zip(pdf["name"], pdf["bytes"]):
                h = _name_hash(name)
                if h not in seen:  # only-new-files invariant, stateful form
                    seen.add(h)
                    bytes_total += int(nbytes)
                    new += 1
        state.update((sorted(seen), bytes_total))
        if idle_evict_ms is not None:
            state.setTimeoutDuration(idle_evict_ms)
        yield pd.DataFrame(
            {
                "container": [container],
                "files_seen": [len(seen)],
                "bytes_total": [bytes_total],
                "new_in_batch": [new],
            }
        )

    return update_ledger


def upload_ledger(stream: DataFrame, idle_evict_ms: int | None = IDLE_EVICT_MS) -> DataFrame:
    """Per-container upload ledger over a (container, name, bytes) stream.

    ``idle_evict_ms``: evict state for containers idle this long (needs a
    processingTime trigger); ``None`` disables eviction — required for
    ``availableNow`` drain jobs, whose lifetime is bounded anyway.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_evict_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return stream.groupBy("container").applyInPandasWithState(
        _make_update_fn(idle_evict_ms),
        outputStructType=LEDGER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
