"""Per-invocation staging/checkpoint directories for queries that round-trip
through a file source (text/json staging, streaming checkpoints).

Round-8 ADVICE: keying these dirs by ``os.getpid()`` alone collides when two
SparkSessions share a process and accumulates leftovers after crashes.  Here
every invocation gets a fresh ``uuid4``-keyed dir, and stale siblings of the
same label (older than an hour — no live invocation stages that long) are
swept eagerly so /tmp stays bounded without racing a concurrent session.

Cluster note: /tmp staging is local-mode plumbing for the oracle-checked
round-trip queries; a multi-node deployment passes a shared-filesystem
``base`` (the functions take it as a parameter) — the dataflow is identical.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time
import uuid

_STALE_S = 3600  # sweep siblings older than an hour


def unique_token() -> str:
    """A fresh 12-hex token — keys staging dirs AND memory-sink queryNames
    so two sessions in one process can never collide."""
    return uuid.uuid4().hex[:12]


def stage_dir(label: str, token: str, base: str | None = None) -> str:
    """Return a unique, not-yet-created staging path ``css_<label>_<token>``
    under ``base`` (default: the system temp dir), sweeping hour-stale
    siblings of the same label first."""
    root = base or tempfile.gettempdir()
    now = time.time()
    for old in glob.glob(os.path.join(root, f"css_{label}_*")):
        try:
            if now - os.path.getmtime(old) > _STALE_S:
                shutil.rmtree(old, ignore_errors=True)
        except OSError:
            continue
    return os.path.join(root, f"css_{label}_{token}")


def cleanup(*paths: str) -> None:
    """Best-effort removal once a staged round-trip has fully drained
    (i.e. the remaining plan no longer reads from the staging files)."""
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
