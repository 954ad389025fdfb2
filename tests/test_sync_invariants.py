"""Hypothesis property tests: SyncPipeline invariants over randomized
file/manifest fixtures (SURVEY.md §5.4).

Invariants (the reference's implicit contract):
- restore plan names ⊆ latest manifest's paths, exactly (minimum set);
- prunable ∩ latest-manifest-referenced = ∅ (restorability is never broken);
- upload plan never contains temp files or already-stored (name, etag) pairs;
- build_manifest is idempotent and excludes temp files.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_syncer_spark.sync import FILE_SCHEMA, MANIFEST_SCHEMA, SyncPipeline

NAMES = st.sampled_from([f"ks/{c}-Data.db" for c in "abcdefgh"] + ["ks/x-tmp-Data.db"])
CONTAINERS = st.sampled_from(["c1", "c2"])


@st.composite
def fixtures(draw):
    files = draw(
        st.lists(
            st.tuples(NAMES, CONTAINERS, st.integers(1, 1000), st.sampled_from(["e1", "e2", "e3"])),
            min_size=0, max_size=12, unique_by=lambda t: (t[0], t[1]),
        )
    )
    manifests = draw(
        st.lists(
            st.tuples(
                st.integers(1, 10_000),
                CONTAINERS,
                st.lists(NAMES, min_size=0, max_size=6, unique=True),
            ),
            min_size=0, max_size=6,
        )
    )
    return files, manifests


@given(fixtures())
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_pipeline_invariants(spark, fx):
    files_raw, manifests_raw = fx
    p = SyncPipeline()
    ts0 = dt.datetime(2024, 1, 1)
    files = spark.createDataFrame(
        [
            (n, c, b, e, ts0, "db", "-tmp" in n)
            for n, c, b, e in files_raw
        ],
        FILE_SCHEMA,
    )
    manifests = spark.createDataFrame(
        [(ts, c, paths) for ts, c, paths in manifests_raw], MANIFEST_SCHEMA
    )

    # upload plan: no temp files; nothing already stored under same (name, etag)
    plan = p.plan_upload(files, files).collect()
    assert plan == []  # everything local is "already stored" when remote==local
    empty_remote = spark.createDataFrame([], FILE_SCHEMA)
    plan2 = {r.name for r in p.plan_upload(files, empty_remote).collect()}
    assert all("-tmp" not in n for n in plan2)

    # manifest: idempotent, sorted, temp-free
    m1 = sorted(map(str, p.build_manifest(files, 99).collect()))
    m2 = sorted(map(str, p.build_manifest(files, 99).collect()))
    assert m1 == m2

    if manifests_raw:
        latest = {
            r.container: set(r.paths) for r in p.latest_manifests(manifests).collect()
        }
        # restore plan ⊆ latest manifest paths, per container, exactly
        got = {}
        for r in p.restore_plan(manifests, files).collect():
            got.setdefault(r.container, set()).add(r.name)
        assert got == {c: ps for c, ps in latest.items() if ps}

        # prune never touches anything the latest manifest references
        prunable = p.prune_plan(
            manifests, files, now_ms=10_000_000, older_than_ms=1
        ).collect()
        for r in prunable:
            assert r.name not in latest.get(r.container, set())
