"""Round-11 ``sim_knn_graph_multiprobe`` laws.

Monotonicity: the level-1 probe set (own cell + all b Hamming-1 prefix
cells) is a superset of the level-0 set by construction, so its top-3
candidates can only improve — recall@3 never decreases.  Sanity: both
rows measure the same truth set, recall is a valid micro-fraction, and
the probing actually buys recall on the fixture (the docstring's
"measured recall lift" claim).
"""

from __future__ import annotations

from cassandra_syncer_spark.registry import REGISTRY, all_queries


def test_multiprobe_recall_monotone_and_measured_lift(spark, sf_dir):
    all_queries()
    rows = {
        r.n_flip: r
        for r in REGISTRY["sim_knn_graph_multiprobe"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1}
    r0, r1 = rows[0], rows[1]
    assert r0.n_expected == r1.n_expected > 0
    for r in (r0, r1):
        assert 0 <= r.n_hits <= r.n_expected
        assert 0 <= r.recall_micro <= 1_000_000
    # monotone law (superset candidates)
    assert r1.n_hits >= r0.n_hits
    assert r1.recall_micro >= r0.recall_micro
    # the lever must buy recall on the fixture corpus (measured: ~0.24 ->
    # ~0.69 at sf0.001; a zero lift would mean the probe fan-out is wired
    # to the wrong cells)
    assert r1.n_hits > r0.n_hits
