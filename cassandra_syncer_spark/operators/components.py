"""Connected components over candidate-pair graphs — dedup clustering.

Near-dup detection (MinHash/SimHash banding) yields candidate *pairs*;
what a training-data pipeline actually needs is the *cluster*: every
transitive group of near-duplicates, with one canonical representative to
keep.  That is connected components on the pair graph.

Algorithm: min-label propagation — every vertex starts labeled with its
own id; each round it takes the min of its label and its neighbors'
labels; fixpoint = components labeled by their minimum member id.  This is
the standard distributed-CC shape (GraphX/GraphFrames do the same loop):
each round is one equi-join + one aggregation, and the round count is
bounded by the component *diameter*, not the graph size.  Near-dup
clusters are shallow (duplicates of a common source connect densely), so
a handful of rounds suffice even at corpus scale; pathological chain
graphs are the documented worst case (use the large-star/small-star
variant if those arise).

Driver involvement is one scalar aggregate per round (the convergence
check) — iteration control, not data movement.  ``localCheckpoint``
truncates lineage each round so plan size stays constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComponentsNotConverged(RuntimeError):
    """min-label propagation hit ``max_iterations`` before fixpoint — the
    returned labels would be silently unmerged (e.g. a chain-shaped
    component with diameter > max_iterations).  Carries ``labels`` (the
    partial result) for callers that want to resume or inspect."""

    def __init__(self, max_iterations: int, labels: DataFrame):
        super().__init__(
            f"connected_components did not converge within {max_iterations} "
            "iterations; component diameter exceeds the round budget — raise "
            "max_iterations or switch to a large-star/small-star variant"
        )
        self.labels = labels


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns one row per vertex: ``(id, component)`` where component is the
    minimum vertex id reachable from ``id``.  Vertices are exactly the ids
    appearing in edges (isolated documents are not dedup concerns).

    Raises :class:`ComponentsNotConverged` if fixpoint is not reached
    within ``max_iterations`` — never returns silently-unmerged labels.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()  # reused every round — materialize once
    )
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    prev_sum = None
    converged = False
    # max_iterations bounds label-CHANGING rounds; fixpoint is only
    # observable as a round that changes nothing, so one extra
    # confirmation round is allowed — a graph converging exactly on round
    # max_iterations must not raise
    for _ in range(max_iterations + 1):
        neigh = (
            sym.join(labels, sym["b"] == labels["id"])
            .select(sym["a"].alias("id"), F.col("comp").alias("ncomp"))
            .groupBy("id")
            .agg(F.min("ncomp").alias("ncomp"))
        )
        labels = (
            labels.join(neigh, "id", "left")
            .select("id", F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"))
            .localCheckpoint()
        )
        # min-label sums strictly decrease until fixpoint — one scalar per
        # round is the whole driver-side footprint
        cur_sum = labels.agg(F.sum("comp")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise ComponentsNotConverged(max_iterations, labels)
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def incremental_components(
    prev_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Fold a NEW batch of edges into an existing component labeling —
    the steady-state companion to :func:`connected_components` the same
    way the band-index probe is to full-corpus dedup: yesterday's
    clusters are not recomputed, they are *merged with* today's pairs.

    The trick is that a labeling IS a star graph: each labeled vertex
    has an implicit edge to its component's minimum member.  Running
    min-label propagation on (star edges ∪ new edges) therefore yields
    exactly the components of (all old edges ∪ new edges) — old
    components act as super-nodes of diameter ≤ 2, so convergence cost
    tracks the NEW structure's diameter, not the accumulated graph's
    edge count.  Old edges never need to be stored or re-read.

    Invariant (unit-tested): incremental over any wave split ==
    one-shot components over the union of all edges.
    """
    star = prev_labels.select(
        F.col("id").alias(src), F.col("component").alias(dst)
    ).filter(F.col(src) != F.col(dst))
    # singleton components (id == component, no distinct member edge)
    # must survive the merge even if no new edge touches them; a
    # self-loop-free star drops them, so re-seed via a self edge that
    # the symmetrize step dedups
    singles = prev_labels.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(src), F.col("component").alias(dst)
    )
    merged = star.unionByName(singles).unionByName(
        new_edges.select(F.col(src), F.col(dst))
    )
    return connected_components(
        merged, src=src, dst=dst, max_iterations=max_iterations
    )
