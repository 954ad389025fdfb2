"""Round-11 corpus-derived band geometry (operators/adaptive_bands.py).

Four laws:
1. the Manku block-combination masks keep EXACT recall at their design
   radius — every pair within Hamming k shares a mask key (pigeonhole),
   under both the narrow and the wide geometry (randomized sweep);
2. ``dedup_simhash`` output is geometry-INVARIANT — forcing the wide
   geometry at driver scale reproduces the default output bit-for-bit
   (candidates change, the Hamming<=3 result cannot);
3. ``dedup_embed_simhash`` stays in Spark<->DuckDB lockstep under the
   FORCED wide geometry (its 7..16 Hamming shell is geometry-dependent,
   so the oracle must embed identical masks — this is the sf1+ regime
   exercised at test scale);
4. ``sim_hamming_ann``'s banded short-circuit is exact: on a dup-dense
   corpus where probes saturate (>=5 neighbors within Hamming 6) the
   adaptive plan must return exactly the brute-force top-5 — on both
   sides of the corpus-count gate that keeps small corpora (where the
   banding pass is pure stage overhead) on the plain brute plan.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cassandra_syncer_spark.operators import adaptive_bands as ab


def _flip_bits(x: int, total_bits: int, k: int, rng: random.Random) -> int:
    for pos in rng.sample(range(total_bits), k):
        x ^= 1 << pos
    return x


@pytest.mark.parametrize(
    "masks,total_bits,radius",
    [
        (ab.DOC_NARROW, 32, 3),
        (ab.DOC_WIDE, 32, 3),
        (ab.EMB_NARROW, 63, 6),
        (ab.EMB_WIDE, 63, 6),
    ],
)
def test_pigeonhole_exact_recall_at_design_radius(masks, total_bits, radius):
    """Any pair within the design Hamming radius must share at least one
    (mask, sig & mask) key — the recall guarantee every banded query
    relies on.  Randomized over signatures and flip counts 0..radius."""
    rng = random.Random(11)
    for _ in range(2000):
        a = rng.getrandbits(total_bits)
        b = _flip_bits(a, total_bits, rng.randint(0, radius), rng)
        assert any((a & m) == (b & m) for m in masks), (hex(a), hex(b))


def test_mask_geometry_shapes():
    """Geometry sanity: table counts and key widths match the design
    (4x8-bit / 56x20-bit for the 32-bit doc simhash; 7x9-bit / 84x21-bit
    for the 63-bit sign code), and every mask stays inside the signature
    width (no sign-bit overflow on BIGINT)."""
    assert len(ab.DOC_NARROW) == 4 and len(ab.DOC_WIDE) == 56
    assert len(ab.EMB_NARROW) == 7 and len(ab.EMB_WIDE) == 84
    assert all(bin(m).count("1") == 8 for m in ab.DOC_NARROW)
    assert all(bin(m).count("1") == 20 for m in ab.DOC_WIDE)
    assert all(bin(m).count("1") == 9 for m in ab.EMB_NARROW)
    assert all(bin(m).count("1") == 21 for m in ab.EMB_WIDE)
    assert all(0 < m < (1 << 32) for m in ab.DOC_NARROW + ab.DOC_WIDE)
    assert all(0 < m < (1 << 63) for m in ab.EMB_NARROW + ab.EMB_WIDE)


def test_dedup_simhash_output_geometry_invariant(spark, sf_dir, monkeypatch):
    """Forcing the WIDE document geometry at driver scale must reproduce
    the default output exactly — the Hamming<=3 cut sits inside both
    geometries' exact-recall radius, so only candidate volume may differ.
    (The Spark side reads the geometry constants at call time, so the
    threshold is monkeypatchable; the oracle is irrelevant here — this is
    a Spark-vs-Spark identity.)"""
    from cassandra_syncer_spark.queries.llm_dedup import dedup_simhash

    base = sorted(map(tuple, dedup_simhash(spark, sf_dir).collect()))
    monkeypatch.setattr(ab, "DOC_THRESHOLD", 0)  # always-wide
    wide = sorted(map(tuple, dedup_simhash(spark, sf_dir).collect()))
    assert base == wide
    monkeypatch.setattr(ab, "DOC_THRESHOLD", 10**12)  # always-narrow
    narrow = sorted(map(tuple, dedup_simhash(spark, sf_dir).collect()))
    assert base == narrow


def test_embed_simhash_wide_geometry_lockstep(spark, sf_dir, duck, monkeypatch):
    """dedup_embed_simhash under the FORCED wide geometry (the sf1+
    regime) must still match a DuckDB oracle built with the same forced
    masks — the geometry-dependent 7..16 shell stays in lockstep because
    both engines evaluate identical mask literals."""
    import sys

    sys.path.insert(0, "tests")
    from test_oracle_parity import _assert_frames_match

    from cassandra_syncer_spark.queries.analytics_r5e import (
        _CODE_DUCK,
        _EMB_HAMMING_MAX,
        dedup_embed_simhash,
    )

    monkeypatch.setattr(ab, "EMB_THRESHOLD", 0)  # always-wide, both sides
    spdf = dedup_embed_simhash(spark, sf_dir).toPandas()
    g_case = ab.geometry_case(ab.EMB_NARROW, ab.EMB_WIDE, 0, duck=True)
    oracle = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id, v, {_CODE_DUCK} AS code FROM e),
    g AS (SELECT {g_case} AS masks FROM embeddings),
    bands0 AS (SELECT vec_id, v, code, unnest(g.masks) AS band_id FROM c, g),
    bands AS (SELECT vec_id, v, code, band_id, code & band_id AS band_val FROM bands0),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(bit_count(xor(a.code, b.code)) AS BIGINT) AS hamming,
             round(list_inner_product(a.v, b.v), 4) AS cosine
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.vec_id < b.vec_id
      WHERE bit_count(xor(a.code, b.code)) <= {_EMB_HAMMING_MAX}
    )
    SELECT vec_a, vec_b, hamming, cosine FROM cand ORDER BY vec_a, vec_b
    """
    duck_pdf = duck.execute(oracle).fetchdf()
    _assert_frames_match("dedup_embed_simhash[wide]", spdf, duck_pdf)


def _write_dup_dense_embeddings(spark, out_dir: str) -> None:
    """150 vectors, 64 dims: probe 0 gets six near-identical neighbors
    (vec_ids 1..6, one sign flipped each), probe 100 gets none — so the
    adaptive plan must take BOTH legs (short-circuit for 0, brute
    fallback for 100)."""
    rng = random.Random(7)
    rows = []
    base = [rng.choice([-1.0, 1.0]) for _ in range(64)]
    for vid in range(150):
        if 1 <= vid <= 6:
            v = list(base)
            v[vid] = -v[vid]  # Hamming 1 from vec 0's code
        elif vid == 0:
            v = list(base)
        else:
            v = [rng.choice([-1.0, 1.0]) for _ in range(64)]
        rows.append((vid, [x * 0.125 for x in v], "t"))
    spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


@pytest.mark.parametrize("force_adaptive", [False, True])
def test_hamming_ann_short_circuit_exact(
    spark, tmp_path, monkeypatch, force_adaptive
):
    """On a dup-dense corpus where probe 0 saturates (6 neighbors within
    Hamming 6) and probe 100 does not, sim_hamming_ann must equal the
    brute-force reference exactly on BOTH sides of the corpus-count
    gate: default threshold (150 < 16384 → the pure-brute small-corpus
    plan) and forced-zero threshold (wide geometry + banded
    short-circuit + brute fallback all live, both legs exercised since
    probe 0 saturates and probe 100 does not)."""
    from cassandra_syncer_spark.queries.analytics_r5c import sim_hamming_ann

    sf = str(tmp_path)
    _write_dup_dense_embeddings(spark, sf)
    if force_adaptive:
        monkeypatch.setattr(ab, "EMB_THRESHOLD", 0)
    got = sorted(map(tuple, sim_hamming_ann(spark, sf).collect()))

    # brute reference, computed independently
    from cassandra_syncer_spark.queries.relational import T
    from pyspark.sql.window import Window

    code = F.expr(
        "aggregate(sequence(0, 62), 0L,"
        " (acc, i) -> acc + IF(element_at(v, i + 1) > 0D, shiftleft(1L, i), 0L))"
    )
    c = (
        T(spark, sf, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .select("vec_id", code.alias("code"))
    )
    probes = c.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("code").alias("pcode")
    )
    w = Window.partitionBy("probe_id").orderBy("hamming", "vec_id")
    want = sorted(
        map(
            tuple,
            probes.join(c, F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id",
                "vec_id",
                F.bit_count(F.expr("pcode ^ code")).cast("long").alias("hamming"),
            )
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 5)
            .collect(),
        )
    )
    assert got == want
    # the construction itself: probe 0's top-5 all within Hamming 6
    top0 = [r for r in got if r[0] == 0]
    assert len(top0) == 5 and all(r[2] <= 6 for r in top0)
