"""Corpus-derived SimHash band geometry — the fixed-width-band scale fix.

Fixed-width LSH banding has a chance-collision term ~ tables * N^2 / 2^w
(w = band key bits): at 100x the corpus the candidate join's false-pair
volume grows 100x faster than the true pairs — the alpha>1 residual
SCALING.md measured for ``dedup_simhash``/``dedup_embed_simhash`` at sf10.
Simply widening disjoint bands is impossible: the pigeonhole recall
guarantee at Hamming radius k needs >= k+1 bands, so a fixed f-bit
fingerprint caps disjoint bands at f/(k+1) bits.  The classic escape
(Manku, Jain & Das Sarma, WWW'07 "Detecting Near-Duplicates for Web
Crawling", Sec. 3 — public paper, no reference-repo counterpart) trades
TABLE COUNT for BAND WIDTH: split the f bits into nb blocks and key one
table on every (nb-k)-subset of blocks.  Any pair within Hamming k differs
in <= k blocks, hence agrees on >= nb-k blocks, hence agrees on at least
one keyed subset — recall at radius k stays EXACT while the per-table key
grows from f/nb to f*(nb-k)/nb bits.

A table key here is simply ``sig & mask`` (mask = OR of the subset's block
masks): two signatures agree on every selected block iff their masked
values are equal, so the banded self-join keys on ``(mask, sig & mask)``
with no bit repacking.

The geometry is CORPUS-DERIVED: a 1-row count aggregate (the
``sim_knn_graph_ivf`` cell-width / ``dedup_banding_recall`` probe-modulus
idiom — broadcast, never collected) selects the cheap disjoint geometry
below the threshold and the wide combination geometry above it, returning
band-bucket occupancy to ~constant as the corpus grows.  Both engines
(Spark SQL and the DuckDB oracle) receive the same literal mask arrays and
the same integer threshold comparison, so candidate sets stay in lockstep
at every scale factor.

Cost model behind the thresholds (T tables, w-bit keys, corpus N):
banding rows = T*N, chance pairs ~ T * N^2 / 2^(w+1).  The wide geometry
wins once the narrow geometry's chance-pair term passes the wide
geometry's table fan-out — ~7k docs for the 32-bit document simhash,
~12k vectors for the 63-bit embedding sign code; thresholds sit just
below the crossovers (6144 / 16384), so every corpus pays whichever
geometry is cheaper FOR IT (round 11 initially pinned DOC_THRESHOLD at
4096 to push the wide path into the sf0.1 parity artifact, which tripled
dedup_simhash at driver scale for no recall gain; the wide paths are now
artifact-proven instead by the 10x-replica parity sweep
``PARITY_SF1_r11.json`` — 50k docs / 20k vectors, both wide geometries
live — so driver scale keeps the narrow plan it should have).
"""

from __future__ import annotations

from itertools import combinations


def combo_masks(n_blocks: int, block_bits: int, agree_blocks: int) -> list[int]:
    """All C(n_blocks, agree_blocks) bit masks, each selecting
    ``agree_blocks`` whole blocks of ``block_bits`` bits.  Exact recall at
    Hamming radius ``n_blocks - agree_blocks``."""
    block = (1 << block_bits) - 1
    return [
        sum(block << (block_bits * b) for b in combo)
        for combo in combinations(range(n_blocks), agree_blocks)
    ]


#: 32-bit document SimHash, Hamming cut 3 (llm_dedup.dedup_simhash):
#:  narrow — 4 disjoint bytes (4 tables, 8-bit keys), exact at k=3;
#:  wide   — 8 nibbles choose 5 (56 tables, 20-bit keys), exact at k=3.
#: Output is geometry-INVARIANT: both geometries guarantee every
#: Hamming<=3 pair a shared key, and the final cut keeps only those.
DOC_NARROW: list[int] = combo_masks(4, 8, 1)
DOC_WIDE: list[int] = combo_masks(8, 4, 5)
DOC_THRESHOLD = 6144

#: 63-bit embedding sign code, pigeonhole guarantee radius 6
#: (analytics_r5e.dedup_embed_simhash / analytics_r5c.sim_hamming_ann):
#:  narrow — 7 disjoint 9-bit blocks (7 tables), the round-5 geometry;
#:  wide   — 9 blocks of 7 bits choose 3 (84 tables, 21-bit keys).
#: Recall at Hamming<=6 is exact under BOTH; above 6 it is probabilistic
#: and geometry-dependent, so queries whose output includes the 7..16
#: shell keep their oracle in lockstep via the same literals.
EMB_NARROW: list[int] = combo_masks(7, 9, 1)
EMB_WIDE: list[int] = combo_masks(9, 7, 3)
EMB_THRESHOLD = 16384


def _mask_array(masks: list[int], duck: bool) -> str:
    if duck:
        return "[" + ", ".join(f"CAST({m} AS BIGINT)" for m in masks) + "]"
    return "array(" + ", ".join(f"{m}L" for m in masks) + ")"


def geometry_case(
    narrow: list[int], wide: list[int], threshold: int, duck: bool
) -> str:
    """``CASE WHEN count(*) >= threshold THEN wide ELSE narrow END`` — the
    body of the 1-row geometry aggregate, identical arithmetic in both
    dialects."""
    return (
        f"CASE WHEN count(*) >= {threshold} THEN {_mask_array(wide, duck)} "
        f"ELSE {_mask_array(narrow, duck)} END"
    )


def bands_cte(
    sig_rel: str, id_col: str, sig_col: str, duck: bool
) -> str:
    """Band rows from ``sig_rel(id_col, sig_col)`` x the 1-row geometry
    relation ``g(masks)``: one row per (signature row, mask), keyed on
    ``(band_id = mask, band_val = sig & mask)``.  Spark plans the explode
    scan-fused after a broadcast of g; DuckDB needs the two-step unnest
    (the unnest alias is not referenceable in its own SELECT)."""
    if duck:
        return (
            f"bands0 AS (SELECT {id_col}, {sig_col}, unnest(g.masks) AS band_id "
            f"FROM {sig_rel}, g), "
            f"bands AS (SELECT {id_col}, {sig_col}, band_id, "
            f"{sig_col} & band_id AS band_val FROM bands0)"
        )
    return (
        f"bands AS (SELECT {id_col}, {sig_col}, band_id, "
        f"{sig_col} & band_id AS band_val "
        f"FROM {sig_rel} CROSS JOIN g LATERAL VIEW explode(g.masks) mt AS band_id)"
    )
