"""Document fingerprinting expression builders — shared between the Spark
queries and their DuckDB oracles so both engines evaluate the *same*
deterministic formulas.

The common 32-bit hash is the first 8 hex chars of md5 (both engines ship
md5; Spark's xxhash64/hash are JVM-specific and DuckDB's hash() differs, so
md5 is the only portable integer hash).  Everything here is built-in
higher-order expressions — JVM-side in Spark, vectorized in DuckDB; no
Python UDFs.

Operators:
- ``hash32``        — portable 32-bit integer hash of a string expression
- ``shingles``      — 3-word sliding shingles over a word array
- ``minhash_sig``   — k-perm MinHash signature (universal hashing over one
  base hash32 per shingle)
- ``simhash_expr``  — 32-bit SimHash over the shingle set (SIMHASH_BITS)

MinHash/LSH banding parameters for 100 TB (why these defaults): with
NUM_PERMS=8 and 4 bands of 2 rows, the candidate-pair probability is
1-(1-j^2)^4 — ~0.66 at Jaccard 0.5, ~0.031 at Jaccard 0.1 — tuned to
surface near-dups while keeping bucket skew bounded; at petabyte corpus
sizes raise perms to 128/16 bands and add a bucket-size cap (salting
oversized buckets) before the pair join.
"""

from __future__ import annotations

NUM_PERMS = 8
BANDS = 4
ROWS_PER_BAND = NUM_PERMS // BANDS
SIMHASH_BITS = 32


def hash32(col: str, *, duck: bool) -> str:
    if duck:
        return f"CAST(CAST(concat('0x', substr(md5({col}), 1, 8)) AS UBIGINT) AS BIGINT)"
    return f"cast(conv(substr(md5({col}), 1, 8), 16, 10) as bigint)"


def words_expr(text_col: str, *, duck: bool) -> str:
    if duck:
        return f"string_split({text_col}, ' ')"
    return f"split({text_col}, ' ')"


def shingles_expr(words: str, *, duck: bool) -> str:
    """3-word shingles; for texts under 3 words, one (padded) shingle.

    Spark side must use ``get()`` — ANSI bracket indexing throws
    INVALID_ARRAY_INDEX past the end for sub-3-word docs, while DuckDB's
    1-based ``[i]`` returns NULL there; ``get()`` matches that (NULL on
    out-of-bounds) and ``concat_ws`` skips NULLs identically on both
    engines, so the padded shingle is byte-identical."""
    if duck:
        return (
            f"list_transform(range(1, greatest(len({words}) - 2, 1) + 1), "
            f"i -> concat_ws(' ', {words}[i], {words}[i+1], {words}[i+2]))"
        )
    return (
        f"transform(sequence(1, greatest(size({words}) - 2, 1)), "
        f"i -> concat_ws(' ', get({words}, i-1), get({words}, i), get({words}, i+1)))"
    )


# universal-hash permutation constants: h_j(x) = (A[j]*h(x) + B[j]) mod P.
# A values stay < 2^20 so A*h < 2^52 — exact in 64-bit integers (and in
# doubles) on both engines.  One md5 per shingle total, not one per perm.
PERM_P = 4294967291  # largest prime < 2^32
PERM_A = [3, 5, 7, 11, 13, 17, 19, 23]
PERM_B = [101, 211, 307, 401, 503, 601, 701, 809]


def shingle_hash_array(shingles: str, *, duck: bool) -> str:
    """One base hash32 per shingle — the only md5 cost of the signature."""
    h = hash32("s", duck=duck)
    if duck:
        return f"list_transform({shingles}, s -> {h})"
    return f"transform({shingles}, s -> {h})"


def minhash_expr(hash_arr: str, perm: int, *, duck: bool) -> str:
    """MinHash for permutation ``perm`` over a base-hash array."""
    a, b = PERM_A[perm], PERM_B[perm]
    if duck:
        return f"list_min(list_transform({hash_arr}, h -> ({a} * h + {b}) % {PERM_P}))"
    return f"array_min(transform({hash_arr}, h -> ({a} * h + {b}) % {PERM_P}))"


def band_key_expr(minhash_cols: list[str], band: int, *, duck: bool) -> str:
    """Band key = md5 over the band's signature rows (same value both engines;
    the cast type name differs: VARCHAR vs STRING)."""
    t = "VARCHAR" if duck else "STRING"
    cols = minhash_cols[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
    joined = ", '_', ".join(f"CAST({c} AS {t})" for c in cols)
    return f"md5(concat({joined}))"


def hash_array_expr(uwords: str, *, duck: bool) -> str:
    """Array of hash32 values for an array-of-strings expression."""
    h = hash32("w", duck=duck)
    if duck:
        return f"list_transform({uwords}, w -> {h})"
    return f"transform({uwords}, w -> {h})"


def simhash_expr(harr: str, *, duck: bool) -> str:
    """32-bit SimHash over a pre-projected hash array column ``harr``:
    bit b set iff the majority of hashes have bit b set.

    32 bits (not 16): band buckets must stay small — with 4 bands of 8
    bits each band has 256 buckets, so bucket size ~ corpus/256 per band
    and the verify join stays near-linear; 4-bit nibble bands measured 19 s
    at sf0.1 from quadratic bucket pairs."""
    if duck:
        size_f, filter_f, div = "len", "list_filter", "//"
    else:
        size_f, filter_f, div = "size", "filter", "div"
    terms = []
    for b in range(SIMHASH_BITS):
        p = 2**b
        ones = f"{size_f}({filter_f}({harr}, x -> (x {div} {p}) % 2 = 1))"
        terms.append(f"(CASE WHEN 2 * {ones} > {size_f}({harr}) THEN {2**b} ELSE 0 END)")
    return " + ".join(terms)
