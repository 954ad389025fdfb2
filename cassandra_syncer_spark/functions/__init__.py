"""Reusable expression builders (the engine's scalar-function layer).

Everything here produces built-in Spark SQL expressions (JVM-side,
codegen-eligible) — the portable fingerprint hashes double as the DuckDB
oracle formulas.
"""

from cassandra_syncer_spark.operators.fingerprint import (
    band_key_expr,
    hash32,
    hash_array_expr,
    minhash_expr,
    shingle_hash_array,
    shingles_expr,
    simhash16_expr,
    words_expr,
)

__all__ = [
    "band_key_expr",
    "hash32",
    "hash_array_expr",
    "minhash_expr",
    "shingle_hash_array",
    "shingles_expr",
    "simhash16_expr",
    "words_expr",
]
