"""Skew-mitigation: salted join for hot keys.

At 100 TB a handful of hot keys (a viral user_id, an empty-string etag) can
pin an entire shuffle on one task.  AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``, on by default in session.py) handles
sort-merge cases at runtime; this operator is the explicit fallback for
shapes AQE can't split — e.g. a shuffled hash aggregation on a hot key, or
joins through a custom operator.

Mechanics: replicate the *small* side SALT ways, scatter the big side's hot
rows uniformly across the salt space, join on (key, salt).  Row multiplicity
is preserved exactly (each big-side row joins exactly one replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join robust to hot keys in ``big``.

    ``big`` gets a uniform pseudo-random salt hashed from row content
    (``xxhash64`` over ``salt_cols``, default: every hashable column) — a
    pure function of the row, so retried tasks, re-shuffled inputs, and
    re-runs all assign the same salt regardless of partitioning or row
    order (``rand()`` and ``monotonically_increasing_id`` both break that
    property).  Map-typed columns are excluded automatically (``xxhash64``
    rejects them).  ``small`` is exploded SALT ways.  Shuffle key becomes
    (on, salt): a hot key spreads over ``salt`` tasks instead of one.

    Known tradeoff of deterministic content salting: BYTE-IDENTICAL
    duplicate rows of a hot key necessarily share one salt (any pure
    function of content maps equal rows together), so a corpus that is
    both skewed AND exact-duplicated should run ``dedup_exact`` first or
    pass ``salt_cols`` naming a distinguishing column; non-identical hot
    rows spread uniformly.

    Only inner/left_semi/left supported: those preserve multiplicity under
    small-side replication (an unmatched small row would otherwise surface
    ``salt`` times in right/full joins).
    """
    if how not in ("inner", "left", "left_semi", "leftsemi"):
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how!r}")
    from pyspark.sql.types import MapType

    if salt_cols is None:
        salt_cols = [
            f.name for f in big.schema.fields if not isinstance(f.dataType, MapType)
        ]
    if not salt_cols:
        raise ValueError("salted_join: no hashable columns to derive the salt from")
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt))
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_exploded, [on, "__salt"], how)
    return out.drop("__salt")
