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
from pyspark.sql.window import Window


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


def salted_self_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    cap: int = 10_000,
) -> DataFrame:
    """All unordered within-bucket id pairs — the LSH-band pair expansion —
    with NO task ever owning a whole hot bucket.

    The plain bucket-local self-join (``_minhash_pairs``/``dedup_simhash``)
    already avoids collect_list's unbounded array row, but a single
    pathological bucket (an empty-string band key, a boilerplate page
    duplicated 10M times) still lands its entire size² pair expansion on
    one join task.  This operator is the documented cap rule for that
    tail:

    - every bucket learns its size via a window count (same shuffle key
      as the pair join, so the exchange is reused, and the per-bucket
      work is linear — no pair blow-up in the sizing pass);
    - rows get ``S = ceil(size / cap)`` salt groups, ``g = hash(id) % S``;
      buckets at-or-under ``cap`` take ``S = 1`` and DEGENERATE to the
      plain self-join — the salting path costs nothing when skew is absent;
    - pair cells (i ≤ j) tile the bucket: a row salted ``g`` replicates as
      the A-side of cells ``(g, j≥g)`` and the B-side of cells ``(i≤g, g)``,
      so each cross-salt pair materializes in exactly ONE cell and the
      same-salt cell ``(g, g)`` orders by id — exact pair-set equality with
      the plain join (tests/test_operators.py asserts it);
    - per-cell work is ≤ ~cap², per-row replication is S ≈ size/cap —
      total comparisons unchanged, spread over ~S²/2 tasks instead of 1.

    Returns one row per (bucket, unordered pair): key_cols + doc_a/doc_b
    (doc_a < doc_b).
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    sized = (
        df.select(*key_cols, F.col(id_col).alias("__id"))
        .withColumn("__sn", F.ceil(F.count(F.lit(1)).over(w) / cap).cast("int"))
        .withColumn("__g", F.pmod(F.xxhash64("__id"), F.col("__sn")).cast("int"))
    )
    lft = sized.withColumn(
        "__j", F.explode(F.expr("sequence(__g, __sn - 1)"))
    ).select(*key_cols, F.col("__id").alias("__ida"), F.col("__g").alias("__i"), "__j")
    rgt = sized.withColumn(
        "__i", F.explode(F.expr("sequence(0, __g)"))
    ).select(*key_cols, F.col("__id").alias("__idb"), "__i", F.col("__g").alias("__j"))
    cond = (F.col("a.__i") == F.col("b.__i")) & (F.col("a.__j") == F.col("b.__j"))
    for c in key_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # cross-salt cells (i < j) take every A×B pair; the diagonal cell
    # orders by id so each same-salt pair appears once
    cond = cond & (
        (F.col("a.__i") < F.col("a.__j")) | (F.col("a.__ida") < F.col("b.__idb"))
    )
    return (
        lft.alias("a")
        .join(rgt.alias("b"), cond)
        .select(
            *[F.col(f"a.{c}").alias(c) for c in key_cols],
            F.least("a.__ida", "b.__idb").alias("doc_a"),
            F.greatest("a.__ida", "b.__idb").alias("doc_b"),
        )
    )
