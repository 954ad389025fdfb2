#!/usr/bin/env python
"""Build an N× replica of sf0.1 for scale-up measurements (SCALING.md).

Each fact table is the union of N key-shifted copies (keys offset by
i*STEP so joins and windows see N× the key space, not N× duplicates of
one key); dimension tables (region/nation/supplier/part) are shared, as
they would be at any scale.  documents/embeddings replicate with shifted
ids but identical content — deliberately: near-dup operators then face a
corpus whose true duplicate count grows with the replica factor, the
adversarial case for banding.

Run:  python scripts/make_replica.py [N] [OUT_DIR] [--unique-docs]
      (defaults: 10 /tmp/sf1_replica)
Then: SPARK_GRAFT_SF_DIR=/tmp/sf1_replica python bench.py

``--unique-docs`` is the CONTROLLED-DUP-DENSITY variant: each document
copy interleaves a per-copy token between every word, so every 3-word
shingle contains the copy marker — shingle sets are disjoint across
copies, no cross-copy near-dup pairs exist, and the true-dup density per
corpus stays constant at the sf0.1 level while the corpus grows N×.
Comparing dedup timings on the identical-copy replica (dup pairs grow
~N²·|group|) vs this one separates "the operator scales badly" from "the
replica contains quadratically more real duplicates" (SCALING.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STEP = 100_000_000


def main() -> None:
    # flags may appear anywhere; positionals are [N] [OUT_DIR] in order
    # (a naive sys.argv[3:] check would misparse `10 --unique-docs` as an
    # output directory named '--unique-docs' and silently drop the flag)
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    tables_flags = {a for a in flags if a.startswith("--tables=")}
    unknown = flags - {"--unique-docs"} - tables_flags
    if unknown:
        raise SystemExit(f"unknown flag(s): {sorted(unknown)}")
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(pos[0]) if pos else 10
    out = pos[1] if len(pos) > 1 else "/tmp/sf1_replica"
    unique_docs = "--unique-docs" in flags
    # --tables=a,b regenerates only those tables into an existing replica
    # dir (e.g. after a perturbation fix) without rebuilding the rest
    if len(tables_flags) > 1:
        raise SystemExit(
            f"pass --tables= at most once (got {sorted(tables_flags)}); "
            "multiple flags would silently use an arbitrary one"
        )
    only_tables = None
    if tables_flags:
        only_tables = set(tables_flags.pop().split("=", 1)[1].split(","))

    from pyspark.sql import functions as F

    from cassandra_syncer_spark.session import get_spark

    spark = get_spark(app_name="make-replica")
    spark.sparkContext.setLogLevel("ERROR")

    shifted_keys = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    passthrough = ["region", "nation", "supplier", "part"]

    if only_tables is not None:
        known = set(passthrough) | set(shifted_keys)
        bad = only_tables - known
        if bad:
            raise SystemExit(
                f"unknown table(s) in --tables=: {sorted(bad)} "
                f"(known: {sorted(known)}) — a typo here would silently "
                "regenerate nothing while appearing to succeed"
            )

    for name in passthrough:
        if only_tables is not None and name not in only_tables:
            continue
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    for name, keys in shifted_keys.items():
        if only_tables is not None and name not in only_tables:
            continue
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(n):
            df = base
            for k in keys:
                df = df.withColumn(k, (F.col(k) + F.lit(i * STEP)).cast(dict(base.dtypes)[k]))
            if unique_docs and name == "documents" and i > 0:
                # suffix every word with a copy marker: a bijection on the
                # vocabulary, so word/shingle COUNTS are unchanged (same
                # compute per doc) and intra-copy near-dup structure is
                # exactly preserved, but every shingle differs from every
                # other copy's → zero cross-copy near-dup pairs
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1c{i}")
                )
            if unique_docs and name == "embeddings" and i > 0:
                # same idea for vectors: a per-copy deterministic SIGN-FLIP
                # pattern s_{i,k} ∈ {+1,−1} applied per coordinate.  An
                # orthogonal (diagonal ±1) map EXACTLY preserves intra-copy
                # dot products and difference vectors — near-dup structure
                # within a copy is untouched — while ~half the per-
                # coordinate sign bits flip between any two copies, so
                # simhash band signatures genuinely diverge cross-copy and
                # band buckets stop collecting N identical codes.  (The
                # earlier +const-on-axis-0 shift only pinned ONE sign bit
                # on unit-normalized fixtures, leaving copies 1..N−1
                # bit-identical — cross-copy collisions persisted and dup
                # density still grew quadratically.)
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when(
                            F.pmod(F.hash(F.lit(i), j), F.lit(2)) == 0, x
                        )
                        .otherwise(-x)
                        .cast("float"),
                    ),
                )
            parts.append(df)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        acc.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(name, "rows:", spark.read.parquet(f"{out}/{name}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
