"""Round-7 regression tests for the ADVICE round-6 findings.

Each test reconstructs the exact degenerate input the fixtures never
exercise — short documents, empty-text band collisions, mixed-schema
pair logs — so the fixed hazards stay fixed.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    """A minimal sf-dir containing only a documents table."""
    out = str(tmp_path / "sf_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_gram_queries_survive_short_docs(spark, tmp_path):
    """Docs with < 8 words crashed the 8-gram expansion: Spark's
    sequence(1, 0) is DESCENDING ([1, 0]) and slice(words, 0, 8) throws
    INVALID_PARAMETER_VALUE.START (ADVICE r6, analytics_r6.py /
    analytics_r5f.py).  Short docs must contribute zero grams, exactly
    as the DuckDB oracle's range() does."""
    from cassandra_syncer_spark.queries.analytics_r5f import text_ngram_novelty
    from cassandra_syncer_spark.queries.analytics_r6 import corpus_vocab_growth

    long_text = " ".join(f"w{i}" for i in range(12))  # 12 words → 5 grams
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "", "en", "web", 0),                   # empty text
            (1, "one", "en", "web", 3),                # 1 word
            (2, "a b c d e f g", "en", "web", 13),     # exactly 7 words
            (3, long_text, "en", "web", len(long_text)),
        ],
    )
    nov = text_ngram_novelty(spark, sf).collect()
    # only doc 3 is long enough to emit grams; all its grams are novel
    assert [r["doc_id"] for r in nov] == [3]
    assert nov[0]["n_grams"] == 5 and nov[0]["n_novel"] == 5
    assert nov[0]["novelty_micro"] == 1000000

    growth = corpus_vocab_growth(spark, sf).collect()
    # one bucket row (only doc 3 contributes grams), cumulative = totals
    assert len(growth) == 1
    assert growth[0]["cum_grams"] == 5 and growth[0]["cum_types"] == 5


def test_verify_pipeline_empty_text_collision(spark, tmp_path):
    """Two empty-text docs band-collide (identical degenerate minhash),
    giving mx = 0 in the edit-similarity ratio: Spark `div` yielded
    null and the DuckDB oracle raised Division by zero (ADVICE r6).
    Identical-empty pairs are a PERFECT match: edit_sim_micro must be
    1000000, never null."""
    from cassandra_syncer_spark.queries.analytics_r6 import dedup_verify_pipeline

    sf = _write_docs(
        spark,
        tmp_path,
        [(0, "", "en", "web", 0), (1, "", "en", "web", 0)],
    )
    rows = dedup_verify_pipeline(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["edit_dist"] == 0
    assert r["edit_sim_micro"] == 1000000  # not null, not a crash


def test_all_queries_survive_degenerate_docs(spark, tmp_path):
    """Robustness law, round-7 edition: every registered query must
    execute cleanly when the documents/embeddings/events content is
    DEGENERATE — empty texts, 1-word and 7-word docs (below every gram
    width), zero vectors, a 5-row single-event-type log (one A/B arm
    possibly empty, KS with one sample missing) — while the relational
    tables are real.  Short docs crashed three gram kernels earlier
    this round and one-sided events crashed the KS/CUPED divisions
    (ANSI DIVIDE_BY_ZERO, caught by this sweep's extension); a crawl
    with a single short doc or a one-type event log must never abort a
    pipeline."""
    import os

    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import FIXTURE_TABLES

    all_queries()
    out = str(tmp_path / "degenerate_sf")
    os.makedirs(out, exist_ok=True)
    for t in FIXTURE_TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if t == "documents":
            docs = [
                (i, txt, "en" if i % 2 else "de", "web", len(txt))
                for i, txt in enumerate(
                    ["", "one", "a b", "a b c d e f g", "x " * 3, ""]
                )
            ]
            spark.createDataFrame(
                docs,
                "doc_id long, text string, lang string, source string, n_chars long",
            ).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        elif t == "events":
            import datetime

            ev = [
                (
                    i,
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
                    i % 2,
                    "click",  # one type only: KS one-sided, arms may be empty
                    5.0,
                    '{"k": 1}',
                )
                for i in range(5)
            ]
            spark.createDataFrame(
                ev,
                "event_id long, ts timestamp, user_id long, event_type string,"
                " value double, props string",
            ).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        elif t == "embeddings":
            # keep the real schema/dim but only 4 rows incl. a zero vector
            (
                spark.read.parquet(src)
                .limit(4)
                .withColumn(
                    "embedding",
                    F.expr(
                        "IF(vec_id % 2 = 0, transform(embedding, x -> float(0.0)), embedding)"
                    ),
                )
                .write.mode("overwrite")
                .parquet(f"{out}/{t}.parquet")
            )
        else:
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
    failures = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, out).collect()
        except Exception as e:  # noqa: BLE001 — collecting all offenders
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)


def test_all_queries_survive_empty_tables(spark, tmp_path):
    """Robustness law, empty edition: every registered query must execute
    cleanly when EVERY fixture table has zero rows (real schemas, no data).
    An empty partition/day/shard is routine at 100 TB scale — a pipeline
    stage must emit an empty result, never abort.  Verified 0/263 failures
    when introduced; this pins it."""
    import os

    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import FIXTURE_TABLES

    all_queries()
    out = str(tmp_path / "empty_sf")
    os.makedirs(out, exist_ok=True)
    for t in FIXTURE_TABLES:
        spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").limit(
            0
        ).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    failures = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, out).collect()
        except Exception as e:  # noqa: BLE001 — collecting all offenders
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)


def test_all_queries_survive_null_laced_tables(spark, tmp_path):
    """Robustness law, NULL edition: every registered query must execute
    cleanly when nullable content columns actually hold NULLs — NULL
    text/lang/source/n_chars documents, a NULL embedding vector, NULL
    event_type/value/props events.  Parquet marks all of these nullable,
    so a crawl row with missing content is legal input; when introduced
    this sweep caught four crashers (bytes(None) in the multimodal
    decode/frame stages, math.ceil(NaN) in the chunker UDTF, write(None)
    in the binaryFile stager) plus two ORACLE-side aborts (DuckDB
    concat('0x', NULL) → CAST abort; least(1000, NULL) = 1000 because
    least IGNORES nulls).  NULL-handling parity for the four fixed ids
    is asserted against the DuckDB oracles on this same fixture."""
    import duckdb

    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import FIXTURE_TABLES

    all_queries()
    out = str(tmp_path / "null_sf")
    for t in FIXTURE_TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        df = spark.read.parquet(src)
        if t == "documents":
            nulls = spark.createDataFrame(
                [
                    (100000, None, None, None, None),
                    (100001, "plain words here for a doc", None, "web", 26),
                ],
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            )
            df = df.limit(20).unionByName(nulls)
        elif t == "embeddings":
            base = df.limit(20)
            nulls = base.limit(1).select(
                (F.col("vec_id") + 100000).alias("vec_id"),
                F.lit(None).cast("array<float>").alias("embedding"),
                F.lit(None).cast("int").alias("label"),
            )
            df = base.unionByName(nulls)
        elif t == "events":
            base = df.limit(50)
            nulls = base.limit(2).select(
                (F.col("event_id") + 100000).alias("event_id"),
                "ts",
                "user_id",
                F.lit(None).cast("string").alias("event_type"),
                F.lit(None).cast("double").alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            df = base.unionByName(nulls)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    failures = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, out).collect()
        except Exception as e:  # noqa: BLE001 — collecting all offenders
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)

    # value-level parity on the NULL fixture for the ids the sweep fixed
    import sys

    sys.path.insert(0, "tests")
    from test_oracle_parity import _assert_frames_match

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        )
    for name in (
        "scan_binaryfile",
        "udtf_explode",
        "multimodal_decode",
        "multimodal_frames",
    ):
        spec = REGISTRY[name]
        _assert_frames_match(
            name, spec.fn(spark, out).toPandas(), con.execute(spec.oracle).fetchdf()
        )


def test_all_queries_survive_unicode_and_long_docs(spark, tmp_path):
    """Robustness law, unicode/long-doc edition: every registered query
    must execute cleanly on CJK / emoji / RTL / combining-mark text and
    on a 100k-word (~590k-char) document.  The long doc caught a real
    overflow when introduced: Spark length()/size() return INT, so
    1000000 * count wraps at ~2147 counted chars — any ~10 KB code file
    would have aborted text_code_detect under ANSI mode (fixed with
    long casts; DuckDB's len() is already BIGINT).  Value parity on
    non-ASCII text is NOT asserted here — several fake-codec oracles
    document an ASCII byte==char precondition — only crash-freedom."""
    import os

    from cassandra_syncer_spark.registry import REGISTRY, all_queries
    from cassandra_syncer_spark.session import FIXTURE_TABLES

    all_queries()
    out = str(tmp_path / "unicode_sf")
    os.makedirs(out, exist_ok=True)
    long_doc = " ".join(f"w{i % 997}" for i in range(100_000))
    raw = [
        (0, "日本語のテキスト データ処理 エンジン テスト 文書 です これは 形態素 無し", "ja"),
        (1, "emoji 🎉 test 🚀 doc with 🔥 symbols 🌍 and more 🎯 tokens here", "en"),
        (2, "مرحبا بالعالم هذا نص عربي للاختبار مع كلمات كثيرة جدا هنا", "ar"),
        (3, "é̂ combining ü marks ñ test ö doc å with ø diacritics æ everywhere ß now", "de"),
        (4, long_doc, "en"),
        (5, "普通 mixed 中文 english 混合 text 文本 with both 两种 languages 语言", "zh"),
    ]
    docs = [(i, t, lang, "web", len(t)) for (i, t, lang) in raw]
    for t in FIXTURE_TABLES:
        if t == "documents":
            spark.createDataFrame(
                docs,
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            ).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        else:
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(f"{out}/{t}.parquet")
    failures = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, out).collect()
        except Exception as e:  # noqa: BLE001 — collecting all offenders
            failures.append(f"{name}: {str(e).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)


def test_read_pairs_merges_mixed_schema_logs(spark, tmp_path):
    """A pairs log holding pre-upgrade files (no batch_id column) PLUS
    new files must not let parquet schema inference project batch_id
    away (ADVICE r6, dedup_stream.py): without mergeSchema every row
    collapses into one null batch group and the cross-batch sum of
    n_shared_bands degrades to a max.  With the fix, distinct batches
    keep their identity and the sums add."""
    from cassandra_syncer_spark.streaming.dedup_stream import read_pairs

    log = str(tmp_path / "pairs_log")
    # pre-upgrade file: no batch_id
    spark.createDataFrame(
        [(1, 2, 3)], "doc_a long, doc_b long, n_shared_bands long"
    ).write.mode("append").parquet(log)
    # two post-upgrade batches for the same pair
    spark.createDataFrame(
        [(1, 2, 4, 7), (1, 2, 5, 8)],
        "doc_a long, doc_b long, n_shared_bands long, batch_id long",
    ).write.mode("append").parquet(log)

    out = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in read_pairs(spark, log).collect()}
    # null-batch 3 + batch-7's 4 + batch-8's 5 = 12 (a max would give 5)
    assert out == {(1, 2): 12}
