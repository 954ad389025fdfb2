"""applyInPandasWithState ledger + watermark late-data drop semantics."""

from __future__ import annotations

import json

from cassandra_syncer_spark.streaming.stateful import upload_ledger
from cassandra_syncer_spark.streaming.watch import tumbling_counts, watch_files

LEDGER_IN_SCHEMA = "container string, name string, bytes long"


def _stage(dirpath, batches, prefix="b"):
    dirpath.mkdir(parents=True, exist_ok=True)
    for i, rows in enumerate(batches):
        with open(dirpath / f"{prefix}{i}.json", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")


def test_upload_ledger_carries_state_across_batches(spark, tmp_path):
    # two staged files -> two microbatches (maxFilesPerTrigger is 64, so
    # force separate triggers via two sequential runs against one checkpoint)
    _stage(
        tmp_path / "in",
        [
            [
                {"container": "c1", "name": "a", "bytes": 10},
                {"container": "c1", "name": "b", "bytes": 5},
                {"container": "c2", "name": "z", "bytes": 7},
            ]
        ],
    )
    stream = (
        spark.readStream.format("json").schema(LEDGER_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1).load(str(tmp_path / "in"))
    )
    rows1 = []
    q = (
        upload_ledger(stream, idle_evict_ms=None)  # availableNow drain
        .writeStream.foreachBatch(lambda df, bid: rows1.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out1 = {r.container: r for r in rows1}
    assert out1["c1"].files_seen == 2 and out1["c1"].bytes_total == 15
    assert out1["c2"].files_seen == 1

    # second run: a duplicate name ("a" again, re-put) and one new file —
    # state restored from the checkpoint must dedupe the re-put
    _stage(
        tmp_path / "in2",
        [
            [
                {"container": "c1", "name": "a", "bytes": 10},
                {"container": "c1", "name": "c", "bytes": 3},
            ]
        ],
        prefix="second-",
    )
    for f in (tmp_path / "in2").iterdir():
        f.rename(tmp_path / "in" / f.name)
    stream2 = (
        spark.readStream.format("json").schema(LEDGER_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1).load(str(tmp_path / "in"))
    )
    rows2 = []
    q2 = (
        upload_ledger(stream2, idle_evict_ms=None)
        .writeStream.foreachBatch(lambda df, bid: rows2.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    out2 = {r.container: r for r in rows2}
    # 'a' was already in state -> only 'c' is new; bytes don't double-count
    assert out2["c1"].files_seen == 3
    assert out2["c1"].bytes_total == 18
    assert out2["c1"].new_in_batch == 1


def test_idle_container_state_evicted(spark, tmp_path):
    """ProcessingTimeTimeout eviction: a container idle past the horizon
    loses its ledger, so a later event restarts the count from empty —
    state size tracks live keys (the unbounded-stream posture)."""
    import threading
    import time as _time

    in_dir = tmp_path / "in"
    _stage(in_dir, [[{"container": "c1", "name": "a", "bytes": 10}]])
    stream = (
        spark.readStream.format("json").schema(LEDGER_IN_SCHEMA)
        .option("maxFilesPerTrigger", 1).load(str(in_dir))
    )
    rows = []
    seen_first = threading.Event()
    seen_keepalive = threading.Event()

    def on_batch(df, bid):
        got = df.collect()
        rows.extend(got)
        if any(r.container == "c1" for r in got):
            seen_first.set()
        if any(r.container == "keepalive" for r in got):
            seen_keepalive.set()

    q = (
        upload_ledger(stream, idle_evict_ms=1500)
        .writeStream.foreachBatch(on_batch)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        assert seen_first.wait(30), "first c1 batch never processed"
        # let c1 idle past the horizon while OTHER keys keep batches flowing
        # (timeout processing happens inside live microbatches)
        _time.sleep(2.0)
        _stage(in_dir, [[{"container": "keepalive", "name": "k", "bytes": 1}]], prefix="ka")
        assert seen_keepalive.wait(30), "keepalive batch never processed"
        _time.sleep(1.0)
        # same (container, name) again: if c1's state was evicted, the
        # ledger restarts — 'a' counts as NEW again
        _stage(in_dir, [[{"container": "c1", "name": "a", "bytes": 10}]], prefix="again")
        deadline = _time.monotonic() + 30
        while _time.monotonic() < deadline:
            c1_rows = [r for r in rows if r.container == "c1"]
            if len(c1_rows) >= 2:
                break
            _time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination()
    c1_rows = [r for r in rows if r.container == "c1"]
    assert len(c1_rows) >= 2, f"second c1 batch never processed: {rows}"
    last = c1_rows[-1]
    assert last.new_in_batch == 1 and last.files_seen == 1, (
        f"state not evicted: {last} (files_seen should restart at 1)"
    )


def test_watermark_drops_late_events(spark, tmp_path):
    """An event older than watermark horizon must be excluded from its
    (already finalized) window in append mode."""
    from pyspark.sql import functions as F

    # batch 1: events up to 02:00 -> watermark advances to ~01:50
    _stage(
        tmp_path / "w",
        [
            [
                {"name": "e1", "etag": "1", "ts": "2024-01-01T00:10:00"},
                {"name": "e2", "etag": "2", "ts": "2024-01-01T02:00:00"},
            ]
        ],
    )
    stream = (
        watch_files(spark, str(tmp_path / "w"), "name string, etag string, ts timestamp")
        .withColumn("event_type", F.lit("file"))
        .withColumn("value", F.lit(1.0))
    )
    wrows1 = []
    q = (
        tumbling_counts(stream)
        .writeStream.foreachBatch(lambda df, bid: wrows1.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    closed = {r.window.start.isoformat(): r.n for r in wrows1}
    # append mode emits only windows sealed by the watermark: the 00:00 hour
    assert closed == {"2024-01-01T00:00:00": 1}

    # batch 2: a LATE event for the sealed 00:00 window + a fresh event
    _stage(
        tmp_path / "w2",
        [
            [
                {"name": "late", "etag": "3", "ts": "2024-01-01T00:20:00"},
                {"name": "e3", "etag": "4", "ts": "2024-01-01T04:00:00"},
            ]
        ],
        prefix="second-",
    )
    for f in (tmp_path / "w2").iterdir():
        f.rename(tmp_path / "w" / f.name)
    stream2 = (
        watch_files(spark, str(tmp_path / "w"), "name string, etag string, ts timestamp")
        .withColumn("event_type", F.lit("file"))
        .withColumn("value", F.lit(1.0))
    )
    wrows2 = []
    q2 = (
        tumbling_counts(stream2)
        .writeStream.foreachBatch(lambda df, bid: wrows2.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    emitted = {r.window.start.isoformat(): r.n for r in wrows2}
    # the sealed 00:00 window is NOT re-emitted with the late event counted;
    # the 02:00 window seals (n=1, late event excluded from 00:00)
    assert "2024-01-01T00:00:00" not in emitted
    assert emitted.get("2024-01-01T02:00:00") == 1
