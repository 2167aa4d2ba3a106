"""Checkpoint kill/replay discipline for the STATEFUL STREAMING operators
(round-5, VERDICT r4 item 8 — extends the batch pipeline's
test_chaos_resume to sessionize_stream / dedup_stream).

Protocol, per operator: land the input as 4 time-ordered files; start
the query with maxFilesPerTrigger=1 against a parquet sink + checkpoint
dir; STOP the query after the first committed micro-batch (mid-stream —
later files unprocessed, open state in the store); restart the SAME
query from the SAME checkpoint with availableNow; assert the sink
equals the batch twin exactly. A lost/duplicated state row would split
a session that spans the kill point or re-emit an already-kept doc —
both break set equality. The parquet sink's _spark_metadata commit log
is what makes replayed batches exactly-once; spark.read honors it."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
EVENT_DDL = (
    "event_id long, user_id long, ts timestamp_ntz, event_type string, "
    "value double, props string"
)


def _land_ordered_files(spark, df, order_cols, out_dir, n_files=4):
    """Split df into n_files contiguous chunks in sort order, one parquet
    file each, mtimes pinned ascending (the file source orders by
    modTime)."""
    import glob
    import os
    import shutil

    from pyspark.sql import Window

    out_dir.mkdir()
    w = Window.orderBy(*order_cols)
    total = df.count()
    per = (total + n_files - 1) // n_files
    chunked = df.withColumn("__rn", F.row_number().over(w) - 1)
    now = time.time()
    for i in range(n_files):
        part = (
            chunked.where((F.col("__rn") >= i * per) & (F.col("__rn") < (i + 1) * per))
            .drop("__rn")
            .orderBy(*order_cols)
        )
        tmp = str(out_dir / f"__tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = str(out_dir / f"{chr(ord('a') + i)}.parquet")
        shutil.copy(glob.glob(tmp + "/part-*")[0], dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 600 + i * 60, now - 600 + i * 60))
    return str(out_dir)


def _stream(spark, schema, in_dir):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )


def _kill_after_first_batch(transformed, sink_dir, ckpt_dir):
    """Phase 1: long trigger interval so batch 2 cannot start before the
    stop lands — the stop is deterministically mid-stream (1 of 4 files
    processed, state open in the store)."""
    q = (
        transformed.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(processingTime="60 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 0 and p["numInputRows"] > 0:
            break
        time.sleep(0.5)
    else:
        q.stop()
        pytest.fail("first micro-batch never committed")
    q.stop()
    q.awaitTermination(60)


def _resume_to_end(transformed, sink_dir, ckpt_dir):
    q = (
        transformed.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_sessionize_stream_survives_mid_stream_restart(spark, tmp_path):
    from pyspark.sql import Window

    from glinerswift_spark.streaming.stateful import sessionize_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    in_dir = _land_ordered_files(
        spark, events, ["ts", "event_id"], tmp_path / "in"
    )
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    _kill_after_first_batch(
        sessionize_stream(_stream(spark, EVENT_DDL, in_dir), gap_minutes=30),
        sink, ckpt,
    )
    # sessions spanning the kill point are OPEN state in the checkpoint;
    # the restarted query must extend them, not restart them
    _resume_to_end(
        sessionize_stream(_stream(spark, EVENT_DDL, in_dir), gap_minutes=30),
        sink, ckpt,
    )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in spark.read.parquet(sink).collect()
    }

    # batch twin: every CLOSED session (all but each user's last)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    gap = ms - F.lag(ms).over(w)
    sess = (
        events.withColumn(
            "session_idx",
            F.sum(
                F.when(gap.isNull() | (gap > 1_800_000), 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    last = sess.groupBy("user_id").agg(F.max("session_idx").alias("last_idx"))
    closed = sess.join(last, "user_id").where(
        F.col("session_idx") < F.col("last_idx")
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in closed.collect()
    }
    assert got == want
    assert got, "no closed sessions — twin vacuous"


def test_dedup_stream_survives_mid_stream_restart(spark, tmp_path):
    from glinerswift_spark.streaming.stateful import dedup_stream

    # duplicates deliberately SPAN the kill point: base docs ordered by
    # id split into 4 files, and every doc with id % 7 == 0 reappears
    # (same text, higher id) ~3 files later — if the restart lost the
    # keeper state, the late duplicate would be re-emitted as a keeper
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    late_dups = (
        docs.where((F.col("doc_id") % 7 == 0))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    both = docs.unionByName(late_dups)
    # order by (original-id grouping breaks): plain doc_id order puts all
    # +1e6 duplicates in the last file(s), after their originals
    in_dir = _land_ordered_files(
        spark, both, ["doc_id"], tmp_path / "in"
    )
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ddl = "doc_id long, text string"

    _kill_after_first_batch(
        dedup_stream(_stream(spark, ddl, in_dir)), sink, ckpt
    )
    _resume_to_end(
        dedup_stream(_stream(spark, ddl, in_dir)), sink, ckpt
    )

    got = [(r.text_hash, r.doc_id) for r in spark.read.parquet(sink).collect()]
    # exactly-once: one keeper row per distinct hash, no re-emits
    assert len(got) == len({h for h, _ in got})
    # first-seen-wins == batch min-id per hash (arrival follows id order)
    want = {
        (r.text_hash, r.doc_id)
        for r in both.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert set(got) == want
