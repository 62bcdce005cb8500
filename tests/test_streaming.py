"""Structured Streaming capability test.

The reference is pure batch (SURVEY.md §2.11) — incremental runs are
snapshot-resume — but the engine exposes the streaming ingest path for the
events table: file-source stream -> watermark -> tumbling window -> append
sink, and the streamed result must equal the batch computation over the same
data (the exactly-once contract of the parquet source + memory sink).
"""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from folkscope_spark.session import get_spark

    s = get_spark(app="t4", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_stream_tumbling_window_equals_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("events_src"))
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")  # parquet NTZ -> event-time type
    )
    events.write.mode("overwrite").parquet(src)

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "event_type", "n")
    )
    want = {(r["start"], r["event_type"], r["n"]) for r in batch.collect()}

    stream = (
        spark.readStream.schema(events.schema)
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "event_type", "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["start"], r["event_type"], r["n"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == want


def test_stateful_dedupe_stream_first_wins(spark, tmp_path_factory):
    """applyInPandasWithState dedupe: duplicates across micro-batches are
    dropped; exactly one row per key survives, and it is the first-batch one."""
    import pandas as pd

    src = str(tmp_path_factory.mktemp("docs_src"))
    # two files -> two micro-batches (maxFilesPerTrigger=1); fp2 repeats
    spark.createDataFrame(
        [("fp1", "doc-a"), ("fp2", "doc-b")], "fingerprint string, body string"
    ).coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    spark.createDataFrame(
        [("fp2", "doc-b-dup"), ("fp3", "doc-c")], "fingerprint string, body string"
    ).coalesce(1).write.mode("overwrite").parquet(src + "/f2")

    from folkscope_spark.streaming import dedupe_stream

    stream = (
        spark.readStream.schema("fingerprint string, body string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    deduped = dedupe_stream(stream, "fingerprint", ["body"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedupe_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["fingerprint"]: r["body"]
        for r in spark.sql("SELECT * FROM dedupe_out WHERE fingerprint IS NOT NULL").collect()
    }
    assert set(rows) == {"fp1", "fp2", "fp3"}
    # fp2's duplicate arrival was dropped: only one surviving body per key
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM dedupe_out WHERE fingerprint = 'fp2'"
    ).collect()[0]["n"]
    assert n == 1
