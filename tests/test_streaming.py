"""Structured Streaming operators: file-source streams, availableNow
triggers, memory sink; streaming results must match the batch plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ufo_dedup_spark.streaming.events import (
    hourly_event_counts,
    signature_stream,
    streaming_exact_dedup,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").coalesce(
        2
    ).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_counts_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_event_counts(batch).collect()
    }

    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = hourly_event_counts(stream)
    assert agg.isStreaming
    got_df = _run_stream(spark, agg, "hourly_mem")
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in got_df.collect()
    }
    assert got == expected


def test_streaming_exact_dedup(spark, tmp_path):
    rows = [
        ("u1", "2024-01-01 00:00:00", "same text"),
        ("u2", "2024-01-01 00:05:00", "same text"),
        ("u3", "2024-01-01 00:10:00", "other text"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string, text string").select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "text"
    )
    path = str(tmp_path / "pages")
    df.coalesce(1).write.parquet(path)

    stream = spark.readStream.schema(df.schema).parquet(path)
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_mem").select("text").collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["other text", "same text"]


def test_signature_stream_batch_parity(spark, tmp_path):
    rows = [("https://a/1", "alpha beta gamma delta epsilon zeta"),
            ("https://a/2", "totally different words here now")]
    df = spark.createDataFrame(rows, "url string, text string")
    batch_sigs = {
        r["url"]: (list(r["minhash"]), r["simhash"])
        for r in signature_stream(df).collect()
    }

    path = str(tmp_path / "p2")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    sigs = signature_stream(stream)
    q = (
        sigs.writeStream.format("memory")
        .queryName("sig_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["url"]: (list(r["minhash"]), r["simhash"])
        for r in spark.table("sig_mem").collect()
    }
    assert got == batch_sigs
