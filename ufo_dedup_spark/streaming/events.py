"""Structured Streaming operators.

The reference is pure batch (SURVEY.md §2.8: no watermarks/windows/state);
these are the engine's forward-looking streaming entry points so the same
logical operations run over unbounded inputs:

- windowed event aggregation with watermarking (late data handled)
- streaming exact dedup: content-hash dropDuplicates within a watermark
- streaming document ingestion -> signature computation (the stateless
  stages of the dedup pipeline run unchanged on a stream; candidate
  generation and clustering remain batch jobs over the checkpointed
  signature table, which is the standard lambda split for LSH dedup)

All transformations are expressed so they work identically with
``spark.read`` and ``spark.readStream`` inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ufo_dedup_spark.functions.hashing import make_minhash_udf, make_simhash_udf


def hourly_event_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window_size: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts + value aggregates per event_type.

    With a streaming input, the watermark bounds state and admits late rows
    up to ``watermark``; with a batch input the same plan degenerates to a
    grouped aggregation (watermark is a no-op).
    """
    # parquet round-trips can surface TIMESTAMP_NTZ, which watermarking
    # rejects — normalize the event-time column first
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_exact_dedup(
    pages: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup over a page stream: first occurrence of each content hash
    wins; state is bounded by the event-time watermark (a duplicate arriving
    later than the watermark is passed through — at web scale the periodic
    batch dedup pass reconciles those)."""
    src = pages.withColumn("content_hash", F.xxhash64("text"))
    if src.isStreaming:
        src = src.withWatermark("warc_ts", watermark)
        return src.dropDuplicatesWithinWatermark(["content_hash"])
    return src.dropDuplicates(["content_hash"])


def signature_stream(
    pages: DataFrame,
    num_perm: int = 128,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Stateless signature stage over a page stream: id, MinHash signature,
    SimHash fingerprint. Works identically for batch and streaming inputs;
    in streaming deployments this writes to the signature table that the
    periodic batch LSH/clustering job consumes."""
    minhash = make_minhash_udf(num_perm, shingle_k, seed)
    simhash = make_simhash_udf(2, seed)
    return pages.select(
        F.xxhash64("url").alias("id"),
        "url",
        minhash(F.col("text")).alias("minhash"),
        simhash(F.col("text")).alias("simhash"),
    )
