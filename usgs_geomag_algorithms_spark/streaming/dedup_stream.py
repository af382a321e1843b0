"""Streaming ingest deduplication for document streams.

The streaming front door of the curation pipeline: exact-duplicate
documents are dropped AT INGEST, before they cost storage or downstream
near-dup work.  Spark-native state management does all the heavy
lifting — ``dropDuplicatesWithinWatermark`` keeps one state row per
distinct content hash and EVICTS it once the watermark passes, so state
is bounded by (ingest rate × horizon), not corpus size; a 100 TB/day
firehose with a 24 h horizon holds ~one day of 32-byte hashes sharded
across executors.  Exact cross-horizon dedup remains the batch
operator's job (``operators/dedup.py``) — same lambda split as the
rollup path (streaming/continuous.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_hashed(
    df: DataFrame, text_col: str = "text", hash_col: str = "content_hash"
) -> DataFrame:
    """Attach the 256-bit content hash used as the dedup identity (the
    same identity the batch ``exact_dedup`` groups on)."""
    return df.withColumn(hash_col, F.sha2(F.col(text_col), 256))


def streaming_exact_dedup(
    stream: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Drop exact-duplicate documents from a stream, keeping the first
    arrival of each content hash within the watermark horizon.

    State: one row per DISTINCT hash still inside the horizon —
    watermark eviction keeps it bounded on an unbounded stream (plain
    ``dropDuplicates`` would grow state forever).  Re-delivered
    micro-batches hit the same state rows, so replays stay exact.
    """
    hashed = content_hashed(stream, text_col=text_col).withWatermark(
        ts_col, watermark
    )
    return hashed.dropDuplicatesWithinWatermark(["content_hash"])
