"""Streaming sessionization twin of operators/sessions.sessionize.

Structured Streaming's merging session-window state operator: sessions
stay open in the state store while events keep arriving within ``gap`` of
each other, and close (emit, append mode) once the event-time watermark
passes session_end + gap. The watermark plays the reference's realtime
``allowed_lateness`` role (``geomagio/Controller.py:292-303``): events
later than the watermark are dropped here and reconciled by the batch
operator — the same lambda split as streaming/rollup_stream.py.

State per key is one open session struct (start, end, count) — bounded by
key cardinality, not event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessions with the SAME output schema and semantics as the
    batch ``sessionize`` (first/last observed event time, inclusive-boundary
    gap merge), so a drained availableNow run is row-identical to the batch
    operator over the same input."""
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col, F.session_window(ts_col, gap).alias("_w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
            F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
        )
    )
    return grouped.select(
        key_col,
        "session_start_us",
        "session_end_us",
        "n_events",
        (F.col("session_end_us") - F.col("session_start_us")).alias(
            "duration_us"
        ),
        F.when(
            F.col("n_events") > 1,
            F.expr("(session_end_us - session_start_us) div (n_events - 1)"),
        ).alias("mean_gap_us"),
    )
