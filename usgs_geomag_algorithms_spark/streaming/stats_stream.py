"""Streaming twins of the serving-statistics tiers (OHLC, histogram).

Both are tumbling event-time window aggregates — the mergeable-state
subset of operators/stats.py and operators/rollup.py: OHLC partials are
(value, ts) pairs for min_by/max_by plus min/max/count, histogram
partials are per-bin counts; both merge associatively, so Structured
Streaming maintains them incrementally with watermark-bounded state and
emits each window once (append mode) when the watermark passes.  Replays
after a failed epoch re-emit the same closed windows — idempotent
against the TierStore upsert exactly like streaming/continuous.py.

The non-mergeable members of the family stay batch-side by design:
exact percentiles (quantile_rollup) need the sorted sample, LTOB needs
the neighbor geometry, and TWA needs the NEXT observation (a window
cannot close until the sample after it arrives) — the lambda
reconciliation path (plans/refresh.py) covers them, matching the
reference's update-mode backfill (``geomagio/Controller.py:326-474``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def streaming_ohlc(
    stream: DataFrame,
    out_us: int,
    watermark: str = "2 minutes",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "event_ts",
    value_col: str = "v",
) -> DataFrame:
    """Tumbling-window OHLC over a streaming frame (event-time TIMESTAMP
    ``ts_col``).  Output schema matches the batch ``ohlc_rollup``:
    series + ``t_us`` (window-start long) + open/high/low/close +
    n_samples, append-mode on watermark close."""
    series_cols = list(series_cols)
    v = F.col(value_col)
    t = F.unix_micros(F.col(ts_col))
    wm = stream.withWatermark(ts_col, watermark)
    win = F.window(ts_col, f"{int(out_us)} microseconds")
    return (
        wm.groupBy(*series_cols, win.alias("w"))
        .agg(
            F.min_by(v, t).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, t).alias("close"),
            F.count("*").cast("long").alias("n_samples"),
        )
        .select(
            *series_cols,
            F.unix_micros(F.col("w.start")).alias("t_us"),
            "open",
            "high",
            "low",
            "close",
            "n_samples",
        )
    )


def streaming_histogram(
    stream: DataFrame,
    out_us: int,
    bin_width: float,
    n_bins: int,
    watermark: str = "2 minutes",
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "event_ts",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window fixed-bin histogram; schema matches the batch
    ``histogram_rollup`` (sparse — empty bins emit nothing)."""
    series_cols = list(series_cols)
    raw = F.floor(F.col(value_col) / F.lit(float(bin_width)))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(int(n_bins) - 1)).cast(
        "int"
    )
    wm = stream.withWatermark(ts_col, watermark)
    win = F.window(ts_col, f"{int(out_us)} microseconds")
    return (
        wm.groupBy(*series_cols, win.alias("w"), bin_.alias("bin"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            *series_cols,
            F.unix_micros(F.col("w.start")).alias("t_us"),
            "bin",
            "n",
        )
    )
