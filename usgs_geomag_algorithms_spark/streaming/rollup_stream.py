"""Structured Streaming variant of the rollup cascade.

The reference's realtime mode is cron micro-batching with explicit state
(``geomagio/Controller.py:292-303``, ``geomagio/processing/filters.py``);
the Spark-native re-expression is an event-time windowed aggregation with a
watermark for late pages:

- "average" steps (minute->hour/day boxcar) are tumbling
  ``window(warc_ts, out_period)`` aggregates;
- "firfilter" steps use the SAME explode-free trick as batch, expressed as
  a *sliding* window: width = numtaps * in_period, slide = out_period,
  startTime offset = -half_width — each input lands in every window whose
  center is within half_width, and the tap weight is looked up from the
  literal coefficient array by (t - window.start) / in_period. No Python,
  state bounded by the watermark.

The watermark is the ``allowed_lateness`` analog of the reference's
realtime pad (``Controller.py:292-303``): windows close (emit, append mode)
once the watermark passes their end; later-than-watermark pages are dropped
from the streaming path and reconciled by the batch incremental refresh
(plans/refresh.py) — the classic lambda reconciliation, matching the
reference's update-mode backfill.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..tiers import Step


def streaming_rollup_step(
    stream: DataFrame,
    step: Step,
    watermark: str = "2 minutes",
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "event_ts",
    value_col: str = "value",
    allowed_bad: float = 0.1,
) -> DataFrame:
    """One cascade step over a streaming long-format frame whose event-time
    column ``ts_col`` is a TIMESTAMP. Output: series + t_us (stamped,
    long) + value, in append mode once the watermark closes each window."""
    series_cols = list(series_cols)
    in_us, out_us, hw = step.in_us, step.out_us, step.half_width_us
    numtaps = step.numtaps

    wm = stream.withWatermark(ts_col, watermark)
    v = F.col(value_col)
    valid = v.isNotNull() & ~F.isnan(v)

    if step.type == "average":
        win = F.window(ts_col, f"{out_us} microseconds")
        grouped = wm.groupBy(*series_cols, win.alias("w")).agg(
            F.sum(F.when(valid, v)).alias("_vsum"),
            F.count(F.when(valid, True)).alias("_nvalid"),
        )
        ok = F.col("_nvalid") * 10 >= numtaps * 9
        stamp = F.unix_micros(F.col("w.start")) + step.stamp_offset_us
    else:
        width_us = numtaps * in_us
        # sliding window [c - hw, c - hw + width) centered on out-grid marks
        win = F.window(
            ts_col,
            f"{width_us} microseconds",
            f"{out_us} microseconds",
            f"-{hw} microseconds",
        )
        w_arr = F.array(*[F.lit(float(x)) for x in step.normalized_window])
        tap = (
            (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("w.start")))
            / F.lit(in_us)
        ).cast("int")
        wgt = F.element_at(w_arr, tap + 1)
        valid_v = F.col("_v").isNotNull() & ~F.isnan("_v")
        grouped = (
            wm.select(*series_cols, F.col(ts_col), v.alias("_v"), win.alias("w"))
            .withColumn("_wgt", wgt)
            .groupBy(*series_cols, "w")
            .agg(
                F.sum(F.when(valid_v, F.col("_wgt") * F.col("_v"))).alias("_vsum"),
                F.sum(F.when(valid_v, F.col("_wgt"))).alias("_wsum"),
                F.count(F.lit(1)).alias("_nvalid"),
            )
        )
        ok = F.col("_wsum") >= F.lit(1.0 - allowed_bad - 1e-9)
        stamp = F.unix_micros(F.col("w.start")) + hw

    value_out = F.when(ok, F.col("_vsum") / (F.col("_wsum") if step.type != "average" else F.col("_nvalid")))
    return grouped.select(
        *series_cols,
        stamp.cast("long").alias("t_us"),
        value_out.cast("double").alias(value_col),
    )
