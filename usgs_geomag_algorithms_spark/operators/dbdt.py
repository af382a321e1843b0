"""DbDt: first difference of grid-adjacent samples, rounded to 6 decimals.

Reference: ``geomagio/algorithm/DbDtAlgorithm.py:22-53`` — ``np.diff`` over
the dense array (NaN propagates through the subtraction), output channel
renamed ``<ch>_DT`` and the series start shifted one sample period.

Long-format semantics: output at slot t = value(t) - value(t - delta); NULL
when either side is a gap. Because rows may be absent, the window ``lag``
result only counts when the previous *present* row is exactly one delta
back — otherwise the grid-previous slot was a missing row (gap)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..tiers import US


def dbdt(
    df: DataFrame,
    delta_s: float,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    channel_col: str | None = "channel",
    decimals: int = 6,
) -> DataFrame:
    series_cols = list(series_cols)
    delta_us = int(round(delta_s * US))
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    prev_t = F.lag(ts_col).over(w)
    prev_v = F.lag(value_col).over(w)
    adjacent = prev_t == F.col(ts_col) - delta_us
    out = df.select(
        *series_cols,
        F.col(ts_col),
        F.round(
            F.when(adjacent, F.col(value_col) - prev_v), decimals
        ).alias(value_col),
        # drop the first slot of each series (diff shortens by one; ref :41);
        # lag-is-null rides the same partition/sort as the lag itself, so this
        # costs no extra shuffle
        prev_t.alias("_prev_t"),
    ).where(F.col("_prev_t").isNotNull()).drop("_prev_t")
    if channel_col and channel_col in out.columns:
        out = out.withColumn(channel_col, F.concat(F.col(channel_col), F.lit("_DT")))
    return out
