"""Cross-series average with NaN-propagation (the reference's Dst average).

Reference: ``geomagio/algorithm/AverageAlgorithm.py:76-133`` — per-timestamp
``np.mean`` across observatories of one channel with optional per-station
scale factors; NaN in ANY station makes the output NaN at that timestamp
(``test/algorithm_test/AverageAlgorithm_test.py:47-83``), unlike SQL ``avg``
which skips nulls — hence the guarded expression here. A *missing row* for a
series is likewise a gap.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F


def average_across_series(
    df: DataFrame,
    n_series: int | None = None,
    scales: Mapping[str, float] | None = None,
    series_col: str = "url",
    group_cols: Sequence[str] = ("channel",),
    ts_col: str = "t_us",
    value_col: str = "value",
    out_series: str = "USGS",
) -> DataFrame:
    """Average ``value`` across all values of ``series_col`` per
    (group_cols, ts). Output is NULL when any series is NULL/NaN or absent.

    Parameters
    ----------
    n_series:
        expected number of contributing series. When None, it is computed
        with one tiny pre-aggregate (count of distinct series) and applied
        as a literal — a broadcast-free scalar, not a per-row subquery.
    scales:
        optional per-series scale factor (the latitude correction,
        ref ``AverageAlgorithm.py:93-116``).
    """
    group_cols = list(group_cols)
    if n_series is None:
        n_series = df.select(series_col).distinct().count()

    v = F.col(value_col)
    if scales:
        mapping = F.create_map(
            *[F.lit(x) for kv in scales.items() for x in kv]
        )
        v = v * F.coalesce(mapping[F.col(series_col)], F.lit(1.0))
    valid = v.isNotNull() & ~F.isnan(v)

    agg = df.groupBy(*group_cols, ts_col).agg(
        F.sum(F.when(valid, v)).alias("_vsum"),
        F.count(F.when(valid, True)).alias("_n"),
        # count DISTINCT series with a valid value: a duplicate row from
        # one series must not mask another series' gap (the NaN-propagation
        # contract, ref AverageAlgorithm_test.py:47-83)
        F.count_distinct(
            F.when(valid, F.col(series_col))
        ).alias("_n_series"),
    )
    return agg.select(
        F.lit(out_series).alias(series_col),
        *group_cols,
        F.col(ts_col),
        F.when(
            (F.col("_n") == n_series) & (F.col("_n_series") == n_series),
            F.col("_vsum") / F.col("_n"),
        ).alias(value_col),
    )
