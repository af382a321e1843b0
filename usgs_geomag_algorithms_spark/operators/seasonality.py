"""Seasonality detection: autocorrelation at fixed lags + dominant period.

The reference's SqDist algorithm (``geomagio/algorithm/SqDistAlgorithm.py``)
takes the seasonal period ``m`` as a CONFIGURED constant (1440 minutes for
the solar-quiet daily variation).  A corpus-scale deployment over millions
of crawl-cadence series can't hand-configure periods — this module learns
them: the sample autocorrelation function (ACF) at a literal set of
candidate lags, and the dominant period as the best-scoring lag per
series.  Feeds ``sqdist_apply``'s ``m`` and validates rollup tier choices
(a series with no structure below one hour doesn't need a minute tier).

Estimator: Pearson-of-paired-samples — for lag ``k``, all pairs
``(x_t, x_{t+k·step})`` where BOTH grid slots exist, correlated with means
taken over the paired subsets.  This is the gap-robust variant (missing
minutes drop pairs instead of poisoning a global mean); on a complete
grid it converges to the textbook fixed-mean ACF.  Pairing is by EXACT
shifted timestamp (a self-join), never ``lead(k)`` — row-offset leads
silently misalign across gaps.

Exactness (driver oracle, zero rounding): identical discipline to
:func:`operators.stats.window_corr` — BIGINT sufficient statistics
(order-independent under any partitioning), then one fixed int64→double
IEEE tree ``(nΣxy−ΣxΣy)/(sqrt(nΣx²−(Σx)²)·sqrt(nΣy²−(Σy)²))`` that Spark
and DuckDB evaluate bit-identically (sqrt is IEEE-754 correctly rounded).

Scale shape: the head side explodes by the literal lag count ``L``
map-side, then ONE equi-join on (series, shifted-ts) — both sides hash
partition on the same key, shuffle volume ``(L+1)·n`` rows of integers.
The stats aggregation is map-side combinable and its output is bounded
by series × L, so :func:`dominant_period`'s per-series window ranks a
tiny relation.  No Python rows anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def acf_lags(
    sig: DataFrame,
    lags: Sequence[int],
    step_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    min_points: int = 2,
) -> DataFrame:
    """Sample ACF per (series, lag) over a gridded integer signal.

    ``lags`` are positive grid-step multiples (a small literal list —
    they explode map-side).  Output: series + ``lag`` + ``n_pairs`` +
    ``acf`` (NULL when fewer than ``min_points`` pairs or either paired
    margin is constant).
    """
    series_cols = list(series_cols)
    lags = [int(l) for l in lags]
    if not lags or min(lags) <= 0:
        raise ValueError(f"lags must be positive ints, got {lags!r}")

    head = sig.select(
        *series_cols,
        F.col(ts_col).alias("_t0"),
        F.col(value_col).cast("long").alias("x"),
        F.explode(F.array(*[F.lit(l) for l in lags])).alias("lag"),
    ).select(
        *series_cols,
        "lag",
        "x",
        (F.col("_t0") + F.col("lag").cast("long") * F.lit(step_us)).alias("_tk"),
    )
    tail = sig.select(
        *series_cols,
        F.col(ts_col).alias("_tk"),
        F.col(value_col).cast("long").alias("y"),
    )
    stats = (
        head.join(tail, on=series_cols + ["_tk"], how="inner")
        .groupBy(*series_cols, "lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("x").cast("long").alias("_sx"),
            F.sum("y").cast("long").alias("_sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("_sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("_syy"),
        )
    )
    n = F.col("n_pairs")
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    dx = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    dy = (n * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    acf = F.when(
        (n >= min_points) & (dx > 0) & (dy > 0),
        num / (F.sqrt(dx) * F.sqrt(dy)),
    )
    return stats.select(*series_cols, "lag", "n_pairs", acf.alias("acf"))


def dominant_period(
    acf_df: DataFrame, series_cols: Sequence[str] = ("series",)
) -> DataFrame:
    """Best-scoring lag per series from :func:`acf_lags` output — the
    learned seasonal period (in grid steps) for SqDist's ``m``.

    Ties on the (bit-exact) acf score break toward the SHORTEST lag —
    the fundamental beats its harmonics, deterministically on both
    engines.  Series whose every candidate lag was degenerate (all-NULL
    acf) emit nothing.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(
        F.col("acf").desc(), F.col("lag").asc()
    )
    return (
        acf_df.where(F.col("acf").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(*series_cols, F.col("lag").alias("period"), "n_pairs", "acf")
    )
