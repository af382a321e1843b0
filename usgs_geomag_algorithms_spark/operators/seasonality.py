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

def xcorr_lags(
    x_sig: DataFrame,
    y_sig: DataFrame,
    lags: Sequence[int],
    step_us: int,
    series_cols: Sequence[str] = (),
    ts_col: str = "t_us",
    value_col: str = "v",
    min_points: int = 2,
) -> DataFrame:
    """Cross-correlation between two gridded integer signals at literal
    signed lags: Pearson of the pairs ``(x_t, y_{t + k*step})``.

    The lead/lag detector between channels — the multi-channel analog of
    :func:`acf_lags` (reference analog: the cross-channel dependencies
    AverageAlgorithm / DeltaF consume as configured facts; at corpus
    scale we *measure* which channel leads, e.g. does a crawl-rate spike
    on one signal anticipate another).  A positive best lag means ``x``
    LEADS ``y`` by ``k`` steps.

    Exactness and plan shape are identical to :func:`acf_lags` — x
    explodes by the literal lag list map-side, ONE equi-join on
    (series, shifted-ts), BIGINT sufficient statistics, one fixed
    int64->double IEEE tree.  Lags may be negative or zero.
    """
    series_cols = list(series_cols)
    lags = [int(l) for l in lags]
    if not lags:
        raise ValueError("lags must be non-empty")

    head = x_sig.select(
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
    tail = y_sig.select(
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
    xc = F.when(
        (n >= min_points) & (dx > 0) & (dy > 0),
        num / (F.sqrt(dx) * F.sqrt(dy)),
    )
    return stats.select(*series_cols, "lag", "n_pairs", xc.alias("xcorr"))


def lead_lag(
    xcorr_df: DataFrame, series_cols: Sequence[str] = ()
) -> DataFrame:
    """Best |xcorr| lag per series from :func:`xcorr_lags` output — which
    signal leads, and by how many grid steps.

    |xcorr| is compared on the bit-exact doubles; ties break toward the
    smallest |lag| then the smaller (more-negative) lag, both integer
    comparisons — deterministic on both engines.
    """
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols).orderBy(
        F.abs(F.col("xcorr")).desc(),
        F.abs(F.col("lag")).asc(),
        F.col("lag").asc(),
    )
    return (
        xcorr_df.where(F.col("xcorr").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(*series_cols, F.col("lag").alias("best_lag"), "n_pairs", "xcorr")
    )


def harmonic_weights(period: int, harmonic: int = 1, scale: int = 10**6):
    """Integer cos/sin weight tables for one DFT bin: ``round(cos(2*pi*
    h*p/period) * scale)`` for each phase ``p`` — plain Python ints, so
    the SAME literals embed in the Spark plan and the oracle SQL and
    every weighted sum stays exact BIGINT."""
    import math

    if period <= 1:
        raise ValueError(f"period must be > 1, got {period}")
    wc = [
        int(round(math.cos(2.0 * math.pi * harmonic * p / period) * scale))
        for p in range(period)
    ]
    ws = [
        int(round(math.sin(2.0 * math.pi * harmonic * p / period) * scale))
        for p in range(period)
    ]
    return wc, ws


def harmonic_power(
    sig: DataFrame,
    period: int,
    step_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    harmonic: int = 1,
    scale: int = 10**6,
) -> DataFrame:
    """Amplitude of one Fourier harmonic of a gridded integer signal —
    the solar-quiet (Sq) daily-variation strength detector: at hour
    cadence with ``period=24`` this is the diurnal-cycle amplitude per
    series (reference analog: the 24h seasonality SqDistAlgorithm models
    with its seasonal state vector, ``geomagio/algorithm/
    SqDistAlgorithm.py`` — here measured directly as a DFT bin).

    Phase index is ``(t_us div step) mod period`` — integer, gap-robust
    (missing slots simply contribute nothing).  The cos/sin weights are
    a ``period``-entry literal integer table (:func:`harmonic_weights`),
    so the two weighted sums ``a = sum(v*wc[phase])``, ``b = sum(v*
    ws[phase])`` are exact BIGINTs under any partitioning; the only
    doubles are one final fixed tree ``amp = 2*sqrt(A*A + B*B)/(n*
    scale)`` evaluated identically by Spark and DuckDB.

    Plan: map-only phase/weight projection (element_at of a literal
    array) + one map-side-combinable aggregate — rides the scan at any
    corpus size, output bounded by series count.  Emits the raw BIGINT
    coefficients too, so callers needing phase can post-process without
    re-scanning.
    """
    series_cols = list(series_cols)
    wc, ws = harmonic_weights(period, harmonic, scale)
    # phase = ((t div step) mod period) + 1 for 1-based element_at
    idx = F.expr(
        f"cast(pmod(cast({ts_col} as bigint) div {step_us}, {period}) + 1 as int)"
    )
    arr_c = F.array(*[F.lit(w) for w in wc])
    arr_s = F.array(*[F.lit(w) for w in ws])
    v = F.col(value_col).cast("long")
    proj = sig.select(
        *series_cols,
        v.alias("_v"),
        (v * F.element_at(arr_c, idx)).alias("_vc"),
        (v * F.element_at(arr_s, idx)).alias("_vs"),
    )
    agg = proj.groupBy(*series_cols).agg(
        F.count("*").cast("long").alias("n_slots"),
        F.sum("_v").cast("long").alias("sum_v"),
        F.sum("_vc").cast("long").alias("coef_cos"),
        F.sum("_vs").cast("long").alias("coef_sin"),
    )
    a = F.col("coef_cos").cast("double")
    b = F.col("coef_sin").cast("double")
    amp = (
        F.lit(2.0)
        * F.sqrt(a * a + b * b)
        / (F.col("n_slots") * F.lit(scale)).cast("double")
    )
    return agg.select(
        *series_cols,
        "n_slots",
        "sum_v",
        "coef_cos",
        "coef_sin",
        F.when(F.col("n_slots") > 0, amp).alias("amplitude"),
    )
