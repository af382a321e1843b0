"""CUSUM level-shift (changepoint) detection over a gridded integer signal.

Complements operators/anomaly.py's rolling z-score (the SqDist spike-gate
analog — ``geomagio/algorithm/SqDistAlgorithm.py`` sigma path): where the
z-score flags isolated spikes against a trailing window, the tabular CUSUM
accumulates small sustained deviations from a learned baseline and flags
LEVEL SHIFTS — a counter that quietly steps from 100/min to 110/min never
trips a 3-sigma gate but crosses a CUSUM decision interval within minutes.

The textbook recurrence ``C_i = max(0, C_{i-1} + (v_i - mu - k))`` looks
sequential, but has a closed form over prefix sums:

    C_i = P_i - min(P_0..P_i)          with P_0 = 0, P_i = sum of deltas

so both sides (high/low) are two cumulative window passes — no recursion,
no Python, one shuffle keyed on the series. Exactness by construction: the
baseline mean ``mu = S0/n0`` is never materialized as a double; all deltas
are scaled by ``n0`` (``d_i = n0*(v_i - k) - S0``), keeping every prefix
sum, running min, and decision comparison in BIGINT. The only doubles are
the final display columns — one int64/int64 division each, which IEEE
rounds identically on any engine (see NOTES.md exact-rational rule).

Scale shape: the baseline aggregate and the detection windows share the
series hash partitioning (one Exchange, reused); the per-series baseline
table joins back via broadcast (bounded by series cardinality). Overflow
bound: |prefix| <= n_rows * n0 * max|v| — at 2^20 baseline points and
2^31 values that is ~2^63 at 2^12 rows/series; real deployments keep n0
at minutes-per-day scale (~10^3), giving ~10^6 headroom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cusum_changepoints(
    sig: DataFrame,
    baseline: int = 120,
    k: int = 1,
    h: int = 8,
    series_cols: tuple[str, ...] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    exact_decimal: bool = False,
) -> DataFrame:
    """Two-sided tabular CUSUM per series.

    The first ``baseline`` samples of each series (by ``ts_col`` order)
    train the reference mean; detection runs over the remaining samples.
    ``k`` is the slack (allowance) and ``h`` the decision interval, both
    in raw value units. A series shorter than ``baseline + 1`` samples
    emits nothing (no post-baseline rows to monitor).

    Output: series + ts + v + cusum_hi + cusum_lo (doubles, value units)
    + is_change (either side exceeds ``h``).

    ``exact_decimal=True`` is the raw-tier escape hatch (docs/SCALE.md):
    the n0-scaled BIGINT prefix sums bound |P| ≤ rows·n0·max|v−μ|, which
    wraps on 10 Hz raw tiers or extreme magnitudes — decimal(38,0)
    prefixes stay exact to 10³⁸."""
    series_cols = list(series_cols)
    rn_w = Window.partitionBy(*series_cols).orderBy(F.col(ts_col).asc())
    # decimal mode must quantize identically to the default: cast through
    # bigint FIRST (truncation) — a direct double->decimal cast rounds
    # half-up and would silently change results on non-integer inputs
    v = F.col(value_col).cast("bigint")
    if exact_decimal:
        v = v.cast("decimal(20,0)")
    ranked = sig.select(
        *series_cols,
        F.col(ts_col).alias(ts_col),
        v.alias("v"),
        F.row_number().over(rn_w).alias("_rn"),
    )

    base = (
        ranked.where(F.col("_rn") <= baseline)
        .groupBy(*series_cols)
        .agg(F.sum("v").alias("_s0"), F.count("*").alias("_n0"))
        .where(F.col("_n0") == baseline)
    )

    mon = ranked.where(F.col("_rn") > baseline).join(
        F.broadcast(base), on=series_cols, how="inner"
    )

    n0 = F.col("_n0")
    # integer deltas scaled by n0: d_hi = n0*(v - k) - S0, d_lo = S0 - n0*(v + k)
    d_hi = n0 * (F.col("v") - F.lit(k)) - F.col("_s0")
    d_lo = F.col("_s0") - n0 * (F.col("v") + F.lit(k))

    run = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p_hi = F.sum(d_hi).over(run)
    p_lo = F.sum(d_lo).over(run)
    staged = mon.select(
        *series_cols,
        ts_col,
        "v",
        n0.alias("_n0"),
        p_hi.alias("_p_hi"),
        p_lo.alias("_p_lo"),
        F.least(F.min(p_hi).over(run), F.lit(0)).alias("_m_hi"),
        F.least(F.min(p_lo).over(run), F.lit(0)).alias("_m_lo"),
    )

    c_hi = F.col("_p_hi") - F.col("_m_hi")  # BIGINT, n0-scaled
    c_lo = F.col("_p_lo") - F.col("_m_lo")
    thresh = F.lit(h) * F.col("_n0")
    return staged.select(
        *series_cols,
        ts_col,
        "v",
        (c_hi.cast("double") / F.col("_n0").cast("double")).alias("cusum_hi"),
        (c_lo.cast("double") / F.col("_n0").cast("double")).alias("cusum_lo"),
        ((c_hi > thresh) | (c_lo > thresh)).alias("is_change"),
    )
