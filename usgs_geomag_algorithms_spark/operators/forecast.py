"""Seasonal-naive forecast error: the SqDist baseline comparator.

The reference's SqDist decomposition (``geomagio/algorithm/
SqDistAlgorithm.py``) exists because geomagnetic signals are dominated by
a solar-quiet DAILY cycle; the cheapest forecast that exploits it is the
seasonal naive ``v̂(t) = v(t − period)`` (yesterday's same-minute value).
This operator scores that forecast over the rolled-up signal — the
standard skill baseline any model (Holt-Winters included) must beat, and
in the webtext graft the crawl-scheduler's "is traffic predictable from
yesterday" diagnostic.

Pairing rule: EXACT shifted-timestamp equi-join, never ``lag(k)`` —
row-offset leads misalign across grid holes (the ACF/xcorr lesson,
``operators/seasonality.py``).  Gap-aware: windows missing either side
produce no pair.

Determinism: integer (count-based) signals keep every sufficient stat
BIGINT — ``sum_abs_err`` / ``sum_err`` are order-independent exact; the
single final BIGINT→DOUBLE division (``mae``) is one IEEE op, exact
cross-engine.  For double-valued signals, round the inputs first (the
driver query uses counts).

Scale shape: the self-join is an equi-join on (series, shifted ts) — a
hash join co-partitioned with the signal's own key; the error aggregate
is map-side combinable to (series, out-window) cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def seasonal_naive_error(
    sig: DataFrame,
    period_us: int,
    out_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    suffix: str = "",
) -> DataFrame:
    """Per (series, out-window): pair each sample with the same series
    ``period_us`` earlier and aggregate the forecast error.

    Returns ``series_cols + [ts_col, n_paired{s}, sum_abs_err{s},
    sum_err{s}, mae{s}]`` where ``{s}`` is ``suffix`` (so two calls with
    different periods can be joined side by side).  ``sum_err`` keeps the
    sign: positive = signal grew vs one period ago (bias), ``sum_abs``
    is the L1 forecast loss; both BIGINT-exact for integer signals."""
    series_cols = list(series_cols)
    cur = sig.select(
        *series_cols, F.col(ts_col).alias("_t"), F.col(value_col).alias("_v")
    )
    prev = sig.select(
        *series_cols,
        (F.col(ts_col) + F.lit(period_us)).alias("_t"),
        F.col(value_col).alias("_vprev"),
    )
    err = F.col("_v") - F.col("_vprev")
    pairs = cur.join(prev, [*series_cols, "_t"]).select(
        *series_cols,
        F.expr(f"(_t div {out_us}) * {out_us}").alias(ts_col),
        err.alias("_err"),
    )
    n = F.count("*").cast("long")
    sum_abs = F.sum(F.abs(F.col("_err"))).cast("long")
    return (
        pairs.groupBy(*series_cols, ts_col)
        .agg(
            n.alias(f"n_paired{suffix}"),
            sum_abs.alias(f"sum_abs_err{suffix}"),
            F.sum("_err").cast("long").alias(f"sum_err{suffix}"),
        )
        .select(
            "*",
            (
                F.col(f"sum_abs_err{suffix}").cast("double")
                / F.col(f"n_paired{suffix}").cast("double")
            ).alias(f"mae{suffix}"),
        )
    )


def ewma_smooth(
    sig: DataFrame,
    slot_us: int,
    window: int = 16,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Gap-aware dyadic exponential smoother (per-slot decay 1/2,
    truncated at ``window`` slots — tail mass 2^-window is below double
    resolution at the default 16, so this IS the EWMA for practical
    purposes).

    Each sample ``(t, v)`` contributes ``v·2^(window-1-j)`` to anchor
    ``t + j·slot_us`` for ``j in 0..window-1``; the denominator sums the
    weights actually present, so grid holes renormalize the kernel —
    the FIR masked-renormalization rule (operators/rollup.py) applied to
    an IIR-shaped kernel. Time-anchored by construction: a gap never
    shifts which sample gets which weight (the lag(k) misalignment trap,
    operators/seasonality.py).

    Plan: explode-to-anchor — ONE shuffle on (series, anchor), map-side
    partial aggregation, no self-join. ``num``/``den`` are BIGINT (the
    weights are Python-literal powers of two), so the single
    ``num/den`` division is the only floating-point op — exact in any
    IEEE engine. Anchors after the last sample of a run are genuine
    decaying forecasts; join back to the signal to keep observed slots
    only."""
    series_cols = list(series_cols)
    jw = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.lit(1 << (window - 1 - j)).cast("long").alias("w"),
                )
                for j in range(window)
            ]
        )
    ).alias("jw")
    contrib = sig.select(
        *series_cols, F.col(ts_col), F.col(value_col), jw
    ).select(
        *series_cols,
        (
            F.col(ts_col) + F.col("jw.j").cast("long") * F.lit(slot_us)
        ).alias(ts_col),
        (F.col(value_col) * F.col("jw.w")).alias("_c"),
        F.col("jw.w").alias("_w"),
    )
    return (
        contrib.groupBy(*series_cols, ts_col)
        .agg(
            F.sum("_c").alias("num"),
            F.sum("_w").alias("den"),
            F.count("*").cast("long").alias("n_present"),
        )
        .select(
            *series_cols,
            ts_col,
            "num",
            "den",
            "n_present",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "ewma"
            ),
        )
    )
