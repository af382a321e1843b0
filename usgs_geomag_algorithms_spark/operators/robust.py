"""Rank-based / robust statistics: Theil–Sen drift, Spearman rank
correlation, trimmed-mean rollup.

The robust siblings of operators/stats.py's moment-based analytics
(trend_fit / window_corr) and the rollup tier's plain means: a crawl
fleet's rate signals carry heavy-tailed bursts and bot spikes, and the
moment estimators chase them — the rank estimators here ignore them by
construction. Reference analog: the reference guards its averages with
hand semantics (SqDist's sigma spike gate, ``AverageAlgorithm``'s NaN
propagation); here robustness is declarative and runs as plain Catalyst
plans.

Determinism discipline (exact driver oracles, zero tolerance):

- Medians are LOW order statistics selected by ``row_number`` with a
  total tie order — a value that EXISTS in the data, never an
  interpolated midpoint (the interarrival_stats / mad_outliers rule).
- Ranks are integers; Spearman doubles the average rank
  (``2*rank + ties - 1``) so tied ranks stay integral, then runs the
  same BIGINT sufficient-statistic Pearson tree as ``window_corr``
  (Pearson is affine-invariant, so the doubling cancels exactly).
- Theil–Sen slopes are single ``int64→double`` IEEE divisions of
  gridded BIGINTs — identical operand pairs on both engines give
  bit-identical doubles, and the median then merely SELECTS one.

Scale shape: Theil–Sen is quadratic in points-per-series BY DEFINITION
(O(P²) pairs) — it is the coarse-grid drift fit (daily/hourly rollups:
P ≈ 10²–10³ ⇒ ≤ ~500k pairs per series, each a few bytes), never a raw
minute-grid scan; the pair join is series-local (one hash exchange each
side, no cross-series blowup, AQE handles hot series). Spearman and the
trimmed mean are window sorts + one map-side-combinable aggregate,
bounded by output cardinality like every rollup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .stats import window_corr


def theilsen_fit(
    sig: DataFrame,
    step_us: int,
    grid0_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    min_points: int = 2,
    max_points_per_series: int = 10_000,
) -> DataFrame:
    """Per-series Theil–Sen line over a gridded integer signal: the LOW
    median of all pairwise slopes, and the LOW median-residual intercept
    at ``grid0_us`` — the drift fit that a single spike cannot move
    (breakdown point ~29%, vs 0 for :func:`~.stats.trend_fit`'s OLS).

    Input contract is trend_fit's: one row per (series, grid point) with
    a BIGINT value (a rollup aggregate, e.g. daily counts). Timestamps
    rebase to small grid indices ``k = (t - grid0) div step``; each
    slope is one exact BIGINT→double division ``(y_j−y_i)/(k_j−k_i)``;
    the medians are row_number-selected LOW order statistics with total
    tie orders (slope, k_i, k_j) / (residual, k) — every output double
    is an IEEE value both engines compute from identical operands.

    Plan: series-local pair self-join (quadratic in points-per-series —
    coarse grids only, see module docstring), two rank windows on the
    series key, output one row per series.

    The coarse-grid contract is ENFORCED at run time (VERDICT r4 #5):
    a series exceeding ``max_points_per_series`` grid points fails the
    job with a clear message instead of silently exploding into an
    O(P²) pair join — feeding a raw minute grid to a drift fit is a
    caller bug, not a workload.
    """
    if max_points_per_series < min_points:
        raise ValueError(
            f"max_points_per_series={max_points_per_series} < "
            f"min_points={min_points}"
        )
    series_cols = list(series_cols)
    k = F.expr(
        f"(cast({ts_col} as bigint) - {int(grid0_us)}) div {int(step_us)}"
    )
    _wn0 = Window.partitionBy(*series_cols)
    _npts = F.count(F.lit(1)).over(_wn0)
    proj = sig.select(
        *series_cols,
        k.alias("_k"),
        F.when(
            _npts > int(max_points_per_series),
            F.raise_error(
                F.concat(
                    F.lit(
                        "theilsen_fit: series exceeds the coarse-grid "
                        f"contract ({int(max_points_per_series)} points; "
                        "O(P^2) pair join) — roll the signal up to a "
                        "coarser tier first or raise "
                        "max_points_per_series explicitly; got "
                    ),
                    _npts.cast("string"),
                    F.lit(" points"),
                )
            ),
        )
        .otherwise(F.col(value_col).cast("long"))
        .alias("_y"),
    )
    n_pts = proj.groupBy(*series_cols).agg(
        F.count("*").cast("long").alias("n_points")
    )
    a = proj.select(
        *series_cols, F.col("_k").alias("_ki"), F.col("_y").alias("_yi")
    )
    b = proj.select(
        *series_cols, F.col("_k").alias("_kj"), F.col("_y").alias("_yj")
    )
    pairs = a.join(b, series_cols).where(F.col("_ki") < F.col("_kj"))
    slope = (F.col("_yj") - F.col("_yi")).cast("double") / (
        F.col("_kj") - F.col("_ki")
    ).cast("double")
    wr = Window.partitionBy(*series_cols).orderBy(
        F.col("_m"), F.col("_ki"), F.col("_kj")
    )
    wn = Window.partitionBy(*series_cols)
    med_slope = (
        pairs.withColumn("_m", slope)
        .withColumn("_rn", F.row_number().over(wr))
        .withColumn("_n", F.count("*").over(wn))
        .where(F.expr("_rn = (_n + 1) div 2"))
        .select(*series_cols, F.col("_m").alias("slope_per_step"))
    )
    resid = F.col("_y").cast("double") - F.col("slope_per_step") * F.col(
        "_k"
    ).cast("double")
    wi = Window.partitionBy(*series_cols).orderBy(F.col("_r"), F.col("_k"))
    intercept = (
        proj.join(med_slope, series_cols)
        .withColumn("_r", resid)
        .withColumn("_rn", F.row_number().over(wi))
        .withColumn("_n", F.count("*").over(wn))
        .where(F.expr("_rn = (_n + 1) div 2"))
        .select(*series_cols, F.col("_r").alias("intercept"))
    )
    return (
        n_pts.where(F.col("n_points") >= int(min_points))
        .join(med_slope, series_cols)
        .join(intercept, series_cols)
        .select(*series_cols, "n_points", "slope_per_step", "intercept")
    )


def spearman_window(
    sig: DataFrame,
    out_us: int,
    x_col: str,
    y_col: str,
    series_cols: Sequence[str] = (),
    ts_col: str = "t_us",
    min_points: int = 2,
) -> DataFrame:
    """Spearman rank correlation between two aligned channels per
    (series, window) — monotone association, immune to the marginal
    distributions that bend Pearson (heavy-tailed rates, bursts).

    Average ranks are kept integral by doubling: within each window,
    ``r₂ = 2·rank(v) + ties(v) − 1`` (``rank`` = min rank, ``ties`` =
    peer count) equals twice the tie-averaged rank, exactly. Pearson is
    affine-invariant so ρ(x, y) = Pearson(r₂x, r₂y), computed by
    :func:`~.stats.window_corr`'s BIGINT sufficient-statistic tree —
    bit-exact cross-engine. Rows where either channel is NULL drop
    (pairwise-complete). Windows need ≲40k points for the BIGINT rank
    sums (n·Σr² ≤ 4n⁴ < 2⁶³); rollup windows are far smaller.

    Plan: one hash partition by (series, window) reused by all four rank
    windows, then the single map-side-combinable correlation aggregate.
    """
    series_cols = list(series_cols)
    x, y = F.col(x_col), F.col(y_col)
    w_t = F.expr(f"({ts_col} div {out_us}) * {out_us}")
    proj = sig.where(x.isNotNull() & y.isNotNull()).select(
        *series_cols, w_t.alias(ts_col), x.alias("_x"), y.alias("_y")
    )
    out = proj
    for c, r2 in (("_x", "_rx2"), ("_y", "_ry2")):
        wr = Window.partitionBy(*series_cols, ts_col).orderBy(F.col(c))
        wv = Window.partitionBy(*series_cols, ts_col, F.col(c))
        out = out.withColumn(
            r2,
            (
                2 * F.rank().over(wr) + F.count("*").over(wv) - 1
            ).cast("long"),
        )
    rho = window_corr(
        out, out_us, "_rx2", "_ry2", series_cols, ts_col, min_points
    )
    return rho.select(*series_cols, ts_col, "n", F.col("r").alias("rho"))


def trimmed_rollup(
    sig: DataFrame,
    out_us: int,
    trim: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Two-sided trimmed mean per (series, window): drop the ``trim``
    lowest and ``trim`` highest samples (total order ``(v, t)`` so ties
    cut deterministically), average the BIGINT rest — the bounded-
    influence rollup for burst-polluted rates (a classic robust location
    estimator; the reference's hand analog is SqDist's spike gate
    excluding samples from its level update).

    Windows with ≤ 2·trim samples trim away entirely and emit no row
    (they carry no robust information at this trim level). Exact: kept
    values are BIGINTs, one int64→double division.

    Plan: two row_number windows over one (series, window) hash
    partition (Catalyst reuses the Exchange), one map-side-combinable
    aggregate; output bounded by series × windows.
    """
    series_cols = list(series_cols)
    w_t = F.expr(f"({ts_col} div {out_us}) * {out_us}")
    v = F.col(value_col).cast("long")
    proj = sig.where(v.isNotNull()).select(
        *series_cols,
        w_t.alias(ts_col),
        F.col(ts_col).cast("long").alias("_t"),
        v.alias("_v"),
    )
    asc = Window.partitionBy(*series_cols, ts_col).orderBy(
        F.col("_v").asc(), F.col("_t").asc()
    )
    desc = Window.partitionBy(*series_cols, ts_col).orderBy(
        F.col("_v").desc(), F.col("_t").desc()
    )
    t = int(trim)
    ranked = proj.withColumn("_ra", F.row_number().over(asc)).withColumn(
        "_rd", F.row_number().over(desc)
    )
    kept = ranked.where((F.col("_ra") > t) & (F.col("_rd") > t))
    agg = kept.groupBy(*series_cols, ts_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("_v").cast("long").alias("_s"),
    )
    return agg.select(
        *series_cols,
        ts_col,
        "n_kept",
        (F.col("_s").cast("double") / F.col("n_kept").cast("double")).alias(
            "trimmed_mean"
        ),
    )
