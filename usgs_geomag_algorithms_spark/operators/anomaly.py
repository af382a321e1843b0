"""Rolling z-score anomaly detection over a gridded integer signal.

The streaming-monitor analog of the reference's SqDist spike gate
(``geomagio/algorithm/SqDistAlgorithm.py`` sigma-threshold path — see
operators/sqdist.py): a sample is anomalous when it deviates from the
trailing-window mean by more than ``threshold`` trailing standard
deviations. Where SqDist maintains exponential-smoothing state, this
operator is stateless-declarative: one window pass, exact arithmetic.

Determinism-by-construction (the reason the driver oracle is exact):
the trailing mean/variance are computed from INTEGER window sums
(Σv, Σv², n) — integer addition in any order is exact, so both engines
produce bit-identical sums — and the variance uses the textbook
``(Σv² − (Σv)²/n) / (n−1)`` expression evaluated in the same tree shape
on both sides, followed by an IEEE-correctly-rounded sqrt. No Welford /
streaming-moment aggregates (Spark's stddev and DuckDB's are both
incremental and ORDER-DEPENDENT in fp — they cannot be oracle-matched).

Scale shape: one shuffle keyed on the series; the ROWS frame is a single
forward pass per series partition. Integer-sum preconditions: |v| and
window length such that Σv² fits a BIGINT (raised here: counts per grid
slot ≪ 2^31, window ≤ 2^31 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_zscore(
    sig: DataFrame,
    window: int = 60,
    min_points: int = 30,
    threshold: float = 3.0,
    series_cols: tuple[str, ...] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Per series: z-score of each integer sample against the trailing
    ``window`` samples (frame EXCLUDES the current row — the sample must
    not contaminate its own baseline). ``z`` is NULL until ``min_points``
    trailing samples exist or when the trailing variance is zero;
    ``is_anomaly`` is NULL iff z is NULL.

    Output: series + ts + v + n_trail + z (4 dp) + is_anomaly.
    """
    series_cols = list(series_cols)
    v = F.col(value_col)
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(-window, -1)
    )
    s1 = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    n = F.count(v).over(w)
    base = sig.select(
        *series_cols,
        ts_col,
        v.alias(value_col),
        s1.alias("_s1"),
        s2.alias("_s2"),
        n.alias("n_trail"),
    )
    nn = F.col("n_trail")
    mean = F.col("_s1") / nn
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / nn) / (nn - 1)
    z = F.when(
        (nn >= min_points) & (var > 0),
        F.round((v - mean) / F.sqrt(var), 4),
    )
    return base.select(
        *series_cols,
        ts_col,
        value_col,
        "n_trail",
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) >= threshold).alias("is_anomaly"),
    )


def robust_window_stats(
    sig: DataFrame,
    out_us: int,
    series_cols: "Sequence[str]" = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Per (series, window): LOW-median and MAD of an INTEGER signal —
    the robust location/scale pair behind outlier gates that a handful
    of spikes cannot drag (unlike the mean/stddev the z-score uses).

    Exactness: the low median is the order statistic at ``(n+1) div 2``
    of the sorted values — an INTEGER, never an interpolated half (the
    NOTES.md percentile-ulp trap does not exist here), and the MAD is
    the same statistic of ``|v − med|``, computed from ONE collected
    array with pure array expressions (``transform`` + ``array_sort``) —
    one aggregate pass, no second shuffle.

    Scale shape: group state is the collected window — bounded by the
    decimation ratio when run tier-over-tier (the
    :func:`operators.rollup.quantile_rollup` affordability argument);
    for unbounded raw groups use the histogram tier instead.
    """
    series_cols = list(series_cols)
    grouped = sig.groupBy(
        *series_cols,
        F.expr(f"({ts_col} div {out_us}) * {out_us}").alias(ts_col),
    ).agg(
        F.sort_array(F.collect_list(F.col(value_col).cast("long"))).alias(
            "_arr"
        )
    )
    n = F.size("_arr").cast("long")
    med = F.element_at("_arr", ((n + 1) / 2).cast("int"))
    mad = F.element_at(
        F.array_sort(
            F.transform(F.col("_arr"), lambda x: F.abs(x - med))
        ),
        ((n + 1) / 2).cast("int"),
    )
    return grouped.select(
        *series_cols,
        ts_col,
        n.alias("n"),
        med.alias("med"),
        mad.alias("mad"),
    )


def mad_outliers(
    sig: DataFrame,
    out_us: int,
    k: int = 3,
    series_cols: "Sequence[str]" = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Flag samples whose deviation from their window's low-median
    exceeds ``k·MAD`` — all-integer comparison (``|v − med| > k·mad``),
    exact on any engine.  A constant-majority window has ``mad = 0``,
    where ANY deviation flags (the textbook MAD-gate caveat — pair with
    a minimum-deviation floor upstream if that bites).

    The stats join back on the same (series, window) keys the aggregate
    produced — one shuffle keyed (series, window) reused by both sides.
    """
    series_cols = list(series_cols)
    stats = robust_window_stats(
        sig, out_us, series_cols=series_cols, ts_col=ts_col,
        value_col=value_col,
    ).withColumnRenamed(ts_col, "_w")
    keyed = sig.select(
        *series_cols,
        F.col(ts_col),
        F.col(value_col).cast("long").alias("v"),
        F.expr(f"({ts_col} div {out_us}) * {out_us}").alias("_w"),
    )
    dev = F.abs(F.col("v") - F.col("med"))
    return keyed.join(stats, on=series_cols + ["_w"]).select(
        *series_cols,
        ts_col,
        "v",
        "med",
        "mad",
        dev.alias("abs_dev"),
        (dev > F.lit(int(k)) * F.col("mad")).alias("is_outlier"),
    )
