"""Bucketed serving statistics: OHLC, time-weighted average, and
cross-channel correlation.

Three members of the rollup family that serve dashboards and
cross-channel analysis rather than the retention cascade:

- :func:`ohlc_rollup` — open/high/low/close per window, the candlestick
  reduction (first/last by timestamp + min/max).
- :func:`time_weighted_avg` — the irregular-sample average weighted by
  LOCF segment duration (TimescaleDB's ``time_weight('locf')``
  semantics): a plain ``avg`` over-weights bursts; duration weighting is
  the physically meaningful mean for sampled step signals like fetch
  cadence or byte counters.
- :func:`window_corr` — per-window Pearson correlation between two
  channels, the cross-channel analytic sibling of the reference's
  Average/DeltaF family (``geomagio/algorithm/AverageAlgorithm.py``,
  ``DeltaFAlgorithm.py`` — cross-channel math over aligned grids).

Determinism (exact driver oracles, zero rounding): every operator here
reduces to BIGINT sums (order-independent), followed by the identical
int64→double expression tree on both engines — the same discipline as
operators/anomaly.py; correlation keeps ``sqrt`` factored exactly as
written so both engines evaluate the same IEEE tree.

Scale shape: all three are single-shuffle map-side-combinable
aggregations bounded by output cardinality (series × windows).
``time_weighted_avg`` adds a lead-window pass (per-series sort — the
DbDt halo note applies at 100 TB) and a bounded per-segment explode
(segments crossing window boundaries split per window — amplification
≤ segment span / window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def ohlc_rollup(
    sig: DataFrame,
    out_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Per (series, window): open (earliest sample), high, low, close
    (latest sample), sample count.  One map-side-combined aggregation;
    ``min_by``/``max_by`` keep the open/close picks inside codegen."""
    series_cols = list(series_cols)
    t, v = F.col(ts_col), F.col(value_col)
    return (
        sig.groupBy(
            *series_cols,
            F.expr(f"({ts_col} div {out_us}) * {out_us}").alias(ts_col),
        )
        .agg(
            F.min_by(v, t).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, t).alias("close"),
            F.count("*").cast("long").alias("n_samples"),
        )
    )


def time_weighted_avg(
    samples: DataFrame,
    out_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    max_segment_us: int | None = None,
) -> DataFrame:
    """LOCF time-weighted average per (series, window) over IRREGULAR
    samples: each sample's value holds until the next sample (or the end
    of its series), and each window averages the step function over the
    time it is covered.

    A sample's segment ``[t_i, t_{i+1})`` may span several windows; it
    is split per window with an exact clip (bounded explode).  The last
    sample of a series contributes a zero-length segment (its value
    appears only through ``ohlc``-style close semantics, not here) — so
    a window containing only the series' final sample emits nothing.

    ``max_segment_us`` is the stale-series escape hatch (docs/SCALE.md):
    without it a silent series' one segment spans months and explodes to
    months/window rows.  With it, LOCF validity expires after the TTL —
    the segment is clamped to ``[t_i, t_i + max_segment_us)``, bounding
    the per-row explode at ``max_segment_us / out_us`` and leaving the
    un-sampled remainder honestly uncovered (smaller ``covered_us``).

    Output per row: ``weighted_us`` (Σ value·µs, BIGINT-exact for
    integer values), ``covered_us`` (Σ µs), and their single
    correctly-rounded double quotient ``twa``.
    """
    series_cols = list(series_cols)
    t, v = F.col(ts_col), F.col(value_col)
    w = Window.partitionBy(*series_cols).orderBy(t.asc())
    nxt = F.lead(t).over(w)
    if max_segment_us is not None:
        # clamp only real segments — least() skips NULLs, which would
        # resurrect the final sample as a TTL-length segment
        nxt = F.when(
            nxt.isNotNull(), F.least(nxt, t + F.lit(int(max_segment_us)))
        )
    seg = samples.select(
        *series_cols,
        t.alias("_t0"),
        nxt.alias("_t1"),
        v.alias("_v"),
    ).where(F.col("_t1").isNotNull())
    out = F.lit(int(out_us))
    # windows the segment touches: anchor(t0) .. anchor(t1 - 1);
    # integer `div` — never double division on epoch-us longs
    win = F.explode(
        F.sequence(
            F.expr(f"(_t0 div {int(out_us)}) * {int(out_us)}"),
            F.expr(f"((_t1 - 1) div {int(out_us)}) * {int(out_us)}"),
            out,
        )
    ).alias(ts_col)
    clipped = seg.select(*series_cols, "_t0", "_t1", "_v", win)
    lo = F.greatest(F.col("_t0"), F.col(ts_col))
    hi = F.least(F.col("_t1"), F.col(ts_col) + out)
    dur = (hi - lo).cast("long")
    return (
        clipped.groupBy(*series_cols, ts_col)
        .agg(
            F.sum(F.col("_v") * dur).cast("long").alias("weighted_us"),
            F.sum(dur).cast("long").alias("covered_us"),
        )
        .select(
            *series_cols,
            ts_col,
            "weighted_us",
            "covered_us",
            (
                F.col("weighted_us").cast("double")
                / F.col("covered_us").cast("double")
            ).alias("twa"),
        )
    )


def window_corr(
    sig: DataFrame,
    out_us: int,
    x_col: str,
    y_col: str,
    series_cols: Sequence[str] = (),
    ts_col: str = "t_us",
    min_points: int = 2,
    exact_decimal: bool = False,
) -> DataFrame:
    """Pearson correlation between two aligned integer channels per
    (series, window), from BIGINT sufficient statistics:

    ``r = (nΣxy − ΣxΣy) / (sqrt(nΣx² − (Σx)²) · sqrt(nΣy² − (Σy)²))``

    NULL when fewer than ``min_points`` aligned samples or either
    channel is constant.  Spark's ``corr()`` (and DuckDB's) are
    order-dependent streaming moments and cannot be oracle-matched; the
    integer-sum form is exact.  Rows where either channel is NULL are
    dropped (pairwise-complete semantics).

    ``exact_decimal=True`` is the span-ceiling escape hatch
    (docs/SCALE.md): BIGINT Σxy silently wraps once |v| exceeds
    ~2×10⁹·√n per window — the decimal(38,0) path keeps the sufficient
    statistics exact to 10³⁸ at ~2× the aggregation cost."""
    series_cols = list(series_cols)
    # the integer contract is enforced at the INPUT (per-row truncating
    # cast) so both statistic paths quantize identically — the old
    # behavior truncated the default path's SUMS but the decimal path's
    # ROWS, silently diverging on fractional inputs; a no-op for the
    # integer-typed channels the operator documents
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    if exact_decimal:
        xd = x.cast("decimal(19,0)")
        yd = y.cast("decimal(19,0)")
        sums = [
            F.sum(xd).cast("decimal(38,0)").alias("sx"),
            F.sum(yd).cast("decimal(38,0)").alias("sy"),
            F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
            F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
            F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
        ]
    else:
        sums = [
            F.sum(x).cast("long").alias("sx"),
            F.sum(y).cast("long").alias("sy"),
            F.sum(x * y).cast("long").alias("sxy"),
            F.sum(x * x).cast("long").alias("sxx"),
            F.sum(y * y).cast("long").alias("syy"),
        ]
    stats = (
        sig.where(x.isNotNull() & y.isNotNull())
        .groupBy(
            *series_cols,
            F.expr(f"({ts_col} div {out_us}) * {out_us}").alias(ts_col),
        )
        .agg(F.count("*").cast("long").alias("n"), *sums)
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = F.when(
        (n >= min_points) & (dx > 0) & (dy > 0),
        num / (F.sqrt(dx) * F.sqrt(dy)),
    )
    return stats.select(*series_cols, ts_col, "n", r.alias("r"))


def period_over_period(
    sig: DataFrame,
    period_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Calendar comparison per (series, slot): current value vs the value
    exactly one ``period_us`` earlier — the day-over-day / week-over-week
    dashboard primitive.

    Pairing is by EXACT shifted timestamp (self-join), the same
    gap-robustness rule as :func:`operators.seasonality.acf_lags` — a
    row-offset ``lag()`` silently compares against the wrong slot across
    grid holes.  Slots with no prior-period observation emit NULL
    ``v_prev``/``delta``/``ratio`` (left join — a new series' first
    period still reports); a prior of 0 yields NULL ratio, not ±Inf.

    Exactness: ``delta`` is BIGINT; ``ratio`` is one int64/int64 double
    division.  Scale shape: one self-join on (series, ts) — both sides
    hash-partition identically (co-partitioned off the same tier-store
    bucketing); no windows, no explode.
    """
    series_cols = list(series_cols)
    cur = sig.select(
        *series_cols,
        F.col(ts_col),
        F.col(value_col).cast("long").alias("v"),
    )
    prev = sig.select(
        *series_cols,
        (F.col(ts_col) + F.lit(int(period_us))).alias(ts_col),
        F.col(value_col).cast("long").alias("v_prev"),
    )
    joined = cur.join(prev, on=series_cols + [ts_col], how="left")
    ratio = F.when(
        F.col("v_prev") != 0,
        F.col("v").cast("double") / F.col("v_prev").cast("double"),
    )
    return joined.select(
        *series_cols,
        ts_col,
        "v",
        "v_prev",
        (F.col("v") - F.col("v_prev")).alias("delta"),
        ratio.alias("ratio"),
    )

def interarrival_stats(
    df: DataFrame,
    key_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
) -> DataFrame:
    """Inter-arrival (revisit-cadence) statistics per key: the gaps
    between consecutive event timestamps, summarized as count / min /
    LOW-median / max / mean.

    The crawl-scheduling primitive of a web-scale ingest: a url's
    observed fetch cadence tells the refresh planner how often content
    actually changes hands (reference analog: the per-channel sampling
    cadence geomag factories take as CONFIGURED metadata — here it is
    measured).  Feeds `detect_gaps`' expectations and the rollup tier
    choice the same way `dominant_period` does.

    Exactness: gaps are BIGINT micros; the median is the LOW order
    statistic (rank ``(n+1) div 2`` with (gap, ts) tie order) — an
    integer that exists in the data, never an interpolated half (the
    mad_outliers discipline); mean is one int64/int64 double division.

    Plan: ONE hash partitioning by key reused by both windows (the lag
    and the rank — same partition keys, Catalyst reuses the Exchange),
    then a map-side-combinable aggregate joined back to the selected
    median row on the same key.  No arrays collected, no per-key state
    beyond the windows — safe at 10^8 keys x arbitrary events/key.
    """
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    gaps = (
        df.select(*key_cols, F.col(ts_col).cast("long").alias(ts_col))
        .withColumn("_gap", F.col(ts_col) - F.lag(ts_col).over(w))
        .where(F.col("_gap").isNotNull())
    )
    agg = gaps.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("_gap").cast("long").alias("min_gap"),
        F.max("_gap").cast("long").alias("max_gap"),
        F.sum("_gap").cast("long").alias("_sum_gap"),
    )
    wr = Window.partitionBy(*key_cols).orderBy(F.col("_gap"), F.col(ts_col))
    wn = Window.partitionBy(*key_cols)
    med = (
        gaps.withColumn("_rn", F.row_number().over(wr))
        .withColumn("_n", F.count("*").over(wn))
        .where(F.expr("_rn = (_n + 1) div 2"))
        .select(*key_cols, F.col("_gap").alias("med_gap"))
    )
    return agg.join(med, key_cols).select(
        *key_cols,
        "n_gaps",
        "min_gap",
        "med_gap",
        "max_gap",
        (F.col("_sum_gap").cast("double") / F.col("n_gaps").cast("double")).alias(
            "mean_gap"
        ),
    )

def trend_fit(
    sig: DataFrame,
    step_us: int,
    grid0_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
    min_points: int = 3,
) -> DataFrame:
    """Per-series OLS trend line over a gridded integer signal — the
    drift detector (is this channel's level moving, and how fast?):
    slope per grid step, intercept at ``grid0_us``, and R².

    Reference analog: the linear trend SqDist carries as smoothed state
    (``SqDistAlgorithm`` b-term) — here fit directly, so a fleet-wide
    drift scan is ONE aggregate instead of a stateful pass per series.

    Exactness discipline: timestamps are rebased to small grid indices
    ``k = (t - grid0) div step`` (epoch-microsecond squares would
    overflow int64); per-row products stay in int64, but the SUMS
    accumulate as ``decimal(38,0)`` — a year-scale minute grid with
    millions of points pushes Σk² past 2^63 (measured: long overflow at
    the 100x probe), and DuckDB's SUM(BIGINT) is already HUGEINT, so
    exact 128-bit sums keep the two engines identical. The final
    slope/intercept/R² trees are fixed exact→double IEEE expressions
    (decimal→double and HUGEINT→double both round-to-nearest of the
    same exact integer). NULL when fewer than ``min_points`` rows or a
    degenerate time spread; R² NULL for constant series.

    Plan: map-only projection + one map-side-combinable aggregate,
    output bounded by series count — the same rides-the-scan envelope
    as ``harmonic_power``.
    """
    series_cols = list(series_cols)
    k = F.expr(f"(cast({ts_col} as bigint) - {int(grid0_us)}) div {int(step_us)}")
    y = F.col(value_col).cast("long")
    proj = sig.select(
        *series_cols,
        k.alias("_k"),
        y.alias("_y"),
    )
    dec = "decimal(38,0)"
    agg = proj.groupBy(*series_cols).agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum(F.col("_k").cast(dec)).alias("_sk"),
        F.sum(F.col("_y").cast(dec)).alias("_sy"),
        F.sum((F.col("_k") * F.col("_y")).cast(dec)).alias("_sky"),
        F.sum((F.col("_k") * F.col("_k")).cast(dec)).alias("_skk"),
        F.sum((F.col("_y") * F.col("_y")).cast(dec)).alias("_syy"),
    )
    n = F.col("n_points").cast("double")
    sk = F.col("_sk").cast("double")
    sy = F.col("_sy").cast("double")
    sky = F.col("_sky").cast("double")
    skk = F.col("_skk").cast("double")
    syy = F.col("_syy").cast("double")
    num = n * sky - sk * sy
    denk = n * skk - sk * sk
    deny = n * syy - sy * sy
    ok = (F.col("n_points") >= min_points) & (denk > 0)
    slope = num / denk
    return agg.select(
        *series_cols,
        "n_points",
        F.when(ok, slope).alias("slope_per_step"),
        F.when(ok, (sy - slope * sk) / n).alias("intercept"),
        F.when(ok & (deny > 0), (num * num) / (denk * deny)).alias("r2"),
    )
