"""Core downsampling operator: one cascade step as a declarative Spark plan.

Semantics replicated from the reference's ``FilterAlgorithm.firfilter``
(``geomagio/algorithm/FilterAlgorithm.py:343-392``): for every output slot,
a dot product of normalized window coefficients against the input samples in
the slot's data window, with

- NaN/absent samples masked out,
- the result renormalized by the sum of the weights of *valid* samples,
- the output masked (NULL) when the missing-weight fraction exceeds
  ``allowed_bad`` (0.1),
- output slots emitted only where the full window fits inside the scanned
  input range (the strided-view edge rule + ``align_trace`` trimming,
  ``FilterAlgorithm.py:309-341,367-369``),
- "average" steps center-stamped (hour at HH:29:30, day at 11:59:30) and
  "firfilter" steps stamped on the output grid (``get_nearest_time``,
  ``FilterAlgorithm.py:66-89``).

Spark-first design — why this is NOT an applyInPandas port
----------------------------------------------------------
A grouped-pandas implementation would shuffle *every input row* to its
series group and run Python. Instead:

- "average" steps (boxcar weights) are a plain ``groupBy`` aggregate:
  uniform weights make the masked-renormalized dot identical to the mean of
  valid samples, and the 10% rule an integer count predicate. Map-side
  partial aggregation collapses each 60/1440-sample window to one partial
  row *before* the shuffle.
- "firfilter" steps explode each input sample to the (ceil(numtaps/
  decimation)+1, e.g. ~2.5 for 1s->1min) output anchors whose window
  contains it, look the tap weight up in a *literal array*
  (``element_at`` — constant-folded, whole-stage-codegen'd), and aggregate.
  Shuffle volume after partial aggregation is bounded by the *output*
  cardinality (decimated), not the input.

Both paths shuffle on ``(series, output_anchor)`` — the same key every
downstream tier groups on — and contain zero Python. Gap rows need never be
materialized: an absent row and a NULL/NaN row contribute identically
(nothing) to both the weighted sum and the valid-weight sum.

Timestamps are integer epoch microseconds (``t_us``) end-to-end: exact
arithmetic at any tier including 10 Hz, no float grid drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..tiers import Step

#: numeric guard for the strict ``weight_sum < 1 - allowed_bad`` mask of the
#: reference (np.ma.masked_less) under summation-order fp differences.
_EPS = 1e-9


def _floordiv(a: Column, b: int) -> Column:
    # exact floor division on longs (Spark's `div` truncates toward zero)
    return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")


def _ceildiv(a: Column, b: int) -> Column:
    return -_floordiv(-a, b)


def _valid(value: Column) -> Column:
    """Gap test: NULL and NaN are both gaps (reference carries gaps as
    in-band NaN, ``geomagio/TimeseriesUtility.py:62``; our long format also
    allows the row to simply be absent)."""
    return value.isNotNull() & ~F.isnan(value)


def rollup_step(
    df: DataFrame,
    step: Step,
    range_start_us: int | None = None,
    range_end_us: int | None = None,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    allowed_bad: float = 0.1,
    emit_coverage: bool = False,
) -> DataFrame:
    """Apply one cascade step to a long-format frame.

    Parameters
    ----------
    df:
        columns ``series_cols + [ts_col(long, epoch us), value_col(double)]``
        on a regular ``step.input_sample_period`` grid (gap rows may be
        absent or NULL/NaN).
    range_start_us / range_end_us:
        the scanned input coverage; output slots are emitted only where the
        full filter window lies inside ``[range_start_us, range_end_us]``.
        When omitted, the *global* min/max of ``ts_col`` is used (one cheap
        pre-aggregate). The cascade planner always passes these explicitly
        (computed via ``tiers.get_input_interval_us``), keeping the operator
        a single-pass plan.
    emit_coverage:
        also emit ``weight_sum`` (fraction of valid input weight) and
        ``n_valid`` — used by monitoring and incremental refresh.
    """
    series_cols = list(series_cols)
    out_us = step.out_us
    in_us = step.in_us
    hw = step.half_width_us

    if range_start_us is None or range_end_us is None:
        lo, hi = df.select(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).first()
        if lo is None:
            return _empty_like(df, series_cols, ts_col, value_col, emit_coverage)
        range_start_us = range_start_us if range_start_us is not None else lo
        range_end_us = range_end_us if range_end_us is not None else hi

    t = F.col(ts_col)
    v = F.col(value_col)
    valid = _valid(v)

    if step.type == "average":
        # one output anchor per input sample: interval start s = floor(t/out)
        anchor = (_floordiv(t, out_us) * out_us).alias("_anchor")
        numtaps = step.numtaps
        grouped = (
            df.where(t.between(range_start_us, range_end_us))
            # drop off-grid samples defensively (same guard as the FIR
            # path: the reference's dense-array view cannot see them, and
            # a stray row would otherwise inflate the coverage count)
            .where(F.pmod(t, F.lit(in_us)) == 0)
            .groupBy(*series_cols, anchor)
            .agg(
                F.sum(F.when(valid, v)).alias("_vsum"),
                F.count(F.when(valid, True)).alias("_nvalid"),
            )
        )
        # uniform weights: weight_sum == n_valid/numtaps; the reference
        # masks weight_sum < 1 - allowed_bad strictly. Exact rational
        # predicate (no fp boundary): valid iff n_valid*q >= numtaps*(q-p)
        # with allowed_bad = p/q — for the default 0.1 this is the
        # n_valid*10 >= numtaps*9 rule.
        from fractions import Fraction

        ab = Fraction(str(allowed_bad)).limit_denominator(1_000_000)
        ok = F.col("_nvalid") * ab.denominator >= numtaps * (
            ab.denominator - ab.numerator
        )
        value_out = F.when(ok, F.col("_vsum") / F.col("_nvalid"))
        weight_sum = F.col("_nvalid") / F.lit(float(numtaps))
        # full window must fit in scanned range (window = [s, s+out-in])
        eligible = (F.col("_anchor") >= F.lit(range_start_us)) & (
            F.col("_anchor") + F.lit(out_us - in_us) <= F.lit(range_end_us)
        )
        stamp = F.col("_anchor") + F.lit(step.stamp_offset_us)
    else:
        w = step.normalized_window
        w_arr = F.array(*[F.lit(float(x)) for x in w])
        # candidate output anchors k*out with |t - k*out| <= hw
        k_lo = _ceildiv(t - F.lit(hw), out_us)
        k_hi = _floordiv(t + F.lit(hw), out_us)
        ks = F.when(k_hi >= k_lo, F.sequence(k_lo, k_hi))
        exploded = (
            df.where(t.between(range_start_us, range_end_us))
            # drop off-grid samples defensively (reference assumes grid)
            .where(F.pmod(t, F.lit(in_us)) == 0)
            .select(
                *series_cols,
                t.alias("_t"),
                v.alias("_v"),
                F.explode(ks).alias("_k"),
            )
            .withColumn(
                "_tap",
                ((F.col("_t") - (F.col("_k") * out_us - F.lit(hw))) / F.lit(in_us))
                .cast("int"),
            )
            .where(F.col("_tap").between(0, step.numtaps - 1))
            .withColumn("_w", F.element_at(w_arr, F.col("_tap") + 1))
        )
        vv = F.col("_v")
        valid2 = _valid(vv)
        grouped = exploded.groupBy(*series_cols, F.col("_k")).agg(
            F.sum(F.when(valid2, F.col("_w") * vv)).alias("_vsum"),
            F.sum(F.when(valid2, F.col("_w"))).alias("_wsum"),
            F.count(F.when(valid2, True)).alias("_nvalid"),
        )
        ok = F.col("_wsum") >= F.lit(1.0 - allowed_bad - _EPS)
        value_out = F.when(ok, F.col("_vsum") / F.col("_wsum"))
        weight_sum = F.coalesce(F.col("_wsum"), F.lit(0.0))
        center = F.col("_k") * out_us
        eligible = (center - F.lit(hw) >= F.lit(range_start_us)) & (
            center + F.lit(hw) <= F.lit(range_end_us)
        )
        stamp = center

    out_cols = [
        *series_cols,
        stamp.cast("long").alias(ts_col),
        value_out.cast("double").alias(value_col),
    ]
    if emit_coverage:
        out_cols += [
            weight_sum.cast("double").alias("weight_sum"),
            F.coalesce(F.col("_nvalid"), F.lit(0)).cast("long").alias("n_valid"),
        ]
    return grouped.where(eligible).select(*out_cols)


def _empty_like(df, series_cols, ts_col, value_col, emit_coverage):
    cols = [F.col(c) for c in series_cols] + [
        F.col(ts_col).cast("long").alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    ]
    if emit_coverage:
        cols += [
            F.lit(0.0).alias("weight_sum"),
            F.lit(0).cast("long").alias("n_valid"),
        ]
    return df.select(*cols).limit(0)


def quantile_rollup(
    sig: DataFrame,
    out_us: int,
    ps: Sequence[float] = (0.5, 0.95),
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Distribution rollup tier: EXACT per-window quantiles of an already
    gridded signal (p50/p95 of the minute signal per hour, etc.) — the
    distributional complement of the mean-based boxcar tiers.

    Uses Spark's exact ``percentile`` aggregate (linear interpolation at
    rank p*(n-1) — the same type-7 rule as DuckDB ``quantile_cont`` and
    NumPy's default), NOT ``approx_percentile``: the input of a rollup
    tier is the *previous tier's output*, so group size is bounded by the
    decimation ratio (60 minutes/hour, 24 hours/day) and the sort-based
    exact aggregate is O(ratio log ratio) per group — group state is
    bounded by construction, which is what makes exactness affordable at
    100 TB. For quantiles over UNBOUNDED groups (raw events per key), use
    ``approx_percentile`` and accept the sketch error — tested for
    agreement in tests/test_rollup.py.

    Output: series + window-start ``t_us`` + one ``p<nn>`` column per
    requested quantile (rounded 4 dp, NaN-free inputs assumed as per the
    tier convention) + ``n_values``. All computed in ONE aggregate pass —
    a single shuffle keyed (series, window), map-side partial collection.
    """
    series_cols = list(series_cols)
    v = F.col(value_col)
    valid = v.isNotNull() & ~F.isnan(v)
    grouped = (
        sig.where(valid)
        .groupBy(
            *series_cols,
            F.expr(f"({ts_col} div {out_us}) * {out_us}").alias("_w"),
        )
        .agg(
            F.percentile(value_col, list(ps)).alias("_q"),
            F.count("*").alias("n_values"),
        )
    )
    return grouped.select(
        *series_cols,
        F.col("_w").alias(ts_col),
        *[
            F.round(F.element_at("_q", i + 1), 4).alias(
                f"p{str(p).replace('0.', '').ljust(2, '0')}"
            )
            for i, p in enumerate(ps)
        ],
        "n_values",
    )


def histogram_rollup(
    sig: DataFrame,
    out_us: int,
    bin_width: float,
    n_bins: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-bin histogram tier: per (series, window), the count of
    samples per value bin — the mergeable distribution sketch that sits
    beside :func:`quantile_rollup` (exact order statistics, bounded
    groups) in the rollup family.  Unlike a quantile, histogram counts
    COMPOSE across windows and tiers by plain addition, so hour
    histograms roll into day histograms without touching raw samples —
    the property that makes this the 100 TB-scale distribution store
    (one map-side-combined aggregation, shuffle bounded by
    series x windows x bins, never by sample count).

    ``bin = clamp(floor(value / bin_width), 0, n_bins-1)`` — values
    below 0 clamp into bin 0, values at/above the top edge into the
    overflow bin ``n_bins-1``.  Integer counts -> bit-exact oracle.
    Empty bins emit no row (sparse representation; the dense form is one
    gapfill away).
    """
    series_cols = list(series_cols)
    raw = F.floor(F.col(value_col) / F.lit(float(bin_width)))
    bin_ = F.least(
        F.greatest(raw, F.lit(0)), F.lit(int(n_bins) - 1)
    ).cast("int")
    return (
        sig.groupBy(
            *series_cols,
            F.expr(f"({ts_col} div {out_us}) * {out_us}").alias(ts_col),
            bin_.alias("bin"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )


def histogram_merge(
    hist: DataFrame,
    out_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
) -> DataFrame:
    """Roll a fine histogram tier into a coarser one by PLAIN ADDITION —
    the mergeability property that makes :func:`histogram_rollup` the
    distribution sketch of the tier family (HLL merges by union, CMS and
    histograms by addition).  Hour→day touches only series × windows ×
    bins rows, never raw samples; one map-side-combined aggregation."""
    series_cols = list(series_cols)
    return (
        hist.groupBy(
            *series_cols,
            F.expr(f"({ts_col} div {out_us}) * {out_us}").alias(ts_col),
            "bin",
        )
        .agg(F.sum("n").cast("long").alias("n"))
    )


def histogram_quantile(
    hist: DataFrame,
    q_num: int,
    q_den: int,
    bin_width: float,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
) -> DataFrame:
    """Quantile estimate per (series, window) from a (sparse) histogram
    tier: the smallest bin whose cumulative count reaches
    ``ceil(q · total)``, with ``q = q_num/q_den`` carried as an INTEGER
    fraction — the threshold ``(q_num·total + q_den − 1) div q_den`` and
    the cumulative walk are all BIGINT, so the picked bin is exact and
    engine-portable (no double q, no interpolation ulp; NOTES.md
    percentile lesson).  Output: picked ``bin`` plus its value edges
    ``[bin·w, (bin+1)·w)`` — the histogram's resolution IS the error
    bound, reported rather than hidden.

    Scale shape: one cumulative window per (series, window) over ≤
    n_bins rows + the same-keyed aggregate — both reuse one hash
    partitioning; input is tier-sized, never sample-sized.
    """
    if not (0 < q_num <= q_den):
        raise ValueError(f"need 0 < q_num <= q_den, got {q_num}/{q_den}")
    series_cols = list(series_cols)
    w = Window.partitionBy(*series_cols, ts_col).orderBy(F.col("bin").asc())
    cum = hist.select(
        *series_cols,
        ts_col,
        "bin",
        "n",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long").alias("_cum"),
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("long").alias("total"),
    )
    thr = F.expr(f"({q_num} * total + {q_den - 1}) div {q_den}")
    picked = (
        cum.where(F.col("_cum") >= thr)
        .groupBy(*series_cols, ts_col)
        .agg(
            F.min("bin").alias("bin"),
            F.min_by("total", "bin").alias("total"),
        )
    )
    wd = F.lit(float(bin_width))
    return picked.select(
        *series_cols,
        ts_col,
        "bin",
        "total",
        (F.col("bin").cast("double") * wd).alias("value_lo"),
        ((F.col("bin") + 1).cast("double") * wd).alias("value_hi"),
    )
