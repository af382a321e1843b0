"""Gap-filling with last-observation-carried-forward and linear
interpolation over a gridded signal — the serving-side completion of the
engine's pad/fill semantics.

The reference pads gaps with NaN and explicitly never interpolates on
merge (``geomagio/TimeseriesUtility.py:486-494`` — obspy merge with
``interpolation_samples=0``, NaN fill); its SqDist path is the only
place values are synthesized.  Downstream consumers (plots, rollup
serving, model feature frames) still need dense series, so this operator
is the engine extension that materializes them — the continuous-
aggregate-world analog of TimescaleDB's ``time_bucket_gapfill`` +
``locf()`` + ``interpolate()``.

Determinism-by-construction (why the driver oracle is exact): for
integer-valued signals the interpolated value is computed as an exact
rational — ``(prev_v*(m-k) + next_v*k) / m`` with ``k``/``m`` gap
offsets in SLOT units (small integers) — so the numerator is an exact
BIGINT on both engines and the single int64→double division is IEEE
correctly-rounded, bit-identical everywhere.  No intermediate float
arithmetic, no rounding step at all.

Scale shape: one aggregation for the per-series span (output-bounded),
spine exploded JVM-side (rows bounded by span/delta — the OUTPUT
cardinality), one sort-merge join onto the observations, and one
windowed pass per series.  The unbounded LOCF frame is a single forward
scan per series partition; at 100 TB the engine runs it per
time-chunk with a one-row carried boundary, exactly like the DbDt lag
halo (operators/dbdt.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def gapfill(
    sig: DataFrame,
    delta_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Densify a gridded integer signal per series between its first and
    last observation, carrying three fill columns:

    - ``<value>``       — the observation, NULL in gap slots;
    - ``<value>_locf``  — last observation carried forward (never NULL:
      the spine starts at each series' first observation);
    - ``locf_age``      — slots since that observation (0 = observed);
    - ``<value>_interp`` — exact-rational linear interpolation between
      the bracketing observations (equals the observation on observed
      slots; never NULL: the spine ends at the last observation, so both
      brackets always exist).

    ``sig`` must already be on the ``delta_us`` grid (one row per
    (series, slot)); ``value_col`` should be integral for bit-exact
    results (any numeric works, with ordinary fp error otherwise).
    """
    series_cols = list(series_cols)
    t = F.col(ts_col)
    v = F.col(value_col)

    spans = sig.groupBy(*series_cols).agg(
        F.min(t).alias("_lo"), F.max(t).alias("_hi")
    )
    spine = spans.select(
        *series_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(delta_us)))
        ).alias(ts_col),
    )
    dense = spine.join(sig, on=[*series_cols, ts_col], how="left")
    return fill_dense(
        dense, delta_us, series_cols=series_cols, ts_col=ts_col,
        value_col=value_col,
    )


def fill_dense(
    dense: DataFrame,
    delta_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """The fill core over an ALREADY-DENSE grid frame (one row per
    (series, slot), NULL value = gap) — shared by :func:`gapfill` (which
    densifies between each series' own observations) and the serving
    layer (which pads to the REQUEST grid, so slots before the first /
    after the last observation exist: there ``<value>_locf`` is NULL
    before the first observation and ``<value>_interp`` is NULL outside
    the observed envelope — the serving contract for edges)."""
    series_cols = list(series_cols)
    t = F.col(ts_col)
    v = F.col(value_col)

    back = (
        Window.partitionBy(*series_cols)
        .orderBy(t.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the forward look ("first non-null at/after this row") is computed as
    # a RUNNING last over the time-DESCENDING sort: Spark evaluates a
    # (current row, UNBOUNDED FOLLOWING) frame by re-aggregating the
    # remainder of the partition for every row — O(n^2) per series (43k
    # slots -> 1.8e9 ops, measured as a hang at sf0.01) — while running
    # unbounded-preceding frames are incremental O(n); the extra opposite-
    # order sort is the cheap price
    fwd = (
        Window.partitionBy(*series_cols)
        .orderBy(t.desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.last(v, ignorenulls=True).over(fwd)
    next_t = F.last(obs_t, ignorenulls=True).over(fwd)

    delta = F.lit(int(delta_us))
    k = ((t - prev_t) / delta).cast("long")  # exact: both on the grid
    m = ((next_t - prev_t) / delta).cast("long")
    interp = F.when(m == 0, v.cast("double")).otherwise(
        (prev_v * (m - k) + next_v * k).cast("double") / m.cast("double")
    )
    return dense.select(
        *series_cols,
        ts_col,
        value_col,
        prev_v.alias(f"{value_col}_locf"),
        k.alias("locf_age"),
        interp.alias(f"{value_col}_interp"),
    )
