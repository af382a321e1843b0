"""Shape-preserving visual downsampling: largest-triangle-one-bucket.

Serving a month of minute data to a plot means reducing ~43k points to
a few hundred while keeping the visual shape — peaks, spikes, trend
breaks.  The canonical algorithm is LTTB (Steinarsson 2013,
"Downsampling Time Series for Visual Representation"); its exact form is
inherently SEQUENTIAL per series (each bucket's pick depends on the
previous bucket's pick), so the engine implements the one-bucket variant
LTOB from the same thesis: each point's triangle is built from its
IMMEDIATE neighbors, making every bucket's argmax independent — an
embarrassingly parallel window + rank plan with no cross-bucket state.
This is the standard scale-out trade (InfluxDB and friends ship the same
variant) and degrades gracefully: LTOB picks the locally most salient
point per bucket.

Exactness: with grid timestamps and integer values the doubled triangle
area ``|(t⁻−t⁺)(v−v⁻) − (t⁻−t)(v⁺−v⁻)|`` is pure BIGINT arithmetic —
the driver oracle matches bit-for-bit, including the deterministic
earliest-timestamp tie-break.

Scale shape: one shuffle on the series key for the neighbor window (at
100 TB: per time-chunk with one-row halos, as in operators/dbdt.py),
then the rank's partial top-1 folds map-side — the shuffle to the bucket
key carries candidate rows only.  Series endpoints have no triangle and
rank behind every interior point (area −1), so a bucket holding only an
endpoint still emits it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def ltob_downsample(
    sig: DataFrame,
    bucket_us: int,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Pick, per (series, bucket), the point with the largest doubled
    triangle area against its immediate neighbors (ties → earliest
    timestamp).  Output: series + bucket anchor ``t_us`` + the picked
    point's ``pt_us``/``<value>`` + its ``tri_area2`` (−1 for the
    series' own endpoints)."""
    series_cols = list(series_cols)
    t, v = F.col(ts_col), F.col(value_col)
    w = Window.partitionBy(*series_cols).orderBy(t.asc())
    pt, pv = F.lag(t).over(w), F.lag(v).over(w)
    nt, nv = F.lead(t).over(w), F.lead(v).over(w)
    area2 = F.coalesce(
        F.abs((pt - nt) * (v - pv) - (pt - t) * (nv - pv)), F.lit(-1)
    )
    bucket = t - F.pmod(t, F.lit(int(bucket_us)))
    cand = sig.select(
        *series_cols,
        bucket.alias("_bucket"),
        t.alias("pt_us"),
        v.alias(value_col),
        area2.cast("long").alias("tri_area2"),
    )
    rank_w = Window.partitionBy(*series_cols, "_bucket").orderBy(
        F.col("tri_area2").desc(), F.col("pt_us").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(rank_w))
        .where(F.col("_rn") == 1)
        .select(
            *series_cols,
            F.col("_bucket").alias(ts_col),
            "pt_us",
            value_col,
            "tri_area2",
        )
    )
