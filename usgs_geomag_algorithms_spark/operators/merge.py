"""Last-wins stream merge — the long-format analog of ``merge_streams``
(``geomagio/TimeseriesUtility.py:448-498``; obspy ``merge(method=1)``: on
overlap the trace with the later endtime wins; NaN never overwrites data).

Our upsert rule per (series, slot): take the value from the batch with the
highest ``ingest_seq``; but a NULL/NaN from a later batch does NOT clobber a
valid earlier value (the reference splits traces at gaps before merging, so
gap slots simply aren't present to overwrite —
``TimeseriesUtility.py:467-470``)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_last_wins(
    *batches: DataFrame,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    extra_cols: Sequence[str] = (),
    nan_aware: bool = True,
    clobber: bool = False,
) -> DataFrame:
    """Merge batches; later arguments win on overlap (valid values only).

    ``extra_cols`` ride along with the winning row (a multi-column tier,
    e.g. a sketch tier's (sketch, n_events)). ``nan_aware=False`` drops
    the NaN test from the validity rule — required for non-numeric value
    columns (binary sketches), where ``isnan`` is not defined and a later
    recompute should replace outright unless it is NULL. ``clobber=True``
    makes the latest batch win UNCONDITIONALLY (NULL/NaN included) — the
    deletion-propagation write of a CDC refresh, where a later NULL
    legitimately retires a stale value; never the ingest default."""
    series_cols = list(series_cols)
    extra_cols = list(extra_cols)
    if not batches:
        raise ValueError("merge_last_wins requires at least one batch")
    tagged = None
    for seq, b in enumerate(batches):
        t = b.select(*series_cols, ts_col, value_col, *extra_cols).withColumn(
            "_seq", F.lit(seq)
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    v = F.col(value_col)
    valid = v.isNotNull() & ~F.isnan(v) if nan_aware else v.isNotNull()
    if clobber:
        w = Window.partitionBy(*series_cols, ts_col).orderBy(
            F.col("_seq").desc()
        )
    else:
        w = Window.partitionBy(*series_cols, ts_col).orderBy(
            # valid values before gaps, then latest batch first
            F.when(valid, 0).otherwise(1).asc(),
            F.col("_seq").desc(),
        )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_seq")
    )
