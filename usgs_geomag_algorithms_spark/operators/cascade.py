"""Multi-step cascade runner: chain rollup steps second→minute→hour→day.

The driver-side analog of the reference's ``FilterAlgorithm.process`` loop
(``geomagio/algorithm/FilterAlgorithm.py:251-268``) — but instead of eagerly
materializing an obspy Stream between steps, each step contributes a layer
to one lazy Catalyst plan (or reads/writes materialized tier tables when run
through :mod:`..plans.pipeline`).

Scale notes: every step groups on ``(series, output_anchor)``; anchors are
strictly coarser per stage, so AQE coalesces post-shuffle partitions as
cardinality collapses (minute→hour is a 60× reduction). The hour and day
tiers both consume the *same* minute frame — ``run_tiers`` persists it once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from .. import tiers
from ..tiers import Step
from .rollup import rollup_step


def run_cascade(
    df: DataFrame,
    steps: Sequence[Step],
    scan_start_us: int,
    scan_end_us: int,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Chain ``steps`` over a long-format frame covering
    ``[scan_start_us, scan_end_us]`` at the first step's input period."""
    lo, hi = scan_start_us, scan_end_us
    for step in steps:
        df = rollup_step(
            df,
            step,
            range_start_us=lo,
            range_end_us=hi,
            series_cols=series_cols,
            ts_col=ts_col,
            value_col=value_col,
        )
        rng = tiers.output_range_us(step, lo, hi)
        if rng is None:
            return df.limit(0)
        lo, hi = rng
    return df


def run_tiers(
    df: DataFrame,
    input_sample_period: float,
    scan_start_us: int,
    scan_end_us: int,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    persist_intermediate: bool = True,
    include_month: bool = True,
) -> dict[str, DataFrame]:
    """Produce every coarser retention tier from one input frame.

    Returns ``{tier_name: DataFrame}``; hour and day reuse the minute frame
    (persisted once) instead of recomputing the FIR stage — the same
    economy the materialized tier tables provide in the full pipeline.
    """
    out: dict[str, DataFrame] = {}
    kw = dict(series_cols=series_cols, ts_col=ts_col, value_col=value_col)

    cur, cur_lo, cur_hi, cur_period = df, scan_start_us, scan_end_us, input_sample_period
    # walk the firfilter chain down to minute
    for step in tiers.STEPS:
        if step.type != "firfilter" or cur_period > step.input_sample_period:
            continue
        if step.input_sample_period < cur_period:
            continue
        cur = rollup_step(cur, step, range_start_us=cur_lo, range_end_us=cur_hi, **kw)
        rng = tiers.output_range_us(step, cur_lo, cur_hi)
        if rng is None:
            return out
        cur_lo, cur_hi = rng
        cur_period = step.output_sample_period
        out[step.data_interval] = cur
    n_avg_consumers = sum(
        1
        for step in tiers.STEPS
        if step.type == "average" and step.input_sample_period == cur_period
    )
    if persist_intermediate and n_avg_consumers > 1:
        cur.persist(StorageLevel.MEMORY_AND_DISK)
    # average tiers (hour, day) both read the minute frame
    for step in tiers.STEPS:
        if step.type != "average" or step.input_sample_period != cur_period:
            continue
        out[step.data_interval] = rollup_step(
            cur, step, range_start_us=cur_lo, range_end_us=cur_hi, **kw
        )
    # calendar-month tier stacks on the day tier's stamped-output range
    if include_month and "day" in out:
        day_step = next(s for s in tiers.STEPS if s.data_interval == "day")
        rng = tiers.output_range_us(day_step, cur_lo, cur_hi)
        if rng is not None:
            from .month import rollup_month

            out["month"] = rollup_month(out["day"], rng[0], rng[1], **kw)
    return out
