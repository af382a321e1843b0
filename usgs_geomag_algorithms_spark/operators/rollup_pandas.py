"""Grouped-pandas FIR rollup — the ALTERNATIVE implementation of
operators/rollup.py, kept for (a) an honest benchmark of why the engine's
default is the pure-SQL plan and (b) a second in-engine implementation to
cross-check semantics.

Shape: shuffle ALL rows to their (series) group, densify to the grid in
pandas, run a vectorized NumPy masked-dot kernel per series. Same outputs
as ``rollup_step`` (asserted in tests); measured slower at scale because
the full input crosses the Arrow boundary and the shuffle key is the
series (coarse) instead of (series, anchor) (fine, partially aggregated).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..tiers import Step


def _fir_masked(dense: np.ndarray, w: np.ndarray, dec: int, allowed_bad: float):
    numtaps = len(w)
    if len(dense) < numtaps:
        return np.empty(0)
    sw = np.lib.stride_tricks.sliding_window_view(dense, numtaps)[::dec]
    mask = ~np.isnan(sw)
    ws = mask @ w
    vs = np.nansum(sw * w, axis=1)
    with np.errstate(invalid="ignore"):
        return np.where(ws >= 1 - allowed_bad - 1e-9, vs / ws, np.nan)


def rollup_step_pandas(
    df: DataFrame,
    step: Step,
    range_start_us: int,
    range_end_us: int,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    allowed_bad: float = 0.1,
) -> DataFrame:
    series_cols = list(series_cols)
    in_us, out_us, hw = step.in_us, step.out_us, step.half_width_us
    w = step.normalized_window
    dec = step.decimation
    lo_off, hi_off = step.window_lo_offset_us, step.window_hi_offset_us
    first_anchor = -(-(range_start_us - lo_off) // out_us) * out_us
    last_anchor = (range_end_us - hi_off) // out_us * out_us
    stamp_off = step.stamp_offset_us
    grid_lo = first_anchor + lo_off

    prefix = ", ".join(f"{c} string" for c in series_cols)
    out_schema = f"{prefix}, {ts_col} long, {value_col} double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if last_anchor < first_anchor:
            return pd.DataFrame(columns=series_cols + [ts_col, value_col])
        n = (range_end_us - grid_lo) // in_us + 1
        dense = np.full(n, np.nan)
        t = pdf[ts_col].to_numpy(np.int64)
        keep = (t >= grid_lo) & (t <= range_end_us) & ((t - grid_lo) % in_us == 0)
        idx = (t[keep] - grid_lo) // in_us
        dense[idx] = pdf[value_col].to_numpy(np.float64)[keep]
        vals = _fir_masked(dense, w, dec, allowed_bad)
        n_out = min(len(vals), (last_anchor - first_anchor) // out_us + 1)
        vals = vals[:n_out]
        stamps = first_anchor + np.arange(n_out, dtype=np.int64) * out_us + stamp_off
        return pd.DataFrame(
            {
                **{c: pdf[c].iloc[0] for c in series_cols},
                ts_col: stamps,
                value_col: vals,
            }
        )

    out = (
        df.where(F.col(ts_col).between(int(range_start_us), int(range_end_us)))
        .groupBy(*series_cols)
        .applyInPandas(run, schema=out_schema)
    )
    # NaN (kernel) -> NULL (engine gap convention), matching rollup_step
    return out.withColumn(
        value_col, F.when(~F.isnan(value_col), F.col(value_col))
    )
