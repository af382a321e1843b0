"""Independent NumPy oracle for the FIR/average rollup semantics.

Re-derives (plain loop, no stride tricks) the masked-dot / renormalize /
10%-bad-threshold behavior specified by the reference's
``FilterAlgorithm.firfilter`` + ``align_trace``
(``/root/reference/geomagio/algorithm/FilterAlgorithm.py:309-392``) so Spark
results can be checked against a second implementation.
"""

from __future__ import annotations

import numpy as np

from usgs_geomag_algorithms_spark.tiers import Step, US


def firfilter_oracle(data: np.ndarray, window: np.ndarray, decimation: int,
                     allowed_bad: float = 0.1) -> np.ndarray:
    """Outputs at positions 0, dec, 2*dec, ... where the full window fits."""
    numtaps = len(window)
    w = np.asarray(window, float) / np.sum(window)
    n_out = (len(data) - numtaps) // decimation + 1
    out = np.full(max(n_out, 0), np.nan)
    for i in range(n_out):
        chunk = np.asarray(data[i * decimation : i * decimation + numtaps], float)
        ok = ~np.isnan(chunk)
        ws = w[ok].sum()
        if ws < 1 - allowed_bad:
            continue
        out[i] = np.dot(w[ok], chunk[ok]) / ws
    return out


def apply_step_oracle(step: Step, start_us: int, data: np.ndarray):
    """Run one cascade step over a dense grid starting at ``start_us``.

    Returns (stamp_us array, values array) with the reference's alignment:
    first output anchor is the first whose data window starts at/after the
    trace start; stamping per step type (fir: on-grid; average: center).
    """
    in_us, out_us, hw = step.in_us, step.out_us, step.half_width_us
    end_us = start_us + (len(data) - 1) * in_us
    # first anchor whose window fits
    lo_off = step.window_lo_offset_us
    hi_off = step.window_hi_offset_us
    first_anchor = -(-(start_us - lo_off) // out_us) * out_us
    last_anchor = ((end_us - hi_off) // out_us) * out_us
    if last_anchor < first_anchor:
        return np.array([], dtype=np.int64), np.array([])
    offset = (first_anchor + lo_off - start_us) // in_us
    trimmed = data[offset:]
    vals = firfilter_oracle(trimmed, step.window, step.decimation)
    n = (last_anchor - first_anchor) // out_us + 1
    vals = vals[:n]
    stamps = first_anchor + np.arange(len(vals), dtype=np.int64) * out_us + step.stamp_offset_us
    return stamps, vals


def to_rows(url, channel, start_us, in_us, data):
    return [
        (url, channel, int(start_us + i * in_us), None if np.isnan(x) else float(x))
        for i, x in enumerate(np.asarray(data, float))
    ]
