"""Streaming CUSUM: the level-shift monitor as a custom stateful
Structured Streaming operator (``applyInPandasWithState``) — the
streaming twin of :func:`operators.changepoint.cusum_changepoints`.

The batch operator evaluates the ``max(0, C + d)`` recurrence through its
prefix-sum closed form; the streaming operator runs the recurrence
DIRECTLY, carrying ``(baseline progress, S0, C_hi, C_lo, last_t)`` per
series in Spark's checkpointed state store.  Both paths are all-BIGINT
(n0-scaled deltas — the baseline mean is never materialized as a double),
so on the same input the streaming output is bit-identical to the batch
operator — asserted in tests/test_anomaly_stream.py.

Semantics: the first ``baseline`` samples of each series train silently
(no emission); every later sample advances both sides and emits.  Rows at
or before the stored ``last_t`` are dropped (at-least-once replay safety
AND the monitor's late-data rule — backfilled history belongs to the
batch path, which recomputes exactly).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def cusum_streaming(
    stream: DataFrame,
    baseline: int,
    k: int = 0,
    h: int = 8,
    series_cols: Sequence[str] = ("series",),
    ts_col: str = "t_us",
    value_col: str = "v",
) -> DataFrame:
    """Stateful streaming two-sided CUSUM (append mode).

    Output per post-baseline sample: series + ts + ``v`` + ``cusum_hi`` /
    ``cusum_lo`` (doubles, value units — the single int64/int64 division
    at the edge) + ``is_change``.
    """
    series_cols = list(series_cols)
    prefix = ", ".join(f"{c} string" for c in series_cols)
    out_schema = (
        f"{prefix}, {ts_col} long, v long, "
        "cusum_hi double, cusum_lo double, is_change boolean"
    )
    state_schema = "n_base long, s0 long, c_hi long, c_lo long, last_t long"

    def _empty(keyvals):
        return pd.DataFrame(
            {
                **{c: pd.Series(dtype=object) for c in series_cols},
                ts_col: pd.Series(dtype="int64"),
                "v": pd.Series(dtype="int64"),
                "cusum_hi": pd.Series(dtype="float64"),
                "cusum_lo": pd.Series(dtype="float64"),
                "is_change": pd.Series(dtype="bool"),
            }
        )

    def fn(key, pdfs, state: GroupState):
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        if state.exists:
            n_base, s0, c_hi, c_lo, last_t = state.get
        else:
            n_base, s0, c_hi, c_lo, last_t = 0, 0, 0, 0, -(1 << 62)
        pdf = pdf[pdf[ts_col] > last_t]
        keyvals = dict(zip(series_cols, key))
        if pdf.empty:
            yield _empty(keyvals)
            return
        ts = pdf[ts_col].to_numpy("int64")
        vs = pdf[value_col].to_numpy("int64")
        out_t, out_v, out_hi, out_lo, out_flag = [], [], [], [], []
        for t, v in zip(ts, vs):
            if n_base < baseline:
                n_base += 1
                s0 += int(v)
                continue
            d_hi = baseline * (int(v) - k) - s0
            d_lo = s0 - baseline * (int(v) + k)
            c_hi = max(0, c_hi + d_hi)
            c_lo = max(0, c_lo + d_lo)
            out_t.append(int(t))
            out_v.append(int(v))
            out_hi.append(c_hi / baseline)
            out_lo.append(c_lo / baseline)
            out_flag.append(c_hi > h * baseline or c_lo > h * baseline)
        state.update((n_base, s0, c_hi, c_lo, int(ts[-1])))
        if not out_t:
            yield _empty(keyvals)
            return
        yield pd.DataFrame(
            {
                **{c: keyvals[c] for c in series_cols},
                ts_col: pd.Series(out_t, dtype="int64"),
                "v": pd.Series(out_v, dtype="int64"),
                "cusum_hi": pd.Series(out_hi, dtype="float64"),
                "cusum_lo": pd.Series(out_lo, dtype="float64"),
                "is_change": pd.Series(out_flag, dtype="bool"),
            }
        )

    return stream.groupBy(*series_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
