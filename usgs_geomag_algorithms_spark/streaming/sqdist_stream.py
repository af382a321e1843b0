"""Streaming SqDist: the Holt-Winters decomposition as a custom stateful
Structured Streaming operator (``applyInPandasWithState``).

The reference runs SqDist in cron micro-batches with a JSON statefile and a
strict continuity check (``geomagio/algorithm/SqDistAlgorithm.py:122-167,
227-256``); here the per-series ``HWState`` lives in Spark's streaming
state store (checkpointed, exactly-once per micro-batch), and each
micro-batch advances the recurrence over its new samples — the engine's
``applyInPandasWithState`` re-expression of the reference's statefile loop.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sqdist import HWParams, HWState, sqdist_decompose


def sqdist_streaming(
    stream: DataFrame,
    params: HWParams,
    delta_s: float,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Stateful streaming decomposition. Input: long rows with an integer
    ``t_us`` grid per series. Output (append mode): the four decomposition
    channels per input slot.

    Continuity: a micro-batch whose first slot is not the stored
    ``next_start_us`` has the intervening slots treated as a gap (the
    recurrence free-runs over NaNs — the streaming-friendly relaxation of
    the reference's hard error, which remains enforced on the batch path).
    """
    series_cols = list(series_cols)
    delta_us = int(round(delta_s * 1_000_000))
    prefix = ", ".join(f"{c} string" for c in series_cols)
    out_schema = f"{prefix}, channel_out string, {ts_col} long, {value_col} double"
    state_schema = "state_json string"

    def fn(key, pdfs, state: GroupState):
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames, ignore_index=True).sort_values(ts_col)
        st = HWState.from_json(state.get[0]) if state.exists else None
        t0 = int(pdf[ts_col].iloc[0])
        t1 = int(pdf[ts_col].iloc[-1])
        start = t0
        if st is not None and st.next_start_us is not None:
            if t0 < st.next_start_us:
                # drop already-processed slots (at-least-once file sources)
                pdf = pdf[pdf[ts_col] >= st.next_start_us]
                if pdf.empty:
                    # fully-replayed batch: emit a correctly-SHAPED empty
                    # frame (a column-less one breaks the Arrow mapping)
                    yield pd.DataFrame(
                        {
                            **{c: pd.Series(dtype=object) for c in series_cols},
                            "channel_out": pd.Series(dtype=object),
                            ts_col: pd.Series(dtype="int64"),
                            value_col: pd.Series(dtype="float64"),
                        }
                    )
                    return
                t0 = int(pdf[ts_col].iloc[0])
                t1 = int(pdf[ts_col].iloc[-1])
            start = st.next_start_us
        n = (t1 - start) // delta_us + 1
        dense = np.full(n, np.nan)
        idx = ((pdf[ts_col].to_numpy(np.int64) - start) // delta_us).astype(int)
        dense[idx] = pdf[value_col].to_numpy(np.float64)
        dist, sq, sv, sig, new_state = sqdist_decompose(dense, params, st)
        new_state.next_start_us = t1 + delta_us
        new_state.delta_us = delta_us
        state.update((new_state.to_json(),))
        ts = start + np.arange(n, dtype=np.int64) * delta_us
        keyvals = dict(zip(series_cols, key))
        out = []
        for suffix, arr in (("Dist", dist), ("SQ", sq), ("SV", sv), ("Sigma", sig)):
            out.append(
                pd.DataFrame(
                    {
                        **{c: keyvals[c] for c in series_cols},
                        "channel_out": suffix,
                        ts_col: ts,
                        value_col: arr,
                    }
                )
            )
        yield pd.concat(out, ignore_index=True)

    return stream.groupBy(*series_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
