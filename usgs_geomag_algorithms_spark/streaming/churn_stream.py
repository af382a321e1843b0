"""Streaming crawl-revision dedup: WARC revisit-record filtering at
ingest (``applyInPandasWithState``) — the streaming twin of
:func:`operators.churn.revision_dedup`.

A live crawl emits one row per fetch; storing every unchanged revisit
costs body storage for content the table already holds.  This operator
keeps per-url state ``(last_digest, revision_no, last_t)`` in Spark's
checkpointed state store and emits ONLY first fetches and changed
revisits, numbered exactly like the batch operator — so on the same
in-order input the streaming output is row-identical to batch
``revision_dedup`` (asserted in tests/test_churn_stream.py).

State is one tiny row per url — the same cardinality the crawl frontier
itself must hold, sharded across executors by the url hash.  Rows at or
before the stored ``last_t`` are dropped (at-least-once replay safety
AND the late-data rule: backfilled history belongs to the batch path,
which recomputes exactly — the sqdist/cusum convention).

NULL digests (failed fetches) follow the batch operator's null-safe
semantics: NULL after NULL is unchanged, NULL after content (and
content after NULL) is a revision.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _null_safe_ne(a, b) -> bool:
    a_null, b_null = pd.isna(a), pd.isna(b)
    if a_null and b_null:
        return False
    if a_null or b_null:
        return True
    return a != b


def revision_dedup_streaming(
    stream: DataFrame,
    key_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    digest_col: str = "digest",
) -> DataFrame:
    """Stateful streaming revision dedup (append mode).

    Output per KEPT capture: key cols + ``ts_col`` + ``digest_col`` +
    ``revision_no`` (1-based per key, continuous across micro-batches).
    """
    key_cols = list(key_cols)
    prefix = ", ".join(f"{c} string" for c in key_cols)
    out_schema = (
        f"{prefix}, {ts_col} long, {digest_col} string, revision_no long"
    )
    state_schema = "last_digest string, rev_no long, last_t long"

    def _empty(keyvals):
        return pd.DataFrame(
            {
                **{c: pd.Series(dtype=object) for c in key_cols},
                ts_col: pd.Series(dtype="int64"),
                digest_col: pd.Series(dtype=object),
                "revision_no": pd.Series(dtype="int64"),
            }
        )

    def fn(key, pdfs, state: GroupState):
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        if state.exists:
            last_digest, rev_no, last_t = state.get
        else:
            last_digest, rev_no, last_t = None, 0, None
        seen = state.exists
        if last_t is not None:
            pdf = pdf[pdf[ts_col] > last_t]
        keyvals = dict(zip(key_cols, key))
        if pdf.empty:
            yield _empty(keyvals)
            return
        out_t, out_d, out_r = [], [], []
        for t, d in zip(
            pdf[ts_col].to_numpy("int64"), pdf[digest_col].to_list()
        ):
            d = None if pd.isna(d) else d
            if not seen or _null_safe_ne(d, last_digest):
                rev_no += 1
                out_t.append(int(t))
                out_d.append(d)
                out_r.append(rev_no)
            seen = True
            last_digest = d
            last_t = int(t)
        state.update((last_digest, int(rev_no), int(last_t)))
        if not out_t:
            yield _empty(keyvals)
            return
        yield pd.DataFrame(
            {
                **{c: [v] * len(out_t) for c, v in keyvals.items()},
                ts_col: pd.Series(out_t, dtype="int64"),
                digest_col: out_d,
                "revision_no": pd.Series(out_r, dtype="int64"),
            }
        )

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
