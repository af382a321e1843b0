"""The full calibration loop as one Spark composition: residual
theodolite sessions -> D/H/Z absolutes -> affine matrix fits -> stored
per-observatory state -> realtime Adjusted application.

The reference runs this as separate pieces (``geomagio/residual``
calculations behind the web service, ``geomagio/adjusted/Affine.py``
matrix generation via ``processing/affine_matrix.py``, and
``processing/derived.py``'s adjusted cron applying a statefile matrix);
here each stage is the engine's existing distributed operator
(:func:`~..functions.residual.absolutes_by_session` grouped-Arrow per
session, :func:`~..functions.affine.affines_by_observatory` grouped per
observatory, :func:`~.realtime.adjusted_update` gap-driven application)
and this module is only the glue: schema bridges, the state-table
read/write, and the per-observatory application loop.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.affine import DEFAULT_TRANSFORMS, affines_by_observatory
from ..functions.residual import absolutes_by_session
from ..sources.store import TierStore
from .realtime import adjusted_update

#: the channel slot calibration state occupies in the (url, channel)
#: keyed state table — not a real data channel
STATE_CHANNEL = "_affine"


def readings_from_absolutes(
    absolutes: DataFrame, sessions: DataFrame
) -> DataFrame:
    """Bridge per-session absolutes (one row per element) to the affine
    fitter's reading rows.

    ``absolutes``: ``(session_id, element, absolute, baseline, shift)``
    — :func:`absolutes_by_session` output. ``sessions``: one row per
    session with ``(session_id, observatory, time, pier_correction)``.
    A reading is ``valid`` only when all of D/H/Z produced values (the
    reference drops incomplete readings the same way,
    ``Affine.py:61-67`` via ``Reading.valid``)."""
    wide = (
        absolutes.groupBy("session_id")
        .pivot("element", ["D", "H", "Z"])
        .agg(
            F.first("absolute").alias("abs"),
            F.first("baseline").alias("bas"),
        )
    )
    j = wide.join(sessions, "session_id")
    cols = {
        "h_abs": "H_abs", "d_abs": "D_abs", "z_abs": "Z_abs",
        "h_bas": "H_bas", "d_bas": "D_bas", "z_bas": "Z_bas",
    }
    valid = None
    for c in cols.values():
        cond = F.col(c).isNotNull() & ~F.isnan(F.col(c))
        valid = cond if valid is None else (valid & cond)
    return j.select(
        "observatory",
        F.col("time").cast("double"),
        *[F.col(src).alias(dst) for dst, src in cols.items()],
        F.col("pier_correction").cast("double"),
        F.coalesce(valid, F.lit(False)).alias("valid"),
    )


def fit_calibration(
    measurements: DataFrame,
    sessions: DataFrame,
    starttime: float,
    endtime: float,
    update_interval: float | None = None,
    transforms=DEFAULT_TRANSFORMS,
) -> DataFrame:
    """measurements (long theodolite rows, see
    :func:`absolutes_by_session`) + session metadata -> one affine row
    per (observatory, interval): flattened 4x4 matrix + pier
    correction."""
    absolutes = absolutes_by_session(measurements)
    readings = readings_from_absolutes(absolutes, sessions)
    return affines_by_observatory(
        readings, starttime, endtime, update_interval, transforms
    )


def store_calibration(
    store: TierStore, affines: DataFrame, name: str = "affines"
) -> int:
    """Persist the LATEST interval's matrix per observatory into the
    snapshot-versioned state table (``write_state`` — last-wins per
    key, atomic generation flip). History stays with the caller; the
    realtime application only ever wants the newest matrix, exactly
    like the reference's statefile."""
    w = affines.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("observatory").orderBy(F.col("time").desc())
        ),
    ).where(F.col("_rn") == 1)
    state = w.select(
        F.col("observatory").alias("url"),
        F.lit(STATE_CHANNEL).alias("channel"),
        F.to_json(
            F.struct(
                F.col("matrix"),
                F.col("pier_correction"),
                F.col("time"),
            )
        ).alias("state_json"),
    )
    n = state.count()
    if n:
        store.write_state(state, name)
    return n


def load_calibration(
    store: TierStore, name: str = "affines"
) -> dict[str, tuple[np.ndarray, float]]:
    """{observatory: (4x4 matrix, pier_correction)} from the current
    state generation — bounded by the observatory count."""
    out = {}
    rows = (
        store.read_state(name)
        .where(F.col("channel") == STATE_CHANNEL)
        .collect()
    )
    for r in rows:
        st = json.loads(r.state_json)
        out[r.url] = (
            np.array(st["matrix"], dtype=float).reshape(4, 4),
            float(st["pier_correction"]),
        )
    return out


def adjusted_from_calibration(
    store: TierStore,
    tier_out: str,
    tier_in: str,
    start_us: int,
    end_us: int,
    name: str = "affines",
    in_channels: Sequence[str] = ("H", "E", "Z", "F"),
    out_channels: Sequence[str] = ("X", "Y", "Z", "F"),
    interval_us: int = 1_000_000,
    realtime_interval_s: int = 600,
    update_limit: int = 10,
) -> dict:
    """Apply each observatory's OWN stored matrix through the gap-driven
    realtime update (matrices differ per observatory, so the application
    loops the calibration table — bounded by observatory count, one
    filtered :func:`adjusted_update` each)."""
    cal = load_calibration(store, name)
    metrics = {"observatories": 0, "rows_written": 0, "gaps_filled": 0}
    for obs, (matrix, pier) in sorted(cal.items()):
        m = adjusted_update(
            store,
            tier_out,
            tier_in,
            matrix,
            pier_correction=pier,
            in_channels=in_channels,
            out_channels=out_channels,
            interval_us=interval_us,
            start_us=start_us,
            end_us=end_us,
            realtime_interval_s=realtime_interval_s,
            update_limit=update_limit,
            urls=[obs],
        )
        metrics["observatories"] += 1
        metrics["rows_written"] += m["rows_written"]
        metrics["gaps_filled"] += m["gaps_filled"]
    return metrics
