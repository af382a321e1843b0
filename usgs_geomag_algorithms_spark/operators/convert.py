"""Stream-level channel conversions over long-format frames.

The reference routes conversions per (informat, outformat) in
``geomagio/algorithm/XYZAlgorithm.py:37-117`` and ``DeltaFAlgorithm.py:31-69``
over streams aligned on time; here the alignment join is a
``groupBy(series, ts).pivot(channel)`` (exact equi-width pivot on a known
channel list — no inference pass), the math is pure column expressions from
:mod:`..functions.channels`, and the result is unpivoted back to long rows.

The affine "adjusted" transform applies a broadcast 4x4 matrix to
[h, e, z, 1]^T and passes F through with a pier correction
(``geomagio/adjusted/AdjustedMatrix.py:32-51``,
``geomagio/algorithm/AdjustedAlgorithm.py:111-142``).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions import channels as C


def pivot_channels(
    df: DataFrame,
    channel_values: Sequence[str],
    series_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    channel_col: str = "channel",
    value_col: str = "value",
) -> DataFrame:
    """Long -> wide on an explicit channel list (explicit values keep the
    pivot a single shuffle with no distinct-scan)."""
    return (
        df.groupBy(*series_cols, ts_col)
        .pivot(channel_col, list(channel_values))
        .agg(F.first(value_col))
    )


def unpivot_channels(
    df: DataFrame,
    channel_values: Sequence[str],
    series_cols: Sequence[str] = ("url",),
    ts_col: str = "t_us",
    channel_col: str = "channel",
    value_col: str = "value",
) -> DataFrame:
    pairs = ", ".join(f"'{c}', `{c}`" for c in channel_values)
    return df.select(
        *series_cols,
        ts_col,
        F.expr(f"stack({len(channel_values)}, {pairs}) as ({channel_col}, {value_col})"),
    ).select(*series_cols, channel_col, ts_col, value_col)


#: channels required/produced per coordinate format
#: (ref XYZAlgorithm.py:16-21)
XYZ_CHANNELS = {
    "geo": ["X", "Y", "Z", "F"],
    "mag": ["H", "D", "Z", "F"],
    "obs": ["H", "E", "Z", "F"],
    "obsd": ["H", "D", "Z", "F"],
}


def xyz_convert(
    wide: DataFrame,
    informat: str,
    outformat: str,
    d0: float = 0.0,
) -> DataFrame:
    """Convert between coordinate systems on a wide frame whose columns are
    the informat's first two channels (+ passthrough Z, F). Only the first
    two channels are required (ref XYZAlgorithm.py:59-63)."""
    cols = {c: F.col(c) for c in wide.columns}
    required = XYZ_CHANNELS[informat][:2] if informat in XYZ_CHANNELS else []
    missing = [c for c in required if c not in cols]
    if missing:
        raise ValueError(f"informat {informat!r} requires channels {missing}")

    if informat == "obs":
        h, e = cols["H"], cols["E"]
        H = C.mag_h_from_obs(h, e)
        D = C.mag_d_from_obs(h, e, d0)
    elif informat == "obsd":
        h, d = cols["H"], cols["D"]
        e = C.obs_e_from_obs(h, d)
        H = C.mag_h_from_obs(h, e)
        D = C.mag_d_from_obs(h, e, d0)
    elif informat == "mag":
        H, D = cols["H"], cols["D"]
    elif informat == "geo":
        x, y = cols["X"], cols["Y"]
        H = C.mag_h_from_geo(x, y)
        D = C.mag_d_from_geo(x, y)
    else:
        raise ValueError(f"unknown informat {informat}")

    # Every output channel is computed in ONE select from expressions over
    # the ORIGINAL columns. The previous chained-withColumn formulation was
    # subtly wrong: F.col("H") binds by NAME at analysis time, so after
    # withColumn("H", ...) replaced H, the next expression's F.col("H")
    # resolved to the converted value (e.g. obs->mag D was computed from
    # |(h,e)| instead of h whenever |E| was not << H).
    if outformat == "geo":
        chan = {"X": C.geo_x_from_mag(H, D), "Y": C.geo_y_from_mag(H, D)}
    elif outformat == "mag":
        chan = {"H": H, "D": D}
    elif outformat == "obs":
        chan = {"H": C.obs_h_from_mag(H, D, d0), "E": C.obs_e_from_mag(H, D, d0)}
    elif outformat == "obsd":
        chan = {"H": C.obs_h_from_mag(H, D, d0), "D": D - F.lit(d0)}
    else:
        raise ValueError(f"unknown outformat {outformat}")
    for c in ("Z", "F"):
        if c in cols:
            chan[c] = cols[c]
    passthrough = [
        c for c in wide.columns if c not in ("X", "Y", "H", "D", "E", "Z", "F")
    ]
    return wide.select(
        *passthrough,
        *[chan[c].alias(c) for c in XYZ_CHANNELS[outformat] if c in chan],
    )


def deltaf(wide: DataFrame, informat: str = "geo") -> DataFrame:
    """G = sqrt(X^2+Y^2+Z^2) - F (geo variant; obs variants first rotate,
    but the squared sum is rotation-invariant so the same expression holds —
    ref DeltaFAlgorithm.py:31-69, ChannelConverter.py:394-416)."""
    a, b = ("X", "Y") if informat == "geo" else ("H", "E")
    fv = C.computed_f_using_squares(F.col(a), F.col(b), F.col("Z"))
    return wide.withColumn("G", C.deltaf(fv, F.col("F")))


def adjusted(
    wide: DataFrame,
    matrix: np.ndarray,
    pier_correction: float = 0.0,
    in_channels: Sequence[str] = ("H", "E", "Z", "F"),
    out_channels: Sequence[str] = ("X", "Y", "Z", "F"),
) -> DataFrame:
    """Affine adjustment: [X,Y,Z]^T = M @ [h,e,z,1]^T; F_out = F + pier.

    The matrix is tiny and baked into the plan as literals (constant-folded),
    the reference's statefile matrix application
    (``AdjustedMatrix.py:32-51``). The matrix may be any (k+1)x(k+1) square —
    the reference's e-field polarity inversion is the 3x3 case over
    [E-E, E-N, 1] (``geomagio/processing/efield.py:33-39``,
    ``AdjustedAlgorithm.py:60-66`` infers channel count from matrix size)."""
    m = np.asarray(matrix, dtype=float)
    if m.ndim != 2 or m.shape[0] != m.shape[1]:
        raise ValueError(f"adjusted matrix must be square, got {m.shape}")
    k = m.shape[0] - 1
    ins = [F.col(c) for c in in_channels[:k]]
    if len(ins) < k:
        raise ValueError(f"matrix rank {k + 1} needs {k} in_channels")
    # one select: all rows of the matrix apply to the ORIGINAL inputs even
    # when out_channels overlaps in_channels (chained withColumn would feed
    # already-transformed values into later rows)
    chan = {}
    for i, name in enumerate(out_channels[:k]):
        # products first, constant last — the exact float-add order of the
        # original 4x4 formulation (hash oracles compare bit-exact)
        acc = F.lit(float(m[i, 0])) * ins[0]
        for j in range(1, k):
            acc = acc + F.lit(float(m[i, j])) * ins[j]
        chan[name] = acc + F.lit(float(m[i, k]))
    if len(in_channels) > k and len(out_channels) > k:
        chan[out_channels[k]] = F.col(in_channels[k]) + F.lit(float(pier_correction))
    passthrough = [c for c in wide.columns if c not in chan]
    return wide.select(*passthrough, *[v.alias(k) for k, v in chan.items()])
