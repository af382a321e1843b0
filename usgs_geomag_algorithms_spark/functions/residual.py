"""Residual-method absolutes: compute D/H/Z absolute values, baselines,
and the magnetometer scale value from a theodolite observation session.

Replicates the reference's ``geomagio/residual/Calculation.py:17-283``
(measurement-type geometry from ``MeasurementType.py``, averaging from
``Measurement.py:37-71``) — verified against the recorded absolutes in
the reference's ``etc/residual/BOU20191001.json`` sessions — with a flat
functional structure: one dataclass, a type-geometry table, and pure
functions. Calibration sessions are a dozen rows each, so the math is
executor-local; :func:`absolutes_by_session` fans sessions out as one
grouped-Arrow Spark job, and the resulting baselines feed
:mod:`..functions.affine` (matrix generation) and the ``adjusted``
operator — the full calibration loop, reference-parity end to end.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

import numpy as np

# measurement-type geometry (ref MeasurementType.py:31-59):
# name -> (direction, meridian, shift)
_GEOM = {
    "SouthDown": (1, 1, -180),
    "NorthDown": (1, -1, 360),
    "NorthUp": (-1, 1, 0),
    "SouthUp": (-1, -1, 180),
    "EastUp": (-1, 1, None),
    "EastDown": (-1, 1, None),
    "WestUp": (-1, -1, None),
    "WestDown": (-1, -1, None),
}

DECLINATION_TYPES = ("EastUp", "EastDown", "WestUp", "WestDown")
INCLINATION_TYPES = ("NorthDown", "NorthUp", "SouthDown", "SouthUp")
MARK_TYPES = (
    "FirstMarkDown",
    "FirstMarkUp",
    "SecondMarkDown",
    "SecondMarkUp",
)


@dataclass
class Obs:
    """One theodolite measurement row."""

    mtype: str
    angle: float = 0.0
    residual: float | None = 0.0
    h: float | None = None
    e: float | None = None
    z: float | None = None
    f: float | None = None


def _avg_field(ms: list[Obs], field: str):
    vals = [getattr(m, field) for m in ms if getattr(m, field) is not None]
    return float(np.average(vals)) if vals else None


def average_obs(ms: list[Obs], types) -> Obs | None:
    """Field-wise mean over the matching measurement types (None fields
    ignored; residual defaults 0 — ref Measurement.py:37-71)."""
    sel = [m for m in ms if m.mtype in types]
    if not sel:
        return None
    return Obs(
        mtype=sel[0].mtype,
        angle=_avg_field(sel, "angle"),
        residual=_avg_field(sel, "residual") or 0.0,
        h=_avg_field(sel, "h"),
        e=_avg_field(sel, "e"),
        z=_avg_field(sel, "z"),
        f=_avg_field(sel, "f"),
    )


def calculate_inclination(
    measurements: list[Obs], hemisphere: int = 1
) -> tuple[float, float, Obs]:
    """Fixed-point inclination solve (ref calculate_I, Calculation.py:
    194-252): iterate f estimates per inclination type until the averaged
    residual-corrected angle converges. Returns (inclination_deg,
    uncorrected_f, mean-of-inclination-ordinates)."""
    mean = average_obs(measurements, INCLINATION_TYPES)
    per_type = [average_obs(measurements, [t]) for t in INCLINATION_TYPES]
    inclination = average_obs(measurements, ["SouthDown"]).angle
    if inclination >= 90:
        inclination -= 180
    last = inclination + 1
    while abs(last - inclination) > 0.0001:
        last = inclination
        rad = math.radians(inclination)
        for m in per_type:
            m.f = (
                mean.f
                + (m.h - mean.h) * math.cos(rad)
                + (m.z - mean.z) * math.sin(rad)
                + (m.e**2 - mean.e**2) / (2 * mean.f)
            )
        angles = []
        for m in per_type:
            direction, meridian, shift = _GEOM[m.mtype]
            angles.append(
                shift
                + meridian
                * (
                    m.angle
                    + direction
                    * (hemisphere * math.degrees(math.asin(m.residual / m.f)))
                )
            )
        inclination = float(np.average(angles))
    f = float(np.average([m.f for m in per_type]))
    return inclination, f, mean


def calculate_hz(
    inclination: float,
    corrected_f: float,
    mean: Obs,
    reference: Obs | None,
) -> tuple[dict, dict]:
    """H and Z absolutes + baselines (ref calculate_HZ_absolutes,
    Calculation.py:146-192)."""
    rad = math.radians(inclination)
    h_abs = corrected_f * math.cos(rad)
    z_abs = corrected_f * math.sin(rad)
    h_b = math.sqrt(h_abs**2 - mean.e**2) - mean.h
    z_b = z_abs - mean.z
    if reference is not None:
        h_abs = math.sqrt((h_b + reference.h) ** 2 + reference.e**2)
        z_abs = z_b + reference.z
    return (
        {"element": "H", "absolute": h_abs, "baseline": h_b, "shift": 0.0},
        {"element": "Z", "absolute": z_abs, "baseline": z_b, "shift": 0.0},
    )


def calculate_d(
    measurements: list[Obs],
    azimuth: float,
    h_baseline: float,
    reference: Obs | None,
) -> tuple[dict, float]:
    """D absolute + baseline and the averaged magnetic meridian (ref
    calculate_D_absolute, Calculation.py:78-143)."""
    mean = average_obs(measurements, DECLINATION_TYPES)
    reference = reference or mean
    mark = average_obs(measurements, MARK_TYPES)
    mark_up = average_obs(measurements, ["FirstMarkUp"]).angle
    mark_down = average_obs(measurements, ["FirstMarkDown"]).angle
    mark_angle = mark.angle + (90 if mark_up < mark_down else -90)
    meridians = []
    for t in DECLINATION_TYPES:
        m = average_obs(measurements, [t])
        _direction, meridian, _shift = _GEOM[t]
        meridians.append(
            m.angle
            + math.degrees(
                meridian
                * math.asin(
                    m.residual / math.sqrt((m.h + h_baseline) ** 2 + m.e**2)
                )
            )
            - math.degrees(math.atan(m.e / (m.h + h_baseline)))
        )
    meridian_avg = float(np.average(meridians))
    shift = -180 if azimuth > 180 else 0
    d_b = (meridian_avg - mark_angle) + azimuth + shift
    d_abs = d_b + math.degrees(
        math.atan(reference.e / (reference.h + h_baseline))
    )
    return (
        {"element": "D", "absolute": d_abs, "baseline": d_b, "shift": shift},
        meridian_avg,
    )


def calculate_scale_value(
    measurements: list[Obs], inclination: float, corrected_f: float
) -> float:
    """Scale value from the first/last NorthDownScale pair (ref
    calculate_scale_value, Calculation.py:255-283)."""
    rad = math.radians(inclination)
    m1, m2 = measurements[0], measurements[-1]
    field_change = math.degrees(
        (-math.sin(rad) * (m2.h - m1.h) + math.cos(rad) * (m2.z - m1.z))
        / corrected_f
    ) + (m2.angle - m1.angle)
    return corrected_f * field_change / abs(m2.residual - m1.residual)


def calculate_absolutes(
    measurements: list[Obs],
    azimuth: float,
    hemisphere: int = 1,
    pier_correction: float = 0.0,
    adjust_reference: bool = True,
) -> dict:
    """Full session calculation (ref calculate, Calculation.py:17-77):
    returns {"absolutes": {element: {...}}, "scale_value", "inclination",
    "meridian"}."""
    missing = [
        t
        for t in DECLINATION_TYPES + INCLINATION_TYPES + MARK_TYPES
        if not any(m.mtype == t for m in measurements)
    ]
    if missing:
        raise ValueError(f"Missing {', '.join(missing)} measurements")
    reference = None
    if adjust_reference:
        wd = [m for m in measurements if m.mtype == "WestDown"]
        reference = wd[0] if wd else None
    inclination, f, i_mean = calculate_inclination(measurements, hemisphere)
    corrected_f = f + pier_correction
    h_abs, z_abs = calculate_hz(inclination, corrected_f, i_mean, reference)
    d_abs, meridian = calculate_d(
        measurements, azimuth, h_abs["baseline"], reference
    )
    scale = None
    scale_ms = [m for m in measurements if m.mtype == "NorthDownScale"]
    if scale_ms:
        scale = calculate_scale_value(scale_ms, inclination, corrected_f)
    return {
        "absolutes": {a["element"]: a for a in (d_abs, h_abs, z_abs)},
        "scale_value": scale,
        "inclination": inclination,
        "meridian": meridian,
    }


# ------------------------------------------------------------ Spark layer
def absolutes_by_session(df):
    """Compute absolutes for EVERY observation session in one grouped-Arrow
    job. Input: long measurement frame ``(session_id, seq, azimuth,
    hemisphere, pier_correction, mtype, angle, residual, h, e, z, f)``
    where ``seq`` is the within-session measurement order — the session
    math is order-sensitive (the WestDown reference is the FIRST such
    measurement; the scale value uses the first/last NorthDownScale pair)
    and grouped-Arrow delivery order is not guaranteed, so rows are sorted
    on ``seq`` before calculation. Output: one row per (session, element)
    with absolute/baseline/shift."""
    import pandas as pd

    def calc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq", kind="mergesort")
        ms = [
            Obs(
                mtype=row.mtype,
                angle=float(row.angle),
                residual=None if pd.isna(row.residual) else float(row.residual),
                h=None if pd.isna(row.h) else float(row.h),
                e=None if pd.isna(row.e) else float(row.e),
                z=None if pd.isna(row.z) else float(row.z),
                f=None if pd.isna(row.f) else float(row.f),
            )
            for row in pdf.itertuples()
        ]
        res = calculate_absolutes(
            ms,
            azimuth=float(pdf["azimuth"].iloc[0]),
            hemisphere=int(pdf["hemisphere"].iloc[0]),
            pier_correction=float(pdf["pier_correction"].iloc[0]),
        )
        rows = []
        for el, a in res["absolutes"].items():
            rows.append(
                {
                    "session_id": pdf["session_id"].iloc[0],
                    "element": el,
                    "absolute": a["absolute"],
                    "baseline": a["baseline"],
                    "shift": a["shift"],
                }
            )
        return pd.DataFrame(rows)

    return df.groupBy("session_id").applyInPandas(
        calc,
        schema=(
            "session_id string, element string, absolute double, "
            "baseline double, shift double"
        ),
    )
