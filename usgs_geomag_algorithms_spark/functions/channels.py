"""Cross-channel coordinate math as Spark column expressions.

Element-wise formulas from the reference's ``geomagio/ChannelConverter.py``
(54-416) — geographic (X,Y,Z,F), magnetic (H,D,Z,F) and observatory
(h,e,z,f) coordinate systems — expressed as JVM-side column expressions
(whole-stage codegen; no UDFs). Angles in radians internally; D baselines
(``declination_base``, deci-arcminutes) converted with the same constants
(``ChannelConverter.py:23-24``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

M2R = math.pi / 180 / 60  # minutes arc -> radians (ref :23)
R2M = 180.0 / math.pi * 60  # radians -> minutes (ref :24 — NOT 1/M2R,
# which differs in the last ulp; bit-parity matters for codec round-trips)

D2R = math.pi / 180


def minutes_to_radians(c: Column) -> Column:
    return c * M2R


def radians_to_minutes(c: Column) -> Column:
    return c * R2M


# --- mag (H, D) -> geo (X, Y)   ref ChannelConverter.py:54-109
def geo_x_from_mag(h: Column, d: Column) -> Column:
    return h * F.cos(d)


def geo_y_from_mag(h: Column, d: Column) -> Column:
    return h * F.sin(d)


# --- geo (X, Y) -> mag (H, D)   ref :138-156,179-194,215-230
def mag_h_from_geo(x: Column, y: Column) -> Column:
    return F.hypot(x, y)


def mag_d_from_geo(x: Column, y: Column) -> Column:
    return F.atan2(y, x)


# --- obs (h, e) -> mag (H, D)   ref :115-135,197-213; d0 = declination base
def mag_h_from_obs(h: Column, e: Column) -> Column:
    return F.hypot(h, e)


def mag_d_from_obs(h: Column, e: Column, d0: float = 0.0) -> Column:
    return F.lit(d0) + F.atan2(e, h)


# --- mag (H, D) -> obs (h, e)   ref :259-280,302-339,360-378
def obs_h_from_mag(h: Column, d: Column, d0: float = 0.0) -> Column:
    return h * F.cos(d - F.lit(d0))


def obs_e_from_mag(h: Column, d: Column, d0: float = 0.0) -> Column:
    return h * F.sin(d - F.lit(d0))


def obs_e_from_obs(h: Column, d: Column) -> Column:
    """e = h * tan(d)   ref :342-357"""
    return h * F.tan(d)


# --- deltaf   ref :381-416
def computed_f_using_squares(x: Column, y: Column, z: Column) -> Column:
    return F.sqrt(x * x + y * y + z * z)


def deltaf(fv: Column, fs: Column) -> Column:
    """G = Fv (computed from vector) - Fs (scalar measured)."""
    return fv - fs
