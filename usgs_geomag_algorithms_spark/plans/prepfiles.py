"""MagProc archive preparation — ``geomagio/processing/magproc.py``
(``magproc-prepfiles``) parity.

For one (observatory, year, month) the reference writes: a CAL
calibration file spanning [month-1, month+2), and per-day PCDCP text
files for second + minute variation data and minute temperatures
(``prepfiles``, magproc.py:29-69; daily chunks via ``get_intervals``,
Util.py:60-97; file layout ``{OBS}/{OBS}{year}{julian}.{i}``,
PCDCPFactory.py:12).

Here the inputs are the engine's own relations — a TierStore for the
tiers, an absolutes DataFrame for calibration — and each file renders
through the existing Catalyst writers (:mod:`..sources.calfile`,
:mod:`..sources.legacy`). One Spark read per (day, tier); the text
files themselves are tiny (the reference's own archive granularity).
"""

from __future__ import annotations

import calendar
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F

from ..operators.convert import pivot_channels
from ..operators.rollup import rollup_step
from ..sources.calfile import write_cal_file
from ..sources.legacy import write_pcdcp
from ..sources.store import TierStore
from ..tiers import STEPS

#: minute->hour boxcar used for the temperature tier
#: (magproc.write_temperature_data builds FilterAlgorithm 60->3600,
#: magproc.py:114-153)
_HOUR_STEP = next(
    s for s in STEPS
    if s.input_sample_period == 60.0 and s.output_sample_period == 3600.0
)

US = 1_000_000
DAY_US = 86_400 * US


def _month_us(year: int, month: int) -> tuple[int, int]:
    start = datetime(year, month, 1, tzinfo=timezone.utc)
    ny, nm = (year + 1, 1) if month == 12 else (year, month + 1)
    end = datetime(ny, nm, 1, tzinfo=timezone.utc)
    return int(start.timestamp()) * US, int(end.timestamp()) * US


def day_intervals(year: int, month: int) -> list[tuple[int, int]]:
    """[start, end) per day of the month — ``get_intervals`` with the
    day size and epoch alignment (Util.py:60-97)."""
    lo, hi = _month_us(year, month)
    return [(t, t + DAY_US) for t in range(lo, hi, DAY_US)]


def _wide_day(
    store: TierStore, tier: str, obs: str, lo: int, hi: int, channels
) -> DataFrame:
    src = store.read(tier, lo, hi - 1, series=obs).where(
        F.col("channel").isin(list(channels))
    )
    return pivot_channels(src, list(channels))


def prepfiles(
    store: TierStore,
    observatory: str,
    year: int,
    month: int,
    out_dir: str,
    absolutes: DataFrame | None = None,
    second_tier: str = "second",
    minute_tier: str = "minute",
    channels=("H", "E", "Z", "F"),
    temperature_tier: str | None = None,
    temperature_channels=("UK1", "UK2", "UK3", "UK4"),
) -> dict:
    """Write the month's archive files; returns {relative_path: rows}.

    Empty days write no file (the reference's factories skip empty
    streams); the CAL file spans [month-1, month+2) like the reference
    (magproc.py:43-48) and is written only when ``absolutes`` is given
    (sessions outside the window are filtered on ``start_us``)."""
    obs_dir = os.path.join(out_dir, observatory)
    written: dict[str, int] = {}

    if absolutes is not None:
        py, pm = (year - 1, 12) if month == 1 else (year, month - 1)
        ny, nm = (year, month)
        # end of month+1 == start of month+2
        n2y, n2m = (ny + 1, (nm + 2) - 12) if nm >= 11 else (ny, nm + 2)
        cal_lo, _ = _month_us(py, pm)
        cal_hi, _ = _month_us(n2y, n2m)
        window = absolutes.where(
            (F.col("start_us") >= cal_lo) & (F.col("start_us") < cal_hi)
        )
        name = f"{observatory}{year}PCD.cal"
        write_cal_file(window, os.path.join(obs_dir, name))
        written[f"{observatory}/{name}"] = window.count()

    # suffixes follow PCDCPFactory._get_interval_abbreviation
    # (PCDCPFactory.py:111-113: second -> "raw"; base table
    # TimeseriesFactory.py:436-448: minute -> "min", hour -> "hor")
    jobs = [(second_tier, 1, "raw", list(channels), False),
            (minute_tier, 60, "min", list(channels), False)]
    if temperature_tier:
        # minute temperatures are hour-filtered before writing
        # (magproc.write_temperature_data, FilterAlgorithm 60->3600)
        jobs.append(
            (temperature_tier, 3600, "hor", list(temperature_channels), True)
        )
    for tier, delta_s, suffix, chans, temps in jobs:
        if not store.exists(tier):
            continue
        for lo, hi in day_intervals(year, month):
            if temps:
                # stamped hourly outputs for the day: anchor + half-width
                out_lo = lo + _HOUR_STEP.stamp_offset_us
                out_hi = hi - _HOUR_STEP.out_us + _HOUR_STEP.stamp_offset_us
                in_lo, in_hi = _HOUR_STEP.input_interval_us(out_lo, out_hi)
                src = store.read(tier, in_lo, in_hi, series=observatory).where(
                    F.col("channel").isin(chans)
                )
                hourly = rollup_step(
                    src,
                    _HOUR_STEP,
                    range_start_us=in_lo,
                    range_end_us=in_hi,
                    series_cols=("url", "channel"),
                )
                wide = pivot_channels(hourly, chans)
            else:
                wide = _wide_day(store, tier, observatory, lo, hi, chans)
            n = wide.count()
            if not n:
                continue
            d = datetime.fromtimestamp(lo // US, tz=timezone.utc)
            julian = d.timetuple().tm_yday
            name = f"{observatory}{d.year}{julian:03d}.{suffix}"
            write_pcdcp(
                wide,
                os.path.join(obs_dir, name),
                station=observatory,
                channels=chans,
                delta_s=delta_s,
                temperatures=temps,
            )
            written[f"{observatory}/{name}"] = n
    return written
