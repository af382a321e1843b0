"""Retention tiers, cascade step definitions, and plan-time interval math.

Mirrors the *semantics* of the reference's filter cascade planning
(``geomagio/algorithm/FilterAlgorithm.py:14-107,178-202,394-417`` and the
interval mapping in ``geomagio/TimeseriesUtility.py:91-144``) as pure
plan-time arithmetic over integer microseconds. Nothing here touches Spark;
the output of this module (a list of :class:`Step` + widened scan intervals)
parameterizes partition-pruned scans and the rollup operator.

Timestamp conventions (asserted by reference tests
``test/TimeseriesUtility_test.py:59-100``, ``test/algorithm_test/FilterAlgorithm_test.py:143-190``):

- firfilter outputs are stamped ON the output-period grid (minute at :00),
- "average" outputs are *center-stamped*: hour at HH:29:30, day at 11:59:30
  (interval start + in_period*(numtaps-1)/2).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .functions import windows

US = 1_000_000  # microseconds per second

#: interval name <-> sample period (seconds), ref TimeseriesUtility.py:91-144
INTERVAL_SECONDS = {
    "tenhertz": 0.1,
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
}


def iso_to_us(ts: str) -> int:
    """ISO-8601 -> epoch microseconds; naive timestamps are UTC (shared by
    every job CLI so both entry points parse identically)."""
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(ts)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def get_delta_from_interval(name: str) -> float:
    return INTERVAL_SECONDS[name]


def get_interval_from_delta(delta: float):
    for name, d in INTERVAL_SECONDS.items():
        if d == delta:
            return name
    return delta


@dataclass(frozen=True)
class Step:
    """One downsampling stage of the cascade."""

    name: str
    data_interval: str
    input_sample_period: float  # seconds
    output_sample_period: float  # seconds
    window: np.ndarray = field(repr=False)  # raw taps (normalized at use)
    type: str = "firfilter"  # "firfilter" | "average"
    filter_comments: tuple = ()

    def __post_init__(self):
        windows.validate_step_window(self.window, self.type)
        if self.type == "average":
            # the rollup's average fast path is only equivalent to the
            # masked-renormalized dot for a UNIFORM window spanning exactly
            # out/in samples — reject custom steps that silently wouldn't be
            w = np.asarray(self.window, dtype=np.float64)
            expected = int(round(self.output_sample_period / self.input_sample_period))
            if len(w) != expected:
                raise ValueError(
                    f"average step window must have out/in = {expected} taps, got {len(w)}"
                )
            if not np.allclose(w, w[0]):
                raise ValueError("average step window must be uniform (boxcar)")

    @property
    def numtaps(self) -> int:
        return len(self.window)

    @property
    def decimation(self) -> int:
        return int(round(self.output_sample_period / self.input_sample_period))

    @property
    def in_us(self) -> int:
        return int(round(self.input_sample_period * US))

    @property
    def out_us(self) -> int:
        return int(round(self.output_sample_period * US))

    @property
    def half_width_us(self) -> int:
        """Filter half-width = in_period*(numtaps-1)/2, the "time shift" of
        the step (ref ``get_step_time_shift``, FilterAlgorithm.py:92-107)."""
        return self.in_us * (self.numtaps - 1) // 2

    @property
    def normalized_window(self) -> np.ndarray:
        w = np.asarray(self.window, dtype=np.float64)
        return w / w.sum()

    # --- output-grid geometry -------------------------------------------
    # For firfilter: output stamped at center c (multiple of out_us); data
    # window = [c - hw, c + hw].
    # For average: interval start s (multiple of out_us); data window =
    # [s, s + out - in]; output stamped at s + hw.
    # (ref get_nearest_time, FilterAlgorithm.py:66-89)

    @property
    def stamp_offset_us(self) -> int:
        """Offset of the output timestamp from the output-grid anchor."""
        return self.half_width_us if self.type == "average" else 0

    @property
    def window_lo_offset_us(self) -> int:
        """Offset of the first input sample of a window from its grid anchor."""
        return 0 if self.type == "average" else -self.half_width_us

    @property
    def window_hi_offset_us(self) -> int:
        """Offset of the last input sample of a window from its grid anchor."""
        if self.type == "average":
            return self.out_us - self.in_us
        return self.half_width_us

    def input_interval_us(self, start_us: int, end_us: int) -> tuple[int, int]:
        """Input [start, end] needed to produce outputs covering
        [start_us, end_us] — one level of the reference's inverse mapping
        (``get_nearest_time`` left/right + ``get_input_interval``,
        FilterAlgorithm.py:66-89,394-417).

        ``start_us``/``end_us`` are *stamped* output times (for average
        steps they sit at anchor + hw).
        """
        out = self.out_us
        # first anchor at-or-after start (left=False): reference snaps the
        # stamped time down to the grid then shifts right if not exact.
        a0 = start_us - self.stamp_offset_us
        first_anchor = -(-a0 // out) * out
        # last anchor at-or-before end (left=True)
        a1 = end_us - self.stamp_offset_us
        last_anchor = (a1 // out) * out
        return (
            first_anchor + self.window_lo_offset_us,
            last_anchor + self.window_hi_offset_us,
        )


def _mk_steps() -> list[Step]:
    return [
        Step(
            name="10Hz",
            data_interval="second",
            input_sample_period=0.1,
            output_sample_period=1.0,
            window=windows.firwin_lowpass(123, 0.25, fs=10.0, window="blackman"),
            type="firfilter",
            filter_comments=(
                "Vector 1-second values are computed from 10 Hz values using a "
                "Blackman filter (123 taps, cutoff 0.25Hz) centered on the start "
                "of the second.",
            ),
        ),
        Step(
            name="Intermagnet One Minute",
            data_interval="minute",
            input_sample_period=1.0,
            output_sample_period=60.0,
            window=windows.gaussian_periodic(91, 15.8734),
            type="firfilter",
            filter_comments=(
                "Scalar and Vector 1-minute values are computed from 1 Hz values "
                "using an INTERMAGNET gaussian filter centered on the start of "
                "the minute (00:30-01:30).",
            ),
        ),
        Step(
            name="One Hour",
            data_interval="hour",
            input_sample_period=60.0,
            output_sample_period=3600.0,
            window=windows.boxcar(60),
            type="average",
            filter_comments=(
                "Scalar and Vector 1-hour values are computed from average of "
                "1-minute values in the hour (00-59)",
            ),
        ),
        Step(
            name="One Day",
            data_interval="day",
            input_sample_period=60.0,
            output_sample_period=86400.0,
            window=windows.boxcar(1440),
            type="average",
            filter_comments=(
                "Scalar and Vector 1-day values are computed from average of "
                "1-minute values in the day (00:00-23:59)",
            ),
        ),
    ]


STEPS: list[Step] = _mk_steps()


def get_filter_steps(
    input_sample_period: float,
    output_sample_period: float,
    steps: list[Step] | None = None,
) -> list[Step]:
    """Select cascade stages: every step whose input tier we can reach and
    whose output tier we still need; "average" steps only when they land
    exactly on the requested output (ref ``get_filter_steps``,
    FilterAlgorithm.py:178-202)."""
    if steps is not None:
        return steps
    selected = []
    for step in STEPS:
        if (
            input_sample_period <= step.input_sample_period
            and output_sample_period >= step.output_sample_period
        ):
            if (
                step.type == "average"
                and step.output_sample_period != output_sample_period
            ):
                continue
            selected.append(step)
    return selected


def output_range_us(step: Step, scan_lo_us: int, scan_hi_us: int):
    """Forward map: given scanned input coverage, the stamped-output range
    this step emits (anchors whose full window fits in the scan)."""
    out = step.out_us
    first_anchor = -(-(scan_lo_us - step.window_lo_offset_us) // out) * out
    last_anchor = ((scan_hi_us - step.window_hi_offset_us) // out) * out
    if last_anchor < first_anchor:
        return None
    return (
        first_anchor + step.stamp_offset_us,
        last_anchor + step.stamp_offset_us,
    )


def get_input_interval_us(
    steps: list[Step], start_us: int, end_us: int
) -> tuple[int, int]:
    """Back-propagate the requested output [start, end] through the cascade
    to the raw-input interval that must be scanned (partition-pruning
    predicate widening; ref ``get_input_interval``, FilterAlgorithm.py:394-417)."""
    for step in reversed(steps):
        start_us, end_us = step.input_interval_us(start_us, end_us)
    return start_us, end_us
