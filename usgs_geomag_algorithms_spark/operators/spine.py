"""Time-spine generation and pad/trim — the long-format analog of the
reference's ``create_empty_trace`` / ``pad_and_trim_trace``
(``geomagio/TimeseriesUtility.py:12-63,501-570``).

At scale the engine avoids materializing spines (absent row == gap for every
operator); the spine exists for (a) serving layers that must return explicit
gap rows, (b) count-like signals where absence means 0, and (c) parity tests
with the reference's dense-array semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..tiers import US


def grid_start_us(start_us: int, delta_s: float) -> int:
    """First valid sample time at/after ``start_us`` on the tier grid, with
    the center-stamp shift for hour/day tiers
    (ref ``create_empty_trace``, TimeseriesUtility.py:49-57).

    The ceil happens in SHIFTED space: the smallest ``k*delta + shift``
    that is ``>= start_us``. Ceiling to the raw grid first and then adding
    the shift would skip a whole interval when ``start_us`` lands between
    an anchor and its center stamp (e.g. hour tier, start 06:10 → the
    valid 06:29:30 sample), silently dropping stored rows from padded
    serving reads."""
    delta_us = int(round(delta_s * US))
    shift = (delta_us - 60 * US) // 2 if delta_s > 60.0 else 0
    return -(-(start_us - shift) // delta_us) * delta_us + shift


def time_spine(
    df_keys: DataFrame,
    start_us: int,
    end_us: int,
    delta_s: float,
    ts_col: str = "t_us",
) -> DataFrame:
    """Cross-join the distinct series keys with the tier grid covering
    [start_us, end_us]. ``df_keys`` should already be distinct key tuples
    (small relative to facts); the sequence is generated per key row JVM-side
    (no driver loop, no shuffle beyond the key dedup)."""
    delta_us = int(round(delta_s * US))
    t0 = grid_start_us(start_us, delta_s)
    if t0 > int(end_us):
        # window too short to contain any stamp of this tier (e.g. an
        # hour-tier request inside one hour that misses :29:30): the spine
        # is legitimately empty — sequence() would throw on the inverted
        # bounds
        return df_keys.select(
            "*", F.lit(None).cast("long").alias(ts_col)
        ).where(F.lit(False))
    return df_keys.select(
        "*",
        F.explode(
            F.sequence(F.lit(t0), F.lit(int(end_us)), F.lit(delta_us))
        ).alias(ts_col),
    )


def pad_to_spine(
    df: DataFrame,
    start_us: int,
    end_us: int,
    delta_s: float,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    fill_value=None,
) -> DataFrame:
    """Pad/trim a long frame to the grid over [start_us, end_us]:
    every (series, grid slot) appears exactly once; slots with no data carry
    ``fill_value`` (NULL = gap, or e.g. 0.0 for count semantics). Data
    outside the range is trimmed (ref ``pad_and_trim_trace``,
    TimeseriesUtility.py:521-570)."""
    series_cols = list(series_cols)
    keys = df.select(*series_cols).distinct()
    spine = time_spine(keys, start_us, end_us, delta_s, ts_col=ts_col)
    fact = df.where(F.col(ts_col).between(int(start_us), int(end_us)))
    joined = spine.join(fact, on=series_cols + [ts_col], how="left")
    if fill_value is not None:
        joined = joined.withColumn(
            value_col, F.coalesce(F.col(value_col), F.lit(float(fill_value)))
        )
    return joined
