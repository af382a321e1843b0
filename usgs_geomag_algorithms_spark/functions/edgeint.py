"""Edge scaled-integer value codec — the wire/storage numeric encoding of
the reference's Edge server transport (``geomagio/edge/EdgeFactory.py``):

- stored values are INTEGERS at x1000 scale: put multiplies by 1000 and
  truncates toward zero (``_convert_trace_to_int``, EdgeFactory.py:253-274
  — numpy ``astype(int)``), get divides by 1000.0
  (``_convert_timeseries_to_decimal``, :238-251);
- declination (channel D) crosses the boundary in MINUTES: put converts
  radians -> minutes before scaling (:472-474), get converts minutes ->
  radians after descaling (:399-401);
- gaps are masked before the int conversion ("doesn't work on ndarray
  with nan's", :267-268) — here NaN/NULL encode to NULL explicitly (a
  bare double->long cast in Spark would silently fold NaN to 0).

The live socket transport stays a non-goal (SURVEY §7.4); this module is
the *column codec* — pure Catalyst expressions, applied around TierStore
reads/writes or any relation with (channel, value) columns.  Encoded
values are exact integers well inside double's 2^53 window, so they ride
the store's float64 value column losslessly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .channels import minutes_to_radians, radians_to_minutes


def edge_encode(value: Column, channel: Column) -> Column:
    """decimal (D in radians) -> Edge scaled int (long).  NaN/NULL -> NULL."""
    v = F.when(channel == "D", radians_to_minutes(value)).otherwise(value)
    return (
        F.when(F.isnull(value) | F.isnan(value), F.lit(None))
        .otherwise(v * 1000.0)
        .cast("long")  # truncation toward zero = numpy astype(int)
    )


def edge_decode(encoded: Column, channel: Column) -> Column:
    """Edge scaled int -> decimal, D back to radians.  NULL stays NULL."""
    v = encoded.cast("double") / 1000.0
    return F.when(channel == "D", minutes_to_radians(v)).otherwise(v)


def encode_edge_values(
    df: DataFrame,
    channel_col: str = "channel",
    value_col: str = "value",
    on_overflow: str = "error",
) -> DataFrame:
    """Apply the codec in place on a long frame (e.g. before a store write
    of an Edge-bound tier).

    The store's value column is float64, so the encoded long must stay
    inside double's exact-integer window (|x| < 2^53, raw values up to
    ~9e12 — six orders of magnitude above any physical nT reading).
    Anything larger (corrupt spikes) would otherwise ROUND SILENTLY on
    the cast back to double; instead ``on_overflow="error"`` (default)
    fails the job at the offending row, ``"null"`` masks it to NULL like
    a gap."""
    if on_overflow not in ("error", "null"):
        raise ValueError(f"on_overflow must be 'error' or 'null': {on_overflow}")
    enc = edge_encode(F.col(value_col), F.col(channel_col))
    over = F.abs(enc) >= F.lit(2**53)
    if on_overflow == "error":
        guarded = F.when(
            over,
            F.raise_error(
                F.concat(
                    F.lit("edge codec overflow: encoded |value| >= 2^53 for "),
                    F.col(channel_col),
                    F.lit(" raw="),
                    F.col(value_col).cast("string"),
                )
            ).cast("double"),
        ).otherwise(enc.cast("double"))
    else:
        guarded = F.when(over, F.lit(None).cast("double")).otherwise(
            enc.cast("double")
        )
    return df.withColumn(value_col, guarded)


def decode_edge_values(
    df: DataFrame, channel_col: str = "channel", value_col: str = "value"
) -> DataFrame:
    """Inverse of :func:`encode_edge_values` (store read of an Edge tier)."""
    return df.withColumn(
        value_col, edge_decode(F.col(value_col), F.col(channel_col))
    )
