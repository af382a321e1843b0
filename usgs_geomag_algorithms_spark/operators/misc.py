"""Small operators completing the SURVEY §2 inventory.

- calculated channels: derived = Σ(component*scale + offset) — the
  volt/bin -> nT conversion (``geomagio/edge/MiniSeedFactory.py:231-299``)
- instrument-metadata interval join: per-time-range config applied to rows
  (``MiniSeedFactory.py:417-448``) as a broadcast range join
- channel renames in flight (``geomagio/Controller.py:116-137``)
- point lookup ``value_at`` (``TimeseriesUtility.get_trace_value:312-336``)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def calculated_channel(
    wide: DataFrame,
    out_channel: str,
    components: Sequence[Mapping],
) -> DataFrame:
    """derived = Σ (channel * scale + offset) over component dicts like
    ``{"channel": "U_Volt", "scale": 100, "offset": 0}`` (the reference's
    volt/bin metadata shape)."""
    expr = None
    for comp in components:
        term = F.col(comp["channel"]) * F.lit(float(comp.get("scale", 1.0))) + F.lit(
            float(comp.get("offset", 0.0))
        )
        expr = term if expr is None else expr + term
    return wide.withColumn(out_channel, expr)


#: sentinel bounds for NULL (open-ended) epoch edges — epoch-µs facts
#: are always far inside this range
_EPOCH_MIN_US = -(2**62)
_EPOCH_MAX_US = 2**62


def apply_instrument_metadata(
    df: DataFrame,
    meta: DataFrame,
    on: str = "url",
    ts_col: str = "t_us",
    value_col: str = "value",
    strict: bool = False,
) -> DataFrame:
    """Join per-time-range instrument config (scale/offset) onto fact rows:
    ``meta(on, start_us, end_us, scale, offset)`` is small — broadcast range
    join, no shuffle of the fact side.

    Epochs are HALF-OPEN ``[start_us, end_us)`` — the contiguous encoding
    (next epoch starts where the previous ends) matches each fact row at
    most once; inclusive ends would double-match boundary rows and
    silently duplicate them.  A NULL bound is open-ended ("since/until
    forever"), matching the reference's epoch semantics
    (``geomagio/Metadata.py:get_instrument``, vectors
    ``test/Metadata_test.py:27-99``).

    ``strict=True`` nulls the value of rows no epoch covers instead of
    passing them through at scale 1 / offset 0 — opt in when unconfigured
    data must not masquerade as calibrated."""
    m = F.broadcast(
        meta.select(
            F.col(on).alias("_m_key"),
            F.coalesce(F.col("start_us"), F.lit(_EPOCH_MIN_US)).alias("start_us"),
            F.coalesce(F.col("end_us"), F.lit(_EPOCH_MAX_US)).alias("end_us"),
            "scale",
            "offset",
        )
    )
    joined = df.join(
        m,
        (df[on] == F.col("_m_key"))
        & (F.col(ts_col) >= F.col("start_us"))
        & (F.col(ts_col) < F.col("end_us")),
        "left",
    )
    if strict:
        value = F.when(
            F.col("start_us").isNotNull(),
            F.col(value_col) * F.col("scale") + F.col("offset"),
        )
    else:
        value = F.col(value_col) * F.coalesce(F.col("scale"), F.lit(1.0)) + F.coalesce(
            F.col("offset"), F.lit(0.0)
        )
    return joined.select(
        *[c for c in df.columns if c != value_col],
        value.alias(value_col),
    )


def calculated_channels_from_metadata(
    df: DataFrame,
    epochs: DataFrame,
    station_col: str = "url",
    channel_col: str = "channel",
    ts_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Metadata-driven calculated channels: derive every output channel
    the instrument epochs define, honoring per-epoch component sets —
    the reference's ``get_calculated_timeseries`` (MiniSeedFactory.py:
    231-299, Σ component·scale+offset) driven by the epoch store
    (``Metadata.py _INSTRUMENT_METADATA`` shape) instead of caller-
    supplied component lists.

    ``epochs`` is the flattened relation from
    :func:`..sources.metadata.instrument_epochs_table`:
    ``(station, out_channel, component, start_us NULL-able,
    end_us NULL-able, scale, offset)``.  Scale shape: one broadcast
    range join keyed (station, component-channel) — the fact side never
    shuffles — then one (station, out_channel, time) aggregation.
    A derived slot emits only when EVERY component of its epoch is
    present (the reference sums aligned traces; a missing component
    there is a NaN that poisons the sum — here the count guard states
    the same contract without fabricating values)."""
    m = F.broadcast(
        epochs.select(
            F.col("station").alias("_m_station"),
            F.col("component").alias("_m_component"),
            "out_channel",
            F.coalesce(F.col("start_us"), F.lit(_EPOCH_MIN_US)).alias("_m_lo"),
            F.coalesce(F.col("end_us"), F.lit(_EPOCH_MAX_US)).alias("_m_hi"),
            "scale",
            "offset",
            # components per (station, out_channel, epoch): the
            # completeness denominator, computed on the tiny dim side
            F.count("*")
            .over(Window.partitionBy("station", "out_channel", "start_us"))
            .alias("_n_components"),
        )
    )
    joined = df.join(
        m,
        (df[station_col] == F.col("_m_station"))
        & (df[channel_col] == F.col("_m_component"))
        & (F.col(ts_col) >= F.col("_m_lo"))
        & (F.col(ts_col) < F.col("_m_hi")),
        "inner",
    )
    return (
        joined.groupBy(
            F.col(station_col), "out_channel", F.col(ts_col)
        )
        .agg(
            F.sum(
                F.col(value_col) * F.col("scale") + F.col("offset")
            ).alias(value_col),
            F.count("*").alias("_got"),
            F.max("_n_components").alias("_want"),
        )
        .where(F.col("_got") == F.col("_want"))
        .select(
            F.col(station_col),
            F.col("out_channel").alias(channel_col),
            ts_col,
            value_col,
        )
    )


def rename_channels(
    df: DataFrame, renames: Mapping[str, str], channel_col: str = "channel"
) -> DataFrame:
    """In-flight channel renames (input or output side)."""
    mapping = F.create_map(*[F.lit(x) for kv in renames.items() for x in kv])
    return df.withColumn(
        channel_col, F.coalesce(mapping[F.col(channel_col)], F.col(channel_col))
    )


def value_at(
    df: DataFrame,
    t_us: int,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    exact: bool = True,
) -> DataFrame:
    """Value at a timestamp per series: exact-slot filter, or the as-of
    (latest at-or-before) lookup via one ordered window when ``exact=False``."""
    series_cols = list(series_cols)
    if exact:
        return df.where(F.col(ts_col) == int(t_us)).select(
            *series_cols, ts_col, value_col
        )
    w = Window.partitionBy(*series_cols).orderBy(F.col(ts_col).desc())
    return (
        df.where(F.col(ts_col) <= int(t_us))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*series_cols, ts_col, value_col)  # same schema as exact mode
    )
