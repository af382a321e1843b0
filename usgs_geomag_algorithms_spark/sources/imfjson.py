"""JSON serving sink: per-channel value arrays + metadata, the shape of the
reference's ``IMFJSONWriter`` (``geomagio/imfjson/IMFJSONWriter.py:15-230``)
used by its web service. One aggregate per (series, channel): times and
values collected sorted, rendered with ``to_json`` — a serving-layer shim
over already-materialized tiers (never the bulk path)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def to_imfjson(
    df: DataFrame,
    series_cols: Sequence[str] = ("url", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
) -> DataFrame:
    """Returns one row per series with a ``json`` string column:
    {"series": ..., "times": [...], "values": [...]} (nulls preserved)."""
    series_cols = list(series_cols)
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")))
    )
    agg = df.groupBy(*series_cols).agg(pairs.alias("_pairs"))
    return agg.select(
        *series_cols,
        F.to_json(
            F.struct(
                *[F.col(c) for c in series_cols],
                F.transform(F.col("_pairs"), lambda p: p["t"]).alias("times"),
                F.transform(F.col("_pairs"), lambda p: p["v"]).alias("values"),
            )
        ).alias("json"),
    )
