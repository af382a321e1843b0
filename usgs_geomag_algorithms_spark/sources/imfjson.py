"""JSON serving sink: per-channel value arrays + metadata, the shape of the
reference's ``IMFJSONWriter`` (``geomagio/imfjson/IMFJSONWriter.py:15-230``)
used by its web service. One aggregate per (series, channel): times and
values collected sorted, rendered with ``to_json`` — a serving-layer shim
over already-materialized tiers (never the bulk path)."""

from __future__ import annotations

import json
import math
from collections.abc import Mapping, Sequence
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F

from ..functions.channels import radians_to_minutes


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


# ---------------------------------------------------------------------------
# full IMFJSON document — IMFJSONWriter parity
# (test vectors: test/imfjson_test/IMFJSONWriter_test.py)
# ---------------------------------------------------------------------------

#: default location code per data type (``_format_data``,
#: IMFJSONWriter.py:81-89)
_LOCATION_BY_TYPE = {
    "variation": "R0",
    "reported": "R0",
    "adjusted": "A0",
    "provisional": "A0",
    "quasi-definitive": "Q0",
    "definitive": "D0",
}


def _iso_ms(t_us: int) -> str:
    """``_format_time_string`` layout: second resolution + 3-digit ms."""
    dt = datetime.fromtimestamp(t_us // 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{(t_us % 1_000_000) // 1000:0>3d}Z"


def format_imfjson(
    wide: DataFrame,
    stats: Mapping,
    channels: Sequence[str] = ("H", "D", "Z", "F"),
    url: str | None = None,
    generated_us: int | None = None,
    ts_col: str = "t_us",
    d_in_radians: bool = False,
    channel_codes: Mapping | None = None,
) -> dict:
    """The reference web service's full JSON document
    (``IMFJSONWriter.write/_format_metadata/_format_times/_format_data``,
    IMFJSONWriter.py:15-230) from a wide served frame plus a stats
    mapping (the shape :func:`..sources.iaga2002.read_iaga2002_meta`
    returns under ``metadata``, or the store's observatory config):

    - ``metadata.intermagnet.imo``: iaga_code / name / [lon, lat, elev]
    - ``reported_orientation`` = the channel list; sensor orientation,
      data type, sampling period (from ``sampling_period`` seconds or
      ``delta``), ``digital_sampling_rate`` = 1/sensor_sampling_rate
    - ``times``: per-slot ISO strings with milliseconds
    - ``values``: one entry per channel with element/network/station/
      channel/location metadata and null-preserved value arrays; D is
      converted radians->minutes when ``d_in_radians`` (the reference
      stores D in radians internally and always converts on write)

    The frame collects sorted once (serving-layer: a bounded request
    window, like the text renderers); missing channels raise exactly
    like the reference's write()."""
    missing = [c for c in channels if c not in wide.columns]
    if missing:
        raise ValueError(
            f'Missing channel "{missing[0]}" for output, available '
            f"channels {[c for c in wide.columns if c != ts_col]}"
        )
    cols = []
    for c in channels:
        col = F.col(c).cast("double")
        if c == "D" and d_in_radians:
            col = radians_to_minutes(col)
        cols.append(col.alias(c))
    rows = wide.select(F.col(ts_col).alias("_t"), *cols).orderBy("_t").collect()

    doc: dict = {"type": "Timeseries"}
    imo = {
        "iaga_code": stats.get("station"),
        **({"name": stats["station_name"]} if "station_name" in stats else {}),
        "coordinates": [
            float(stats["geodetic_longitude"])
            if stats.get("geodetic_longitude") is not None
            else None,
            float(stats["geodetic_latitude"])
            if stats.get("geodetic_latitude") is not None
            else None,
            float(stats["elevation"])
            if stats.get("elevation") is not None
            else None,
        ],
    }
    intermag: dict = {"imo": imo, "reported_orientation": "".join(channels)}
    if "sensor_orientation" in stats:
        intermag["sensor_orientation"] = stats["sensor_orientation"]
    if "data_type" in stats:
        intermag["data_type"] = stats["data_type"]
    period = stats.get("sampling_period") or stats.get("delta")
    if period is not None:
        # the reference maps sampling_rate to the matching period and
        # falls back to 1 second (IMFJSONWriter.py:140-150)
        intermag["sampling_period"] = (
            int(period) if period in (60, 3600, 86400) else 1
        )
    if stats.get("sensor_sampling_rate"):
        intermag["digital_sampling_rate"] = 1 / stats["sensor_sampling_rate"]
    gen_us = (
        generated_us
        if generated_us is not None
        else int(datetime.now(tz=timezone.utc).timestamp() * 1_000_000)
    )
    doc["metadata"] = {
        "intermagnet": intermag,
        "status": 200,
        "generated": _iso_ms(gen_us)[:19] + "Z",
        "url": url,
    }
    doc["times"] = [_iso_ms(r._t) for r in rows]
    location = stats.get("location") or _LOCATION_BY_TYPE.get(
        stats.get("data_type", ""), ""
    )
    values = []
    for c in channels:
        series = [
            None if v is None or (isinstance(v, float) and math.isnan(v)) else v
            for v in (r[c] for r in rows)
        ]
        values.append(
            {
                "id": c,
                "metadata": {
                    "element": c,
                    "network": stats.get("network", "NT"),
                    "station": stats.get("station"),
                    # per-trace channel code (the reference reads each
                    # trace's OWN stats.channel, IMFJSONWriter.py:208-212;
                    # a single stats-level 'channel' key would mislabel
                    # every element with the same code)
                    "channel": (channel_codes or {}).get(c, c),
                    "location": location,
                },
                "values": series,
            }
        )
    doc["values"] = values
    return doc


def format_imfjson_string(*args, **kwargs) -> str:
    """Compact-separator JSON text, byte-layout of the reference's
    ``write`` (``json.dumps(..., separators=(",", ":"))``)."""
    return json.dumps(format_imfjson(*args, **kwargs), ensure_ascii=True,
                      separators=(",", ":"))
