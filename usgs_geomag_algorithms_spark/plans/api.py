"""Web-service request contract: the reference's ``GET /data/`` endpoint
re-expressed as pure functions over the serving plan.

The reference serves data through FastAPI (``geomagio/api/ws/data.py``)
with a pydantic ``DataApiQuery`` doing all validation
(``geomagio/api/ws/DataApiQuery.py:43-126``). The HTTP framework itself
stays a non-goal (SURVEY §7.4), but the REQUEST CONTRACT — parameter
names, defaults, element/observatory registries, the 345,600-sample
limit, sampling-period negotiation, derive-on-read, and the two output
renderings — is the part a switching user actually depends on, so it
lives here as framework-independent functions any HTTP front (FastAPI
router, lambda, CLI) can call:

- :func:`parse_data_request` — dict of query params -> validated
  :class:`DataRequest`, replicating every ``DataApiQuery`` validator
  (unknown-param rejection, element list splitting + registry check,
  2-letter EDGE location codes as data_type, current-UTC-day defaults,
  starttime<=endtime, iaga2002's 4-element ceiling, the sample cap
  computed over elements x duration / period).
- :func:`serve_data_request` — dispatch to the tier store through
  ``plans/serve.get_timeseries`` (sampling period -> tier, always with
  derive-on-read, mirroring the DerivedTimeseriesFactory wrap at
  ``geomagio/api/ws/data.py:21-47``) and render IAGA2002 text or
  IMFJSON rows (``format_timeseries``, ``:135-153``).
- :func:`elements_df` / :func:`observatories_df` — the ``/elements`` and
  ``/observatories`` registries as queryable DataFrames (the reference
  serves them as JSON/GeoJSON from in-code tables,
  ``geomagio/api/ws/Element.py``, ``Observatory.py``); the same rows
  back :func:`observatory_geojson`.

Everything here is driver-side plan construction and small literal
registries — no Spark job runs until the returned DataFrame executes.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..sources.metadata import CATEGORIES as METADATA_CATEGORIES
from ..sources.store import TierStore
from . import serve

US = 1_000_000
REQUEST_LIMIT = 345_600
DEFAULT_ELEMENTS = ("X", "Y", "Z", "F")
DATA_TYPES = ("variation", "adjusted", "quasi-definitive", "definitive")
OUTPUT_FORMATS = ("iaga2002", "json")

#: sampling period (seconds) -> materialized tier name
SAMPLING_PERIOD_TIERS = {
    0.1: "tenhertz",
    1.0: "second",
    60.0: "minute",
    3600.0: "hour",
    86400.0: "day",
}

#: (id, abbreviation, name, units) — geomagio/api/ws/Element.py ELEMENTS
ELEMENTS = (
    ("U", None, "North Component(miniseed)", "nT"),
    ("V", None, "East Component(miniseed)", "nT"),
    ("W", None, "Vertical Component(miniseed)", "nT"),
    ("H", None, "North Component", "nT"),
    ("E", None, "East Component", "nT"),
    ("X", None, "Geographic North Magnitude", "nT"),
    ("Y", None, "Geographic East Magnitude", "nT"),
    ("D", None, "Declination (deci-arcminute)", "dam"),
    ("Z", None, "Vertical Component", "nT"),
    ("F", None, "Total Field Magnitude", "nT"),
    ("G", "ΔF", "Delta F", "∆nT"),
    ("DIST", None, "Disturbance", "nT"),
    ("E-E", None, "E=Field East", "mV/km"),
    ("E-N", None, "E-Field North", "mV/km"),
    ("SQ", None, "Solar Quiet", "nT"),
    ("SV", None, "Solar Variation", "nT"),
    ("UK1", "T-Electric", "Electronics Temperature", "°C"),
    ("UK2", "T-Total Field", "Total Field Temperature", "°C"),
    ("UK3", "T-Fluxgate", "Fluxgate Temperature", "°C"),
    ("UK4", "T-Outside", "Outside Temperature", "°C"),
)
VALID_ELEMENTS = frozenset(e[0] for e in ELEMENTS)

#: (id, elevation_m, lat, lon, name, agency, declination_base,
#: sensor_orientation) — geomagio/api/ws/Observatory.py OBSERVATORIES;
#: None orientation resolves via the agency default (HDZF, GSC->XYZF)
OBSERVATORIES = (
    ("BDT", 1682, 40.137, 254.763, "Boulder Test", "USGS", 5527, None),
    ("BOU", 1682, 40.137, 254.763, "Boulder", "USGS", 5527, None),
    ("TST", 1682, 40.137, 254.763, "Boulder Test (ObsRIO)", "USGS", 5527, None),
    ("BRW", 10, 71.322, 203.378, "Barrow", "USGS", 10589, None),
    ("BRT", 10, 71.322, 203.378, "Barrow Test (ObsRIO)", "USGS", 10589, None),
    ("BSL", 8, 30.35, 270.365, "Stennis Space Center", "USGS", 215772, None),
    ("BXX", 1682, 40.137, 254.763, "Boulder Test(Coil Building)", "USGS", 5527, None),
    ("CMO", 197, 64.874, 212.14, "College", "USGS", 12151, None),
    ("CMT", 197, 64.874, 212.14, "College (ObsRIO)", "USGS", 12151, None),
    ("DED", 10, 70.355, 211.207, "Deadhorse", "USGS", 10755, None),
    ("DHT", 10, 70.355, 211.207, "Deadhorse Test (ObsRIO)", "USGS", 10755, None),
    ("FRD", 69, 38.205, 282.627, "Fredericksburg", "USGS", 209690, None),
    ("FDT", 69, 38.205, 282.627, "Fredericksburg Test", "USGS", 209690, None),
    ("FRN", 331, 37.091, 240.282, "Fresno", "USGS", 8097, None),
    ("GUA", 140, 13.588, 144.867, "Guam", "USGS", 764, None),
    ("GUT", 140, 13.588, 144.867, "Guam Test", "USGS", 764, None),
    ("HON", 4, 21.316, 202.0, "Honolulu", "USGS", 5982, None),
    ("HOT", 4, 21.316, 202.0, "Honolulu Test", "USGS", 5982, None),
    ("NEW", 770, 48.265, 242.878, "Newport", "USGS", 9547, None),
    ("SHU", 80, 55.348, 199.538, "Shumagin", "USGS", 7386, None),
    ("SIT", 24, 57.058, 224.675, "Sitka", "USGS", 12349, None),
    ("SJG", 424, 18.113, 293.849, "San Juan", "USGS", 208439, None),
    ("SJT", 424, 18.113, 293.849, "San Juan Test", "USGS", 208439, None),
    ("TUC", 946, 32.174, 249.267, "Tucson", "USGS", 5863, None),
    ("USGS", 1682, 40.137, 254.764, "USGS", "USGS", 0, None),
    ("BLC", 0, 64.3, 264.0, "Baker Lake", "GSC", 0, None),
    ("BRD", 0, 49.6, 262.9, "Brandon", "GSC", 0, None),
    ("CBB", 0, 69.2, 255.0, "Cambridge Bay", "GSC", 0, None),
    ("EUA", 0, 55.3, 282.3, "Eureka", "GSC", 0, None),
    ("FCC", 0, 58.8, 265.9, "Fort Churchill", "GSC", 0, None),
    ("IQA", 0, 63.8, 291.5, "Iqaluit", "GSC", 0, None),
    ("MEA", 0, 54.6, 246.7, "Meanook", "GSC", 0, None),
    ("OTT", 0, 45.4, 284.5, "Ottawa", "GSC", 0, None),
    ("RES", 0, 74.7, 265.1, "Resolute Bay", "GSC", 0, None),
    ("SNK", 0, 62.4, 245.5, "Sanikiluaq", "GSC", 0, None),
    ("STJ", 0, 47.6, 307.3, "St Johns", "GSC", 0, None),
    ("VIC", 0, 48.6, 236.6, "Victoria", "GSC", 0, None),
    ("YKC", 0, 62.4, 245.5, "Yellowknife", "GSC", 0, None),
    ("HAD", 0, 51.0, 355.5, "Hartland", "BGS", 0, None),
    ("HER", 0, -34.4, 19.2, "Hermanus", "SANSA", 0, None),
    ("KAK", 36, 53.77, 140.18, "Kakioka", "JMA", 0, None),
)
OBSERVATORY_INDEX = frozenset(o[0] for o in OBSERVATORIES)

_AGENCY_NAMES = {
    "USGS": "United States Geological Survey (USGS)",
    "GSC": "Geological Survey of Canada (GSC)",
    "BGS": "British Geological Survey (BGS)",
    "SANSA": "South African National Space Agency (SANSA)",
    "JMA": "Japan Meteorological Agency (JMA)",
}


def _orientation(agency: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    return "XYZF" if agency == "GSC" else "HDZF"


@dataclass(frozen=True)
class DataRequest:
    """A validated /data request (the DataApiQuery analog)."""

    observatory: str
    start_us: int
    end_us: int
    elements: tuple[str, ...] = DEFAULT_ELEMENTS
    sampling_period: float = 60.0
    data_type: str = "variation"
    format: str = "iaga2002"
    extra: dict = field(default_factory=dict)


_KNOWN_PARAMS = {
    "id", "starttime", "endtime", "elements", "sampling_period", "type",
    "format",
}


def _parse_time(value) -> int:
    """ISO-8601 string (naive = UTC) or numeric epoch seconds -> µs."""
    if isinstance(value, (int, float)):
        return int(round(float(value) * US))
    s = str(value).replace("Z", "+00:00")
    dt = datetime.datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * US)


def parse_data_request(
    params: Mapping[str, object], now_us: int | None = None
) -> DataRequest:
    """Validate raw query parameters exactly as the reference's
    ``get_data_query`` + ``DataApiQuery`` do; raises ValueError with
    reference-style messages. ``now_us`` pins "current UTC day" for
    deterministic defaults in tests."""
    invalid = [k for k in params if k not in _KNOWN_PARAMS]
    if invalid:
        raise ValueError(
            f"Invalid query parameter(s): {', '.join(sorted(invalid))}"
        )
    obs = params.get("id")
    if not obs:
        raise ValueError("id is required")
    if obs not in OBSERVATORY_INDEX:
        raise ValueError(
            f"Bad observatory id '{obs}'. Valid values are: "
            + ", ".join(sorted(OBSERVATORY_INDEX)) + "."
        )
    raw_elements = params.get("elements") or list(DEFAULT_ELEMENTS)
    if isinstance(raw_elements, str):
        raw_elements = [raw_elements]
    if len(raw_elements) == 1 and "," in raw_elements[0]:
        raw_elements = [e.strip() for e in raw_elements[0].split(",")]
    for e in raw_elements:
        # registry ids, or raw 3-letter EDGE channel codes
        if e not in VALID_ELEMENTS and len(e) != 3:
            raise ValueError(
                f"Bad element '{e}'. Valid values are: "
                + ", ".join(e[0] for e in ELEMENTS) + "."
            )
    sp = float(params.get("sampling_period", 60.0))
    if sp not in SAMPLING_PERIOD_TIERS:
        raise ValueError(
            f"Bad sampling_period '{sp}'. Valid values are: "
            + ", ".join(str(k) for k in SAMPLING_PERIOD_TIERS) + "."
        )
    dtype = str(params.get("type", "variation"))
    # 2-letter EDGE location codes pass through (ref DataApiQuery:52-60)
    if dtype not in DATA_TYPES and len(dtype) != 2:
        raise ValueError(
            f"Bad data type value '{dtype}'. Valid values are: "
            + ", ".join(DATA_TYPES)
        )
    fmt = str(params.get("format", "iaga2002"))
    if fmt not in OUTPUT_FORMATS:
        raise ValueError(
            f"Bad format '{fmt}'. Valid values are: "
            + ", ".join(OUTPUT_FORMATS)
        )
    if "starttime" in params and params["starttime"]:
        start_us = _parse_time(params["starttime"])
    else:  # default: start of the current UTC day
        now = (
            datetime.datetime.now(tz=datetime.timezone.utc)
            if now_us is None
            else datetime.datetime.fromtimestamp(
                now_us / US, tz=datetime.timezone.utc
            )
        )
        day = now.replace(hour=0, minute=0, second=0, microsecond=0)
        start_us = int(day.timestamp() * US)
    if "endtime" in params and params["endtime"]:
        end_us = _parse_time(params["endtime"])
    else:  # default: starttime + (86400 - 0.001) seconds
        end_us = start_us + 86_400_000_000 - 1_000
    if start_us > end_us:
        raise ValueError("Starttime must be before endtime.")
    if len(raw_elements) > 4 and fmt == "iaga2002":
        raise ValueError(
            "No more than four elements allowed for iaga2002 format."
        )
    samples = int(
        len(raw_elements) * (end_us - start_us) / US / sp
    )
    if samples > REQUEST_LIMIT:
        raise ValueError(
            f"Request exceeds limit ({samples} > {REQUEST_LIMIT})"
        )
    return DataRequest(
        observatory=str(obs),
        start_us=start_us,
        end_us=end_us,
        elements=tuple(raw_elements),
        sampling_period=sp,
        data_type=dtype,
        format=fmt,
    )


def serve_data_request(
    store: TierStore, req: DataRequest
) -> tuple[DataFrame, str]:
    """Dispatch a validated request to the tier store: sampling period
    picks the materialized tier, channels filter + derive-on-read run
    in the serve plan, and the result renders per ``req.format``.

    Returns ``(df, media_type)``: for ``json`` one row per channel with
    an IMFJSON document column (``application/json``); for ``iaga2002``
    one ordered text line per sample (``text/plain``) — callers stream
    or ``collect()`` as their transport requires."""
    tier = SAMPLING_PERIOD_TIERS[req.sampling_period]
    df = serve.get_timeseries(
        store,
        tier,
        req.start_us,
        req.end_us,
        urls=[req.observatory],
        channels=list(req.elements),
        pad=True,
        derive=True,
    )
    if req.format == "json":
        from ..sources.imfjson import to_imfjson

        return (
            to_imfjson(df, series_cols=[store.series_cols[0], "channel"]),
            "application/json",
        )
    wide = df.groupBy("t_us").pivot(
        "channel", list(req.elements)
    ).agg(F.first("value"))
    from ..sources.iaga2002 import iaga2002_lines

    return (
        iaga2002_lines(wide, station=req.observatory, channels=req.elements),
        "text/plain",
    )


# ----------------------------------------------------- metadata registries
def elements_df(spark) -> DataFrame:
    """The /elements registry as a queryable relation."""
    return spark.createDataFrame(
        list(ELEMENTS),
        schema="id string, abbreviation string, name string, units string",
    )


def observatories_df(spark) -> DataFrame:
    """The /observatories registry as a queryable relation (agency
    names + sensor-orientation defaults resolved)."""
    rows = [
        (
            o[0], o[1], o[2], o[3], o[4], o[5],
            _AGENCY_NAMES.get(o[5]), o[6], _orientation(o[5], o[7]),
        )
        for o in OBSERVATORIES
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "id string, elevation int, latitude double, longitude double,"
            " name string, agency string, agency_name string,"
            " declination_base int, sensor_orientation string"
        ),
    )


#: /metadata accepted query parameters (geomagio/api/ws/metadata.py:18-28 —
#: the endpoint excludes id and metadata_id from the search surface)
METADATA_PARAMS = frozenset(
    (
        "category", "starttime", "endtime", "network", "station",
        "channel", "location", "data_valid", "status",
    )
)

# METADATA_CATEGORIES (imported above) — single source of truth in
# sources/metadata.py (geomagio/metadata/MetadataCategory.py)


def serve_metadata_request(metadata: DataFrame, params: Mapping) -> DataFrame:
    """The ``GET /metadata`` search endpoint (geomagio/api/ws/metadata.py)
    over a metadata relation (:class:`..sources.metadata.MetadataStore`
    ``read()`` or any frame with its schema): validate the query-param
    surface, convert times, and apply the exact ``get_metadata``
    predicate set via :func:`..sources.metadata.filter_metadata`.

    - unknown parameters are rejected (same contract as /data);
    - ``category`` must be a known MetadataCategory value;
    - ``starttime``/``endtime`` accept the same ISO forms as /data and
      carry the reference's open-bound overlap semantics;
    - ``data_valid`` accepts bool or the query-string spellings;
    - ``status`` may be a single value or a list (FastAPI Query(None)).
    """
    unknown = set(params) - METADATA_PARAMS
    if unknown:
        raise ValueError(f"Unknown query parameters: {sorted(unknown)}")
    category = params.get("category")
    if category is not None and category not in METADATA_CATEGORIES:
        raise ValueError(
            f"Bad category '{category}'. Valid values are: "
            f"{', '.join(METADATA_CATEGORIES)}"
        )
    data_valid = params.get("data_valid")
    if isinstance(data_valid, str):
        low = data_valid.lower()
        if low in ("true", "1", "yes"):
            data_valid = True
        elif low in ("false", "0", "no"):
            data_valid = False
        else:
            raise ValueError(f"Bad data_valid '{data_valid}'")
    status = params.get("status")
    if isinstance(status, str):
        status = [status]
    from ..sources.metadata import filter_metadata

    return filter_metadata(
        metadata,
        category=category,
        network=params.get("network"),
        station=params.get("station"),
        channel=params.get("channel"),
        location=params.get("location"),
        starttime_us=(
            _parse_time(params["starttime"])
            if params.get("starttime") is not None
            else None
        ),
        endtime_us=(
            _parse_time(params["endtime"])
            if params.get("endtime") is not None
            else None
        ),
        data_valid=data_valid,
        status=status,
    )


def observatory_geojson(obs_id: str) -> dict:
    """One observatory as a GeoJSON feature (Observatory.geojson,
    ``geomagio/api/ws/Observatory.py:55-75``)."""
    o = next((o for o in OBSERVATORIES if o[0] == obs_id), None)
    if o is None:
        raise ValueError(f"Bad observatory id '{obs_id}'.")
    return {
        "type": "Feature",
        "id": o[0],
        "properties": {
            "name": o[4],
            "agency": o[5],
            "agency_name": _AGENCY_NAMES.get(o[5]),
            "sensor_orientation": _orientation(o[5], o[7]),
            "sensor_sampling_rate": 0.01,
            "declination_base": o[6],
        },
        "geometry": {
            "type": "Point",
            "coordinates": [o[3], o[2], o[1]],
        },
    }


# --------------------------- /observatories + /elements endpoint contracts
#: payload keys an 'observatory'-category metadata row may carry; any
#: present key overrides the literal registry for that station
OBS_OVERRIDE_SCHEMA = (
    "name string, agency string, elevation int, latitude double, "
    "longitude double, declination_base int, sensor_orientation string"
)


def _agency_name_col(agency: Column) -> Column:
    out = F.lit(None).cast("string")
    for k, v in _AGENCY_NAMES.items():
        out = F.when(agency == k, F.lit(v)).otherwise(out)
    return out


def observatory_dim(spark, metadata: DataFrame | None = None) -> DataFrame:
    """The ``/observatories`` dimension as a relation: the in-code
    registry (``geomagio/api/ws/Observatory.py`` OBSERVATORIES)
    optionally merged with live rows from the metadata store's
    ``observatory`` category (``CATEGORIES``, MetadataCategory.py) —
    the deployment shape where observatory config is store-resident:

    - one live row per station wins (latest update, id as tiebreak,
      ``data_valid`` only — the store's snapshot semantics);
    - its JSON payload (:data:`OBS_OVERRIDE_SCHEMA` keys) overrides the
      registry field-by-field; absent keys fall back;
    - stations only in the store append to the dim; ``agency_name`` and
      the sensor-orientation default re-resolve from the FINAL agency
      (the reference's pydantic validators, Observatory.py:16-52).

    Both sides are dimension-tiny; the full-outer merge never touches
    fact data."""
    base = observatories_df(spark)
    if metadata is None:
        return base.withColumn("in_registry", F.lit(True)).withColumn(
            "overridden", F.lit(False)
        )
    from pyspark.sql import Window

    live = (
        metadata.where(
            (F.col("category") == "observatory") & F.col("data_valid")
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("station").orderBy(
                    F.coalesce(
                        F.col("updated_time_us"), F.col("created_time_us")
                    ).desc(),
                    F.col("id").desc(),
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select(
            F.col("station").alias("_sid"),
            F.from_json("metadata", OBS_OVERRIDE_SCHEMA).alias("_o"),
        )
    )
    j = base.join(live, base["id"] == live["_sid"], "full_outer")
    agency = F.coalesce(F.col("_o.agency"), F.col("agency"))
    return (
        j.select(
            F.coalesce(F.col("id"), F.col("_sid")).alias("id"),
            F.coalesce(F.col("_o.elevation"), F.col("elevation")).alias(
                "elevation"
            ),
            F.coalesce(F.col("_o.latitude"), F.col("latitude")).alias(
                "latitude"
            ),
            F.coalesce(F.col("_o.longitude"), F.col("longitude")).alias(
                "longitude"
            ),
            F.coalesce(F.col("_o.name"), F.col("name")).alias("name"),
            agency.alias("agency"),
            _agency_name_col(agency).alias("agency_name"),
            F.coalesce(
                F.col("_o.declination_base"), F.col("declination_base")
            ).alias("declination_base"),
            F.coalesce(
                F.col("_o.sensor_orientation"),
                F.col("sensor_orientation"),
                F.when(agency == "GSC", F.lit("XYZF")).otherwise(
                    F.lit("HDZF")
                ),
            ).alias("sensor_orientation"),
            F.col("id").isNotNull().alias("in_registry"),
            F.col("_sid").isNotNull().alias("overridden"),
        )
        .orderBy("id")
    )


def _feature(row: Mapping) -> dict:
    """One dim row -> the reference's GeoJSON feature shape
    (Observatory.geojson, geomagio/api/ws/Observatory.py:54-70)."""
    return {
        "type": "Feature",
        "id": row["id"],
        "properties": {
            "name": row["name"],
            "agency": row["agency"],
            "agency_name": row["agency_name"],
            "sensor_orientation": row["sensor_orientation"],
            "sensor_sampling_rate": 0.01,
            "declination_base": row["declination_base"],
        },
        "geometry": {
            "type": "Point",
            "coordinates": [row["longitude"], row["latitude"], row["elevation"]],
        },
    }


def get_observatories(dim: DataFrame | None = None) -> dict:
    """``GET /observatories/`` (geomagio/api/ws/observatories.py:12-19):
    FeatureCollection over the registry — or over a store-merged
    :func:`observatory_dim` frame when one is passed (bounded collect:
    it is a dimension)."""
    if dim is None:
        feats = [observatory_geojson(o[0]) for o in OBSERVATORIES]
    else:
        feats = [_feature(r.asDict()) for r in dim.orderBy("id").collect()]
    return {"type": "FeatureCollection", "features": feats}


def get_observatory_by_id(obs_id: str) -> dict | None:
    """``GET /observatories/{id}`` (observatories.py:22-29): the feature,
    or None for an unknown code (the router's 404)."""
    try:
        return observatory_geojson(obs_id)
    except ValueError:
        return None


def get_elements() -> dict:
    """``GET /elements/`` (geomagio/api/ws/elements.py:11-30):
    FeatureCollection with null geometry; ``abbreviation`` present only
    when the element defines one."""
    features = []
    for id_, abbr, name, units in ELEMENTS:
        f: dict = {
            "type": "Feature",
            "id": id_,
            "properties": {"name": name, "units": units},
            "geometry": None,
        }
        if abbr:
            f["properties"]["abbreviation"] = abbr
        features.append(f)
    return {"type": "FeatureCollection", "features": features}


# ------------------------------------------------- /algorithms endpoints
def serve_dbdt_request(
    store: TierStore, req: DataRequest
) -> tuple[DataFrame, str]:
    """``GET /algorithms/dbdt/`` parity (``geomagio/api/ws/
    algorithms.py:18-36``): serve the raw tier (derive-on-read, padded
    grid), first-order difference at the request's sampling period
    (``operators/dbdt.py`` — shifted-timestamp adjacency, so pad gaps
    diff to NULL), and render with the reference's ``<element>_DT``
    channel naming in either output format."""
    tier = SAMPLING_PERIOD_TIERS[req.sampling_period]
    from ..operators.dbdt import dbdt

    raw = serve.get_timeseries(
        store,
        tier,
        req.start_us,
        req.end_us,
        urls=[req.observatory],
        channels=list(req.elements),
        pad=True,
        derive=True,
    )
    d = dbdt(
        raw,
        req.sampling_period,
        series_cols=[store.series_cols[0], "channel"],
    )
    elements_dt = [f"{e}_DT" for e in req.elements]
    if req.format == "json":
        from ..sources.imfjson import to_imfjson

        return (
            to_imfjson(d, series_cols=[store.series_cols[0], "channel"]),
            "application/json",
        )
    wide = d.groupBy("t_us").pivot("channel", elements_dt).agg(
        F.first("value")
    )
    from ..sources.iaga2002 import iaga2002_lines

    return (
        iaga2002_lines(wide, station=req.observatory, channels=elements_dt),
        "text/plain",
    )


def residual_request(reading: dict, adjust_reference: bool = True) -> dict:
    """``POST /algorithms/residual`` parity (``geomagio/api/ws/
    algorithms.py:38-52``): recompute absolutes + scale value from a
    posted Reading document and return the reading with ``absolutes``,
    ``scale_value``, and ``diagnostics`` replaced (everything else
    shallow-copied, NaN rendered as null — the endpoint's JSON
    contract). Raises ValueError on missing measurement types, exactly
    like the 400 the reference returns."""
    import math

    from ..functions.residual import Obs, calculate_absolutes

    def _f(v):
        return None if v is None else float(v)

    ms = [
        Obs(
            mtype=str(m["measurement_type"]),
            angle=float(m.get("angle", 0.0)),
            residual=_f(m.get("residual")),
            h=_f(m.get("h")),
            e=_f(m.get("e")),
            z=_f(m.get("z")),
            f=_f(m.get("f")),
        )
        for m in reading.get("measurements", [])
    ]
    result = calculate_absolutes(
        ms,
        azimuth=float(reading.get("azimuth", 0.0)),
        hemisphere=int(reading.get("hemisphere", 1)),
        pier_correction=float(reading.get("pier_correction", 0.0)),
        adjust_reference=adjust_reference,
    )

    def _null_nan(v):
        return None if isinstance(v, float) and math.isnan(v) else v

    absolutes = [
        {
            "element": a["element"],
            "absolute": _null_nan(a["absolute"]),
            "baseline": _null_nan(a["baseline"]),
            "shift": a.get("shift", 0.0),
        }
        for a in (
            result["absolutes"]["D"],
            result["absolutes"]["H"],
            result["absolutes"]["Z"],
        )
    ]
    out = dict(reading)
    out["absolutes"] = absolutes
    out["scale_value"] = _null_nan(result["scale_value"])
    out["diagnostics"] = {
        "inclination": _null_nan(result["inclination"]),
        "meridian": _null_nan(result["meridian"]),
    }
    return out
