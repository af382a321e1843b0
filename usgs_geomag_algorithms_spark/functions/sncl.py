"""SNCL series naming: (element, interval, data_type) <-> (channel,
location) code mapping.

Semantics mirror the reference's ``geomagio/edge/SNCL.py:24-209`` (test
vectors in ``test/edge_test/SNCL_test.py``), re-expressed as data-driven
tables plus Spark column expressions:

- channel = interval prefix (B/L/U/R/P for tenhertz/second/minute/hour/
  day) + kind letter (F field, E volt, Y bin, K temperature) + element
  letter, with the variation-mode aliases H->U, E->V, Z->W;
- location = data-type prefix (R/A/Q/D for variation/adjusted/
  quasi-definitive/definitive) + element-suffix code (0 default, 1 _Sat,
  D _Dist, Q _SQ, V _SV); a caller-supplied 2-letter location passes
  through;
- a handful of predefined element codes (E-E, Dst3, temperatures...)
  bypass the composition.

Two surfaces:

- plan-time: :func:`encode_sncl` / :func:`decode_sncl` on plain strings
  (naming is metadata — the reference computes it per-Trace; our engine
  computes it when declaring tier tables or export streams);
- bulk: :func:`channel_code_col` / :func:`element_from_codes_col` build
  the same mapping as ``when()`` chains over DataFrame columns — pure
  Catalyst expressions (constant-folded, codegen'd), for renaming the
  series key of a long frame at any scale with zero Python per row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, functions as F

#: interval name -> channel first letter (ref SNCL.py:79-127)
INTERVAL_PREFIX = {
    "tenhertz": "B",
    "second": "L",
    "minute": "U",
    "hour": "R",
    "day": "P",
}
PREFIX_INTERVAL = {v: k for k, v in INTERVAL_PREFIX.items()}

#: data_type -> location first letter (ref SNCL.py:59-69,186-196)
DATA_TYPE_PREFIX = {
    "variation": "R",
    "adjusted": "A",
    "quasi-definitive": "Q",
    "definitive": "D",
}
PREFIX_DATA_TYPE = {v: k for k, v in DATA_TYPE_PREFIX.items()}

#: predefined element codes that bypass composition (ref SNCL.py:5-21)
PREDEFINED_ELEMENT_TO_CODE = {
    "E-E": "QE",
    "E-N": "QN",
    "Dst3": "X3",
    "Dst4": "X4",
    "T1": "K1",
    "T2": "K2",
    "T3": "K3",
    "T4": "K4",
}
PREDEFINED_CODE_TO_ELEMENT = {v: k for k, v in PREDEFINED_ELEMENT_TO_CODE.items()}

#: element suffix -> (channel kind letter, location last letter)
_SUFFIX_KIND = {"_Volt": "E", "_Bin": "Y", "_Temp": "K"}
_SUFFIX_LOC = {"_Sat": "1", "_Dist": "D", "_SQ": "Q", "_SV": "V"}

#: variation-mode element aliases on the channel's last letter
_VARIATION_ALIAS = {"H": "U", "E": "V", "Z": "W"}


@dataclass(frozen=True)
class SNCL:
    station: str
    channel: str
    location: str
    network: str = "NT"


def channel_code(element: str, interval: str, data_type: str) -> str:
    """Channel code for an element at an interval (ref get_channel,
    SNCL.py:94-99,154-184)."""
    if element in PREDEFINED_ELEMENT_TO_CODE:
        return INTERVAL_PREFIX[interval] + PREDEFINED_ELEMENT_TO_CODE[element]
    if len(element) == 3:
        return element  # already a raw channel code
    if "." in element:
        return element.split(".")[0].strip()  # "chan.loc" passthrough
    kind = "F"
    for suffix, k in _SUFFIX_KIND.items():
        if suffix in element:
            kind = k
            break
    last = element.split("_")[0]
    if data_type == "variation":
        last = _VARIATION_ALIAS.get(last, last)
    return INTERVAL_PREFIX[interval] + kind + last


def location_code(element: str, data_type: str) -> str:
    """Location code (ref get_location, SNCL.py:101-104,186-209)."""
    if len(data_type) == 2:
        return data_type  # explicit raw location passes through
    end = "0"
    for suffix, c in _SUFFIX_LOC.items():
        if suffix in element:
            end = c
            break
    return DATA_TYPE_PREFIX[data_type] + end


def encode_sncl(
    element: str,
    interval: str,
    data_type: str,
    station: str,
    network: str = "NT",
    location: str | None = None,
) -> SNCL:
    return SNCL(
        station=station,
        network=network,
        channel=channel_code(element, interval, data_type),
        location=location or location_code(element, data_type),
    )


def decode_sncl(s: SNCL) -> dict:
    """(channel, location) -> {data_type, interval, element} (ref
    parse_sncl + the data_type/interval/element properties,
    SNCL.py:48-91,129-151)."""
    try:
        data_type = PREFIX_DATA_TYPE[s.location[0]]
    except KeyError:
        raise ValueError(f"Unexpected location start: {s.location[0]}") from None
    try:
        interval = PREFIX_INTERVAL[s.channel[0]]
    except KeyError:
        raise ValueError(f"Unexpected interval code: {s.channel[0]}") from None
    code_end = s.channel[1:]
    if code_end in PREDEFINED_CODE_TO_ELEMENT:
        element = PREDEFINED_CODE_TO_ELEMENT[code_end]
    else:
        kind = s.channel[1]
        loc_end = s.location[1]
        if kind == "E":
            suffix = "_Volt"
        elif kind == "Y":
            suffix = "_Bin"
        elif kind == "K":
            suffix = "_Temp"
        elif loc_end == "1":
            suffix = "_Sat"
        elif loc_end == "D":
            suffix = "_Dist"
        elif loc_end == "Q":
            suffix = "_SQ"
        elif loc_end == "V":
            suffix = "_SV"
        else:
            suffix = ""
        element = s.channel[2] + suffix
    return {
        "station": s.station,
        "network": s.network,
        "data_type": data_type,
        "interval": interval,
        "element": element,
    }


# ------------------------------------------------------------ bulk (Spark)
def channel_code_col(
    element: Column, interval: str, data_type: str
) -> Column:
    """The :func:`channel_code` mapping as a Catalyst expression over an
    element column — constant-folds the interval/data-type prefixes and
    stays inside whole-stage codegen (no UDF)."""
    prefix = INTERVAL_PREFIX[interval]
    pre = None
    for el, code in PREDEFINED_ELEMENT_TO_CODE.items():
        cond = element == el
        val = F.lit(prefix + code)
        pre = F.when(cond, val) if pre is None else pre.when(cond, val)
    # chained .when() preserves the scalar function's first-match
    # precedence (_Volt > _Bin > _Temp) for multi-suffix element names
    kind = None
    for suffix, k in _SUFFIX_KIND.items():
        cond = element.contains(suffix)
        kind = F.when(cond, F.lit(k)) if kind is None else kind.when(cond, F.lit(k))
    kind = kind.otherwise(F.lit("F"))
    last = F.split(element, "_").getItem(0)
    if data_type == "variation":
        for a, b in _VARIATION_ALIAS.items():
            last = F.when(last == a, F.lit(b)).otherwise(last)
    composed = F.concat(F.lit(prefix), kind, last)
    passthrough = F.when(F.length(element) == 3, element).when(
        element.contains("."), F.trim(F.split(element, "\\.").getItem(0))
    )
    return pre.otherwise(F.coalesce(passthrough, composed))


def location_code_col(element: Column, data_type: str) -> Column:
    """The :func:`location_code` mapping as a Catalyst expression
    (including the raw 2-letter location passthrough, resolved at plan
    time since ``data_type`` is a literal)."""
    if len(data_type) == 2:
        return F.lit(data_type)
    end = None
    for suffix, c in _SUFFIX_LOC.items():
        cond = element.contains(suffix)
        end = F.when(cond, F.lit(c)) if end is None else end.when(cond, F.lit(c))
    return F.concat(F.lit(DATA_TYPE_PREFIX[data_type]), end.otherwise(F.lit("0")))


def element_from_codes_col(channel: Column, location: Column) -> Column:
    """Decode (channel, location) columns back to the element name — the
    bulk analog of :func:`decode_sncl`'s element rule."""
    code_end = F.substring(channel, 2, 2)
    pre = None
    for code, el in PREDEFINED_CODE_TO_ELEMENT.items():
        cond = code_end == code
        val = F.lit(el)
        pre = F.when(cond, val) if pre is None else pre.when(cond, val)
    kind = F.substring(channel, 2, 1)
    loc_end = F.substring(location, 2, 1)
    suffix = (
        F.when(kind == "E", F.lit("_Volt"))
        .when(kind == "Y", F.lit("_Bin"))
        .when(kind == "K", F.lit("_Temp"))
        .when(loc_end == "1", F.lit("_Sat"))
        .when(loc_end == "D", F.lit("_Dist"))
        .when(loc_end == "Q", F.lit("_SQ"))
        .when(loc_end == "V", F.lit("_SV"))
        .otherwise(F.lit(""))
    )
    return pre.otherwise(F.concat(F.substring(channel, 3, 1), suffix))
