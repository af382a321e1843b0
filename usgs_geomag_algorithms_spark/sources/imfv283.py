"""IMFV283 GOES satellite telemetry decoder.

The reference parses raw GOES DCP messages into 12-minute traces
(``geomagio/imfv283/IMFV283Parser.py:1-389``): an ASCII DCP header
(platform id, ``YYDDDHHMMSS`` transmission stamp, data length), a "ness"
block of 63 three-byte groups unpacked into a 126-byte GOES block (with
per-observatory header/data byte swapping), a bit-packed GOES header
(12-bit day-of-year / minute-of-day, per-channel offsets, orientation +
scale bits), then 12 samples x 4 channels of big-endian 16-bit values
scaled to nanotesla.  It also corrects GPS week-number rollover errors
(1999-08-22 and 2019-04-07 resets, ``:101-162``) and drops packets whose
data is implausibly older than their transmission (``:314-316``).

Spark-first shape: the decode is inherently per-message bit-twiddling, so
it runs as a vectorized-NumPy kernel inside Arrow ``mapInPandas`` batches
over a ``binaryFile`` scan — one task per file (the reference's
one-stream-per-file model), any number of files as the scale axis.  The
observatory registry (platform id -> station + byte order,
``imfv283_codes.py``) is a small broadcast-able dict the caller can
extend.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

US = 1_000_000

# IMFV283Parser.py:14-21
DEAD_VALUE = 65535
HEADER_SIZE = 37
MSG_SIZE_100B = 190
MSG_SIZE_300B = 191
BIAS = 8192
SHIFT = 1048576

# Orientation code -> channel letters (IMFV283Parser.py:25-30; the doc's
# second HDZF channel is E for the USGS/Canada GOES users).
CHANNELS = {
    0: ("X", "Y", "Z", "F"),
    1: ("H", "E", "Z", "F"),
    2: ("1", "D", "I", "F"),
    3: ("1", "2", "3", "4"),
}

# Observatory registry: station -> DCP platform id + ness byte order
# (imfv283_codes.py:4-141 — public INTERMAGNET/USGS platform assignments;
# USGS stations swap data bytes, Canadian stations swap header bytes).
def _obs(platform, swap_hdr, swap_data):
    return {
        "platform": platform,
        "swap_hdr": swap_hdr,
        "swap_data": swap_data,
    }


OBSERVATORIES = {
    # USGS: HEZF orientation, data-region byte swap
    "BOU": _obs("75C2D538", False, True),
    "BRW": _obs("75C172CE", False, True),
    "BSL": _obs("75C236CA", False, True),
    "CMO": _obs("75C06342", False, True),
    "DED": _obs("75C301AA", False, True),
    "FRD": _obs("75C21026", False, True),
    "FRN": _obs("75C2F3D4", False, True),
    "GUA": _obs("75C33430", False, True),
    "HON": _obs("75C161B8", False, True),
    "NEW": _obs("75C2E0A2", False, True),
    "SHU": _obs("75C266B6", False, True),
    "SIT": _obs("75C28544", False, True),
    "SJG": _obs("75C0B52A", False, True),
    "TUC": _obs("75C14754", False, True),
    # NRCan: XYZF orientation, header-region byte swap
    "BLC": _obs("75C3644C", True, False),
    "BRD": _obs("75C387BE", True, False),
    "CBB": _obs("75C351D6", True, False),
    "EUA": _obs("75C2405A", True, False),
    "FCC": _obs("75C3773A", True, False),
    "IQA": _obs("75C0F620", True, False),
    "MEA": _obs("75C32746", True, False),
    "OTT": _obs("75C20350", True, False),
    "RES": _obs("75C1D236", True, False),
    "SNK": _obs("75C15422", True, False),
    "STJ": _obs("75C1E7AC", True, False),
    "VIC": _obs("75C2A3A8", True, False),
    "YKC": _obs("75C312DC", True, False),
    # other GOES users
    "KGI": _obs("75C394C8", True, False),
}

_SCHEMA = T.StructType(
    [
        T.StructField("station", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("t_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("transmit_us", T.LongType()),
        T.StructField("gps_corrected", T.BooleanType()),
    ]
)

_EPOCH = datetime(1970, 1, 1)


def _estimate_data_time(transmission: str, doy: int, minute: int,
                        max_transmit_delay: int = 1800):
    """Data start time for a packet, with GPS week-rollover correction.

    Mirrors ``IMFV283Parser._estimate_data_time`` (``:101-162``): the
    2-digit year is 2000-based; data reported "after" transmission folds
    to the prior year; delays beyond ``max_transmit_delay`` try the
    1999-08-22 (+228 d) then 2019-04-07 (+91 d) GPS reset corrections.
    Returns ``(data_time, transmit_time, corrected)`` as datetimes.
    """
    transmit = datetime.strptime("20" + transmission, "%Y%j%H%M%S")
    delta = timedelta(days=doy - 1, minutes=minute)
    data_time = datetime(transmit.year, 1, 1) + delta
    if data_time > transmit:
        data_time = datetime(transmit.year - 1, 1, 1) + delta
    if (transmit - data_time).total_seconds() < max_transmit_delay:
        return data_time, transmit, False
    if transmit.year >= 1999:
        corrected = data_time + timedelta(days=228)
        if (transmit - corrected).total_seconds() < max_transmit_delay:
            return corrected, transmit, True
    if transmit.year >= 2019:
        corrected = data_time + timedelta(days=91)
        if (transmit - corrected).total_seconds() < max_transmit_delay:
            return corrected, transmit, True
    return data_time, transmit, False


def _unpack_ness(line: bytes, offset: int, swap_hdr: bool,
                 swap_data: bool) -> np.ndarray:
    """63 three-byte ness groups -> 126-byte GOES block (vectorized form
    of ``IMFV283Parser._process_ness_block``, ``:341-389``)."""
    g = np.frombuffer(line, dtype=np.uint8, count=189, offset=offset)
    g = g.reshape(63, 3).astype(np.int64)
    v1 = (g[:, 2] & 0x3F) + (g[:, 1] & 0x3) * 0x40
    v2 = ((g[:, 1] >> 2) & 0xF) + (g[:, 0] & 0xF) * 0x10
    # swap_hdr governs groups 0-11, swap_data the rest (``:379``)
    swap = np.where(np.arange(63) <= 11, swap_hdr, swap_data)
    block = np.empty((63, 2), dtype=np.int64)
    block[:, 0] = np.where(swap, v2, v1)
    block[:, 1] = np.where(swap, v1, v2)
    return block.reshape(126)


def decode_message(line: bytes, platforms: dict):
    """Decode one DCP message line into long rows, or [] if malformed.

    Row layout: (station, channel, t_us, value|None, transmit_us,
    gps_corrected).  Semantics cited inline from IMFV283Parser.
    """
    line = line.rstrip(b"\r")
    if len(line) <= HEADER_SIZE:
        return []
    try:
        entry = platforms.get(line[0:8].decode("ascii"))
        if entry is None:
            return []
        station, dom = entry
        data_len = int(line[32:37])
    except (ValueError, UnicodeDecodeError):
        return []
    if data_len < MSG_SIZE_100B or data_len > MSG_SIZE_300B:
        return []
    # the 300B variant carries an extra flag byte before the data (:199-218)
    offset = HEADER_SIZE + (1 if data_len == MSG_SIZE_300B else 0)
    if len(line) < offset + 189:
        return []
    goes = _unpack_ness(line, offset, dom["swap_hdr"], dom["swap_data"])
    # 12-bit day/minute: bytes AB CD EF -> day=DAB, minute=EFC (:235-238)
    day = int(((goes[1] & 0xF) << 8) + goes[0])
    minute = int((goes[2] << 4) + ((goes[1] & 0xF0) >> 4))
    offsets = goes[3:7]
    orient = int(goes[7]) >> 6
    scale = [2 if goes[7] & b else 1 for b in (0x20, 0x10, 0x8, 0x4)]
    try:
        data_time, transmit, corrected = _estimate_data_time(
            line[8:19].decode("ascii"), day, minute
        )
    except (ValueError, UnicodeDecodeError):
        return []
    # "data over twice as old as the message" drop (:314-316)
    if (transmit - data_time).total_seconds() > 24 * 60:
        return []
    t0_us = int((data_time - _EPOCH).total_seconds()) * US
    transmit_us = int((transmit - _EPOCH).total_seconds()) * US
    # data: bytes 30-125, 12 samples x 4 channels x big-endian u16 (:183-196)
    vals = goes[30:126].reshape(12, 4, 2)
    vals = vals[:, :, 0] * 0x100 + vals[:, :, 1]
    channels = CHANNELS[orient]
    rows = []
    for loc, channel in enumerate(channels):
        v = vals[:, loc].astype(np.float64)
        v[v == DEAD_VALUE] = np.nan
        # raw*scale + offset*8192 - 1048576, tenths of nT -> nT (:329-336)
        v = (v * scale[loc] + int(offsets[loc]) * BIAS - SHIFT) / 10.0
        for i in range(12):
            rows.append(
                (
                    station,
                    channel,
                    t0_us + i * 60 * US,
                    None if np.isnan(v[i]) else float(v[i]),
                    transmit_us,
                    corrected,
                )
            )
    return rows


def read_imfv283(
    spark: SparkSession, path: str, observatories: dict | None = None
) -> DataFrame:
    """Decode a file/directory of GOES DCP messages into a long frame.

    ``binaryFile`` scan (one task per file — messages are newline-framed
    raw bytes, so a text scan would corrupt them) -> Arrow ``mapInPandas``
    batches running the NumPy kernel above.  Returns columns (station,
    channel, t_us, value, transmit_us, gps_corrected); malformed lines and
    unknown platforms are silently skipped like the reference's
    stderr-and-continue loop (``:75-99``).
    """
    obs = observatories or OBSERVATORIES
    platforms = {v["platform"]: (k, v) for k, v in obs.items()}

    def decode(batches):
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                for line in bytes(content).split(b"\n"):
                    out.extend(decode_message(line, platforms))
            yield pd.DataFrame(
                out, columns=[f.name for f in _SCHEMA.fields]
            )

    raw = spark.read.format("binaryFile").load(path).select("content")
    return raw.mapInPandas(decode, schema=_SCHEMA)
