"""miniSEED (SEED v2.4 data records) decoder + encoder.

The reference acquires waveform data as miniSEED through obspy's NEIC
client (``geomagio/edge/MiniSeedFactory.py:17,85`` — the socket itself is
a non-goal here) and pushes edits back with ``MiniSeedInputClient``
(``geomagio/edge/MiniSeedInputClient.py``).  What travels over those
sockets — and what sits in every seismic/geomag archive — is the public
FDSN SEED 2.4 data-record format: a 48-byte fixed header, a chain of
blockettes (1000 carries encoding/word-order/record-length), and a data
payload that is almost always Steim-1 or Steim-2 compressed (64-byte
frames of 2-bit-coded difference words).  This module implements that
format from the published spec so tier tables can be loaded straight
from miniSEED archives and written back out:

- :func:`read_mseed` — ``binaryFile`` scan -> Arrow ``mapInPandas``
  batches running a vectorized-NumPy record decoder (the same
  scale shape as ``sources/imfv283.py``: one task per file, files as the
  parallelism axis; a 100 TB archive is millions of day-files).
- :func:`decode_payloads` — the same kernel over an in-table ``binary``
  column (records fetched from a socket/queue and staged in a table).
- :func:`write_mseed` — per-series ``applyInPandas`` encoder producing
  record-stream payloads (the ``MiniSeedInputClient.send`` analog as a
  sink; also the test-vector generator, like the IMFV283 inverse
  encoder).

Steim decode is vectorized per record: control-nibble/dnib class masks
select every word of a class at once, fancy-indexed into the difference
array, then one cumsum reconstructs samples — no per-word Python loop.
Encodings 1/3/4/5 (int16/int32/float32/float64) are raw ``frombuffer``
casts.  Both byte orders are supported (header order detected by the
year-plausibility heuristic every mseed reader uses; payload order from
blockette 1000).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone
from fractions import Fraction

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

US = 1_000_000

#: SEED encoding format codes (blockette 1000 field 4)
ENC_INT16 = 1
ENC_INT32 = 3
ENC_FLOAT32 = 4
ENC_FLOAT64 = 5
ENC_STEIM1 = 10
ENC_STEIM2 = 11

# Steim word classes: class id -> (values per word, bit width, shifts).
# Steim-1: control code is the class.  Steim-2: code 2/3 words carry a
# 2-bit "dnib" in bits 31..30 selecting the sub-class.
_STEIM1_TABLE = {
    1: (4, 8, (24, 16, 8, 0)),
    2: (2, 16, (16, 0)),
    3: (1, 32, (0,)),
}
_STEIM2_TABLE = {
    1: (4, 8, (24, 16, 8, 0)),
    2: (1, 30, (0,)),          # code 2, dnib 1
    3: (2, 15, (15, 0)),       # code 2, dnib 2
    4: (3, 10, (20, 10, 0)),   # code 2, dnib 3
    5: (5, 6, (24, 18, 12, 6, 0)),          # code 3, dnib 0
    6: (6, 5, (25, 20, 15, 10, 5, 0)),      # code 3, dnib 1
    7: (7, 4, (24, 20, 16, 12, 8, 4, 0)),   # code 3, dnib 2
}


def _steim_decode(
    payload: bytes, nsamp: int, steim2: bool, big: bool
) -> np.ndarray | None:
    """Decode Steim-1/2 frames into ``nsamp`` int64 samples (None when
    the payload is malformed or carries fewer differences than
    ``nsamp``)."""
    nf = len(payload) // 64
    if nf == 0:
        return None
    words = np.frombuffer(
        payload[: nf * 64], dtype=">u4" if big else "<u4"
    ).reshape(nf, 16).astype(np.uint32)
    ctrl = words[:, 0]
    shifts = (30 - 2 * np.arange(16, dtype=np.uint32)).astype(np.uint32)
    codes = ((ctrl[:, None] >> shifts[None, :]) & 3).astype(np.uint8)
    # forward/reverse integration constants live in frame 0 words 1-2
    # (control code 0, so they never enter a data class below)
    def _i32(u: int) -> int:
        return u - (1 << 32) if u >= (1 << 31) else u

    x0 = _i32(int(words[0, 1]))
    xn = _i32(int(words[0, 2]))
    flat_w = words.ravel()
    flat_c = codes.ravel()
    if steim2:
        dnib = ((flat_w >> np.uint32(30)) & 3).astype(np.uint8)
        cls = np.zeros(flat_w.shape, np.uint8)
        cls[flat_c == 1] = 1
        for d, ci in ((1, 2), (2, 3), (3, 4)):
            cls[(flat_c == 2) & (dnib == d)] = ci
        for d, ci in ((0, 5), (1, 6), (2, 7)):
            cls[(flat_c == 3) & (dnib == d)] = ci
        table = _STEIM2_TABLE
    else:
        cls = flat_c
        table = _STEIM1_TABLE
    counts = np.zeros(flat_w.shape, np.int64)
    for ci, (k, _b, _sh) in table.items():
        counts[cls == ci] = k
    total = int(counts.sum())
    if total < nsamp:
        return None
    pos = np.concatenate(([0], np.cumsum(counts)[:-1]))
    diffs = np.zeros(total, np.int64)
    for ci, (k, b, sh) in table.items():
        m = cls == ci
        if not m.any():
            continue
        wv = flat_w[m].astype(np.int64)
        p = pos[m]
        half = 1 << (b - 1)
        mask = (1 << b) - 1
        for i, s in enumerate(sh):
            v = (wv >> s) & mask
            diffs[p + i] = ((v + half) & mask) - half
    # d[0] is the difference from the PREVIOUS record's last sample; the
    # record is self-contained through x0, so reconstruction ignores it
    out = np.empty(nsamp, np.int64)
    out[0] = x0
    if nsamp > 1:
        np.cumsum(diffs[1:nsamp], out=out[1:])
        out[1:] += x0
    if out[-1] != xn:
        return None  # reverse-integration check failed: corrupt record
    return out


def _parse_record(buf: bytes, off: int) -> tuple[dict | None, int]:
    """Parse one SEED data record at ``off``; returns (fields, reclen).
    fields is None for records that should be skipped (noise/ASCII logs);
    reclen always advances past the record."""
    if off + 64 > len(buf):
        return None, len(buf) - off
    hdr = buf[off : off + 48]
    # byte-order of the header: SEED doesn't flag it, so detect via the
    # year field like every mseed reader does
    big = 1900 <= struct.unpack(">H", hdr[20:22])[0] <= 2100
    e = ">" if big else "<"
    year, doy, hh, mm, ss, _, fract = struct.unpack(e + "HHBBBBH", hdr[20:30])
    nsamp, rf, rm = struct.unpack(e + "Hhh", hdr[30:36])
    act = hdr[36]
    nblk = hdr[39]
    (tcorr,) = struct.unpack(e + "i", hdr[40:44])
    data_off, blk_off = struct.unpack(e + "HH", hdr[44:48])
    # blockette walk for 1000 (encoding, payload word order, record len)
    enc, payload_big, reclen = None, True, 512
    b = blk_off
    for _ in range(nblk):
        if b == 0 or off + b + 4 > len(buf):
            break
        btype, bnext = struct.unpack(e + "HH", buf[off + b : off + b + 4])
        if btype == 1000 and off + b + 7 <= len(buf):
            enc = buf[off + b + 4]
            payload_big = buf[off + b + 5] == 1
            reclen = 1 << buf[off + b + 6]
            break
        b = bnext
    if enc is None or nsamp == 0 or not (1 <= doy <= 366):
        return None, reclen
    try:
        t0 = datetime(year, 1, 1, tzinfo=timezone.utc) + timedelta(
            days=int(doy) - 1, hours=hh, minutes=mm, seconds=ss
        )
    except ValueError:
        return None, reclen
    t0_us = int(t0.timestamp()) * US + int(fract) * 100
    if not (act & 0x02):  # time correction not yet applied
        t0_us += int(tcorr) * 100
    # sample rate from factor/multiplier (SEED 2.4 fixed header fields
    # 10-11); keep it rational so slow channels (1/60 Hz) stamp exactly
    if rf == 0:
        return None, reclen
    rate = Fraction(rf, 1) if rf > 0 else Fraction(1, -rf)
    if rm > 0:
        rate *= rm
    elif rm < 0:
        rate /= -rm
    if rate <= 0:
        return None, reclen
    payload = buf[off + data_off : off + reclen]
    if enc in (ENC_STEIM1, ENC_STEIM2):
        vals = _steim_decode(
            payload, nsamp, enc == ENC_STEIM2, payload_big
        )
        if vals is None:
            return None, reclen
        vals = vals.astype(np.float64)
    else:
        eo = ">" if payload_big else "<"
        dt = {
            ENC_INT16: eo + "i2",
            ENC_INT32: eo + "i4",
            ENC_FLOAT32: eo + "f4",
            ENC_FLOAT64: eo + "f8",
        }.get(enc)
        if dt is None:
            return None, reclen  # unsupported legacy encoding: skip
        arr = np.frombuffer(payload, dtype=dt)
        if len(arr) < nsamp:
            return None, reclen
        vals = arr[:nsamp].astype(np.float64)
    idx = np.arange(nsamp, dtype=np.int64)
    t_us = t0_us + (idx * (US * rate.denominator)) // rate.numerator
    return {
        "network": hdr[18:20].decode("ascii", "replace").strip(),
        "station": hdr[8:13].decode("ascii", "replace").strip(),
        "location": hdr[13:15].decode("ascii", "replace").strip(),
        "channel": hdr[15:18].decode("ascii", "replace").strip(),
        "quality": chr(hdr[6]),
        "rate_hz": float(rate),
        "t_us": t_us,
        "value": vals,
    }, reclen


def decode_records(buf: bytes) -> list[dict]:
    """Decode every record in a byte stream (records self-describe their
    length via blockette 1000; malformed records are skipped by length)."""
    out = []
    off = 0
    n = len(buf)
    while off + 64 <= n:
        rec, reclen = _parse_record(buf, off)
        if rec is not None:
            out.append(rec)
        off += max(reclen, 64)
    return out


_SCHEMA = T.StructType(
    [
        T.StructField("network", T.StringType()),
        T.StructField("station", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("quality", T.StringType()),
        T.StructField("rate_hz", T.DoubleType()),
        T.StructField("t_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _records_to_pdf(bufs) -> pd.DataFrame:
    cols: dict[str, list] = {f.name: [] for f in _SCHEMA.fields}
    for buf in bufs:
        for rec in decode_records(bytes(buf)):
            ns = len(rec["t_us"])
            for k in ("network", "station", "location", "channel", "quality"):
                cols[k].append(np.repeat(rec[k], ns))
            cols["rate_hz"].append(np.full(ns, rec["rate_hz"]))
            cols["t_us"].append(rec["t_us"])
            cols["value"].append(rec["value"])
    if not cols["t_us"]:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype=object) for f in _SCHEMA.fields}
        )
    return pd.DataFrame(
        {k: np.concatenate(v) for k, v in cols.items()}
    )


def read_mseed(spark: SparkSession, path: str) -> DataFrame:
    """Scan a file/directory/glob of miniSEED and decode to a long frame
    (network, station, location, channel, quality, rate_hz, t_us, value).

    ``binaryFile`` scan — one task per file; at archive scale the file
    count is the parallelism axis, the kernel never sees more than one
    file's bytes at a time."""

    def decode(batches):
        for pdf in batches:
            yield _records_to_pdf(pdf["content"])

    raw = spark.read.format("binaryFile").load(path).select("content")
    return raw.mapInPandas(decode, schema=_SCHEMA)


def decode_payloads(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """The same decoder over an in-table binary column (records staged
    from a socket/queue into a table)."""

    def decode(batches):
        for pdf in batches:
            yield _records_to_pdf(pdf[payload_col])

    return df.select(payload_col).mapInPandas(decode, schema=_SCHEMA)


# --------------------------------------------------------------- encoder
def _steim_pack(
    diffs: np.ndarray, steim2: bool
) -> tuple[list[tuple[int, list[int]]], int]:
    """Greedy Steim packing: consume diffs left-to-right, always taking
    the densest class whose widths fit.  Returns ([(class_id, values)],
    n_packed); stops early when a diff exceeds the format's widest class
    (the caller splits the record there)."""
    if steim2:
        order = [(7, 7, 4), (6, 6, 5), (5, 5, 6), (1, 4, 8), (4, 3, 10), (3, 2, 15), (2, 1, 30)]
    else:
        order = [(1, 4, 8), (2, 2, 16), (3, 1, 32)]
    out: list[tuple[int, list[int]]] = []
    i, n = 0, len(diffs)
    while i < n:
        placed = False
        for ci, k, b in order:
            if i + k > n:
                continue
            lo, hi = -(1 << (b - 1)), (1 << (b - 1)) - 1
            chunk = diffs[i : i + k]
            if chunk.min() >= lo and chunk.max() <= hi:
                out.append((ci, [int(v) for v in chunk]))
                i += k
                placed = True
                break
        if not placed:
            break  # diff too wide for the format's widest class
    return out, i


def _steim_frames(
    samples: np.ndarray, steim2: bool, n_frames: int, prev: int | None
) -> tuple[bytes, int]:
    """Assemble Steim frames for as many samples as fit in ``n_frames``;
    returns (payload, n_encoded)."""
    d = np.empty(len(samples), np.int64)
    d[0] = 0 if prev is None else int(samples[0]) - int(prev)
    d[1:] = np.diff(samples)
    groups, _ = _steim_pack(d, steim2)
    if steim2:
        dnib = {2: 1, 3: 2, 4: 3, 5: 0, 6: 1, 7: 2}
        code = {1: 1, 2: 2, 3: 2, 4: 2, 5: 3, 6: 3, 7: 3}
        table = _STEIM2_TABLE
    else:
        dnib, code = {}, {1: 1, 2: 2, 3: 3}
        table = _STEIM1_TABLE
    frames = np.zeros((n_frames, 16), np.uint32)
    codes = np.zeros((n_frames, 16), np.uint8)
    fi, wi = 0, 3  # frame 0 words 1-2 reserved for X0/Xn
    n_enc = 0
    for ci, vals in groups:
        if fi >= n_frames:
            break
        k, b, sh = table[ci]
        mask = (1 << b) - 1
        w = 0
        for v, s in zip(vals, sh):
            w |= (v & mask) << s
        if steim2 and ci in dnib:
            w |= dnib[ci] << 30
        frames[fi, wi] = w & 0xFFFFFFFF
        codes[fi, wi] = code[ci]
        n_enc += k
        wi += 1
        if wi == 16:
            fi += 1
            wi = 1
    if n_enc == 0:
        return b"", 0
    n_enc = min(n_enc, len(samples))
    frames[0, 1] = np.uint32(np.int64(samples[0]) & 0xFFFFFFFF)
    frames[0, 2] = np.uint32(np.int64(samples[n_enc - 1]) & 0xFFFFFFFF)
    shifts = 30 - 2 * np.arange(16)
    ctrl = (codes.astype(np.uint32) << shifts[None, :].astype(np.uint32)).sum(
        axis=1, dtype=np.uint64
    )
    frames[:, 0] = ctrl.astype(np.uint32)
    return frames.astype(">u4").tobytes(), n_enc


def _rate_fields(rate: Fraction) -> tuple[int, int]:
    """rate = num/den -> SEED (factor, multiplier).  Integer rates use
    (rate, 1); 1/N rates the conventional (-N, 1); general rationals
    f>0, m<0 (rate = -f/m)."""
    if rate.denominator == 1:
        return int(rate), 1
    if rate.numerator == 1:
        return -rate.denominator, 1
    return rate.numerator, -rate.denominator


def encode_mseed(
    samples,
    t0_us: int,
    rate_hz,
    network: str = "NT",
    station: str = "BOU",
    location: str = "R0",
    channel: str = "MVH",
    encoding: int = ENC_STEIM2,
    record_bytes: int = 512,
    quality: str = "D",
) -> bytes:
    """Encode a regular-rate series into a stream of SEED data records
    (fixed header + blockette 1000 + payload) — the file/socket format
    ``MiniSeedInputClient.send`` emits.  Integer encodings require
    integral samples; rate must be rational (Fraction/int, or 1/int)."""
    rate = Fraction(rate_hz).limit_denominator(10**6)
    rf, rm = _rate_fields(rate)
    vals = np.asarray(samples)
    if encoding in (ENC_STEIM1, ENC_STEIM2, ENC_INT16, ENC_INT32):
        vals = vals.astype(np.int64)
    else:
        vals = vals.astype(np.float64)
    out = bytearray()
    seq = 1
    i = 0
    n = len(vals)
    n_frames = (record_bytes - 64) // 64
    while i < n:
        chunk = vals[i:]
        if encoding in (ENC_STEIM1, ENC_STEIM2):
            payload, took = _steim_frames(
                chunk,
                encoding == ENC_STEIM2,
                n_frames,
                int(vals[i - 1]) if i else None,
            )
            if took == 0:
                raise ValueError("difference too wide for Steim encoding")
            payload = payload.ljust(record_bytes - 64, b"\x00")
        else:
            dt = {
                ENC_INT16: ">i2",
                ENC_INT32: ">i4",
                ENC_FLOAT32: ">f4",
                ENC_FLOAT64: ">f8",
            }[encoding]
            per = (record_bytes - 64) // np.dtype(dt).itemsize
            took = min(per, len(chunk))
            payload = (
                chunk[:took].astype(dt).tobytes().ljust(record_bytes - 64, b"\x00")
            )
        t_us = t0_us + (i * US * rate.denominator) // rate.numerator
        t = datetime.fromtimestamp(t_us // US, tz=timezone.utc)
        btime = struct.pack(
            ">HHBBBBH",
            t.year,
            t.timetuple().tm_yday,
            t.hour,
            t.minute,
            t.second,
            0,
            (t_us % US) // 100,
        )
        hdr = (
            b"%06d" % (seq % 1000000)
            + quality.encode()
            + b" "
            + station.ljust(5).encode()
            + location.ljust(2).encode()
            + channel.ljust(3).encode()
            + network.ljust(2).encode()
            + btime
            + struct.pack(">Hhh", took, rf, rm)
            + bytes([0x02, 0, 0, 1])  # act(tcorr applied), io, dq, nblk
            + struct.pack(">i", 0)
            + struct.pack(">HH", 64, 48)
        )
        b1000 = struct.pack(
            ">HHBBBB", 1000, 0, encoding, 1, record_bytes.bit_length() - 1, 0
        )
        rec = hdr + b1000 + b"\x00" * 8 + payload
        assert len(rec) == record_bytes
        out += rec
        i += took
        seq += 1
    return bytes(out)


def write_mseed(
    sig: DataFrame,
    rate_hz,
    series_cols=("network", "station", "location", "channel"),
    ts_col: str = "t_us",
    value_col: str = "value",
    encoding: int = ENC_STEIM2,
    record_bytes: int = 512,
) -> DataFrame:
    """Per-series miniSEED encode: groups shuffle once on the series key,
    each group sorts locally and emits ONE payload of records (gaps in
    the grid split records naturally only at record boundaries; callers
    wanting strict gap splits pre-split on their gap table).  Returns
    (series_cols..., payload binary)."""
    series_cols = list(series_cols)
    rate = Fraction(rate_hz).limit_denominator(10**6)
    schema = T.StructType(
        [sig.schema[c] for c in series_cols]
        + [T.StructField("payload", T.BinaryType())]
    )

    def enc(key, pdf):
        pdf = pdf.sort_values(ts_col)
        kw = dict(zip(series_cols, key))
        payload = encode_mseed(
            pdf[value_col].to_numpy(),
            int(pdf[ts_col].iloc[0]),
            rate,
            encoding=encoding,
            record_bytes=record_bytes,
            **{
                k: v
                for k, v in kw.items()
                if k in ("network", "station", "location", "channel")
            },
        )
        return pd.DataFrame([{**kw, "payload": payload}])

    return sig.groupBy(*series_cols).applyInPandas(enc, schema=schema)
