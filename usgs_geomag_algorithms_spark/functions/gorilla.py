"""Gorilla-style time-series compression (pure NumPy/Python, no deps).

Implements the two classic codecs from the Gorilla paper (Pelkonen et al.,
VLDB 2015, "Gorilla: A Fast, Scalable, In-Memory Time Series Database") —
public-knowledge encodings, re-implemented from the paper's description:

- values: XOR with previous; '0' bit for identical, '10' + meaningful bits
  when the XOR fits the previous leading/length window, '11' + 5-bit
  leading-zero count + 6-bit length + bits otherwise. float64, NaN-safe
  (NaN is just a bit pattern).
- timestamps: header (t0, first delta), then delta-of-delta buckets:
  '0' (dod=0), '10'+7b, '110'+9b, '1110'+12b, '1111'+64b.

This is our analog of the reference's compact storage encodings (scaled-int
Edge packing / miniseed STEIM — ``geomagio/edge/EdgeFactory.py:238-274``,
``geomagio/TimeseriesUtility.py:66-88``): rolled-up points are stored packed
per (series, segment) in binary columns; a regular grid encodes to ~1 bit
per timestamp.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


# ---------------------------------------------------------------- values
def encode_values(vals: np.ndarray) -> bytes:
    """XOR-encode a float64 array (NaNs allowed; bit-exact round trip)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    if len(bits) == 0:
        return b""
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    prev_lead, prev_len = 65, 0  # no previous window
    for b in bits[1:]:
        b = int(b)
        xor = prev ^ b
        if xor == 0:
            w.write(0, 1)
        else:
            lead = 64 - xor.bit_length()
            trail = (xor & -xor).bit_length() - 1
            if lead > 31:
                lead = 31
            if (
                prev_len
                and lead >= prev_lead
                and trail >= 64 - prev_lead - prev_len
            ):
                # fits previous window: '10' + meaningful bits
                w.write(0b10, 2)
                w.write(xor >> (64 - prev_lead - prev_len), prev_len)
            else:
                mlen = 64 - lead - trail
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mlen - 1, 6)  # 1..64 stored as 0..63
                w.write(xor >> trail, mlen)
                prev_lead, prev_len = lead, mlen
        prev = b
    return w.bytes()


def decode_values(data: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.float64)
    r = _BitReader(data)
    out = np.empty(count, dtype=np.uint64)
    prev = r.read(64)
    out[0] = prev
    prev_lead, prev_len = 65, 0
    for i in range(1, count):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10': previous window
            lead, mlen = prev_lead, prev_len
        else:  # '11': new window
            lead = r.read(5)
            mlen = r.read(6) + 1
            prev_lead, prev_len = lead, mlen
        xor = r.read(mlen) << (64 - lead - mlen)
        prev ^= xor
        out[i] = prev
    return out.view(np.float64)


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ------------------------------------------------------------ timestamps
_DOD_BUCKETS = (
    (0b10, 2, 7),  # [-63, 64]
    (0b110, 3, 9),  # [-255, 256]
    (0b1110, 4, 12),  # [-2047, 2048]
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (any unit; regular grids
    compress to ~1 bit/sample after the header)."""
    t = np.asarray(ts, dtype=np.int64)
    w = _BitWriter()
    if len(t) == 0:
        return b""
    w.write(int(t[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    if len(t) == 1:
        return w.bytes()
    d0 = int(t[1]) - int(t[0])
    w.write(d0 & 0xFFFFFFFFFFFFFFFF, 64)
    prev_delta = d0
    for i in range(2, len(t)):
        delta = int(t[i]) - int(t[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
            continue
        for prefix, pbits, vbits in _DOD_BUCKETS:
            lo = -(1 << (vbits - 1)) + 1
            hi = 1 << (vbits - 1)
            if lo <= dod <= hi:
                w.write(prefix, pbits)
                w.write(dod - lo, vbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & 0xFFFFFFFFFFFFFFFF, 64)
    return w.bytes()


def decode_timestamps(data: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    r = _BitReader(data)
    out = np.empty(count, dtype=np.int64)
    out[0] = _to_i64(r.read(64))
    if count == 1:
        return out
    delta = _to_i64(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, count):
        if r.read(1) == 0:
            dod = 0
        else:
            # prefix after the leading '1': '0'->7b, '10'->9b, '110'->12b,
            # '111'->64b raw
            if r.read(1) == 0:
                vbits = 7
            elif r.read(1) == 0:
                vbits = 9
            elif r.read(1) == 0:
                vbits = 12
            else:
                vbits = 64
            if vbits == 64:
                dod = _to_i64(r.read(64))
            else:
                lo = -(1 << (vbits - 1)) + 1
                dod = r.read(vbits) + lo
        delta = delta + dod
        out[i] = out[i - 1] + delta
    return out
