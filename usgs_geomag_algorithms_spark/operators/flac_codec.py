"""Pure-NumPy/stdlib FLAC codec — the lossless-audio leg of the media
kernels (``operators/multimodal.py``), like ``jpeg_codec.py`` for images.

Decoder: the full fixed-blocking mono/stereo 4-16-bit subset real
encoders emit — STREAMINFO/metadata walk, frame sync + UTF-8 coded
numbers, all four stereo decorrelations (independent, left/side,
right/side, mid/side), subframe types CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32) with wasted bits, partitioned Rice residuals (4- and 5-bit
parameters, escape-to-verbatim), CRC-8 header and CRC-16 frame checks,
and the STREAMINFO MD5 of the decoded PCM as end-to-end verification.

Encoder: a real compressing encoder (not a stub): per-block best FIXED
predictor (order 0-2 by minimal residual magnitude), single-partition
Rice with per-block parameter estimation, correct CRCs and MD5 — its
output round-trips bit-exactly through the decoder and through any
spec-conforming FLAC decoder.

FIXED-predictor reconstruction is vectorized: an order-k fixed predictor
is exactly the k-th finite difference, so decode = k iterated
``np.cumsum`` with the warmup's difference pyramid as initial terms —
no per-sample Python on that path. Rice symbol parsing and LPC (a true
IIR) remain sequential by nature.

Container constraint: no libFLAC/ffmpeg here, so external validation is
structural (CRC-8/CRC-16/MD5 are all computed from the spec's
polynomials and must agree with the stream's own checks) plus
encoder/decoder round-trips; the format logic follows the published
FLAC spec (RFC 9639).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs
# CRC-8 poly x^8+x^2+x+1 (0x07), init 0; CRC-16 poly x^16+x^15+x^2+1
# (0x8005), init 0 — RFC 9639 §9.1.1/§9.3.
_CRC8_TABLE = np.zeros(256, dtype=np.uint8)
_CRC16_TABLE = np.zeros(256, dtype=np.uint16)
for _i in range(256):
    _c8 = _i
    _c16 = _i << 8
    for _ in range(8):
        _c8 = ((_c8 << 1) ^ 0x07 if _c8 & 0x80 else _c8 << 1) & 0xFF
        _c16 = ((_c16 << 1) ^ 0x8005 if _c16 & 0x8000 else _c16 << 1) & 0xFFFF
    _CRC8_TABLE[_i] = _c8
    _CRC16_TABLE[_i] = _c16


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[(c ^ b) & 0xFF])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ----------------------------------------------------------- bit reader
class _Bits:
    """MSB-first bit reader over a byte string (frames are byte-aligned
    at start and end, so byte-level CRC slicing stays exact)."""

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.pos = pos_bits
        self.ones = np.flatnonzero(self.bits)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        self.pos = p + n
        chunk = self.bits[p : p + n]
        if chunk.size < n:
            raise ValueError("flac: truncated stream")
        v = 0
        for b in chunk.tolist():
            v = (v << 1) | b
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count of 0 bits before the next 1 bit (RFC 9639 unary)."""
        j = np.searchsorted(self.ones, self.pos)
        if j >= self.ones.size:
            raise ValueError("flac: truncated unary")
        term = int(self.ones[j])
        q = term - self.pos
        self.pos = term + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ------------------------------------------------------- coded numbers
def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


# ------------------------------------------------------------ residual
def _read_residual(br: _Bits, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    n_part = 1 << po
    if block_size % n_part:
        raise ValueError("flac: block size not divisible by partitions")
    out = np.empty(block_size - order, dtype=np.int64)
    k = 0
    for p in range(n_part):
        cnt = (block_size >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: bad partition order")
        rp = br.read(pbits)
        if rp == escape:
            nb = br.read(5)
            for i in range(cnt):
                out[k + i] = br.read_signed(nb) if nb else 0
        else:
            for i in range(cnt):
                q = br.unary()
                u = (q << rp) | br.read(rp)
                out[k + i] = (u >> 1) ^ -(u & 1)  # unzigzag
        k += cnt
    return out


# ------------------------------------------------- fixed reconstruction
def _fixed_restore(warmup: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Order-k fixed prediction == k-th finite difference: rebuild with k
    iterated cumsums seeded by the warmup's difference pyramid."""
    if order == 0:
        return resid.copy()
    # difference pyramid of the warmup: d[j] = j-th difference's last value
    w = warmup.astype(np.int64)
    seeds = []
    cur = w
    for _ in range(order):
        seeds.append(cur[-1])
        cur = np.diff(cur)
    x = resid.astype(np.int64)
    for j in range(order - 1, -1, -1):
        x = seeds[j] + np.cumsum(x)
    return np.concatenate([w, x])


def _lpc_restore(
    warmup: np.ndarray, resid: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    order = len(coefs)
    n = order + resid.size
    x = np.empty(n, dtype=np.int64)
    x[:order] = warmup
    c = np.array(coefs[::-1], dtype=np.int64)  # oldest-first for the dot
    for i in range(order, n):
        pred = int(np.dot(c, x[i - order : i])) >> shift
        x[i] = pred + resid[i - order]
    return x


def _read_subframe(br: _Bits, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe pad bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if t == 0:  # CONSTANT
        v = br.read_signed(bps)
        x = np.full(block_size, v, dtype=np.int64)
    elif t == 1:  # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        warm = np.array([br.read_signed(bps) for _ in range(order)], dtype=np.int64)
        resid = _read_residual(br, block_size, order)
        x = _fixed_restore(warm, resid, order)
    elif t >= 32:  # LPC
        order = t - 31
        warm = np.array([br.read_signed(bps) for _ in range(order)], dtype=np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        x = _lpc_restore(warm, resid, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    return x << wasted if wasted else x


def flac_decode_int(payload: bytes):
    """Decode to ``(pcm int32 (n, channels), sample_rate, bits)`` or None
    when the payload is not FLAC / uses features outside the subset."""
    try:
        return _flac_decode_int(payload)
    except (ValueError, IndexError, struct.error):
        return None


def _flac_decode_int(payload: bytes):
    if len(payload) < 42 or payload[:4] != MAGIC:
        return None
    i = 4
    info = None
    while i + 4 <= len(payload):
        hdr = payload[i]
        last, btype = hdr >> 7, hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\0" + payload[i + 1 : i + 4])
        body = payload[i + 4 : i + 4 + blen]
        if btype == 0:  # STREAMINFO
            if blen != 34:
                return None
            sr_cc_bb = struct.unpack(">Q", body[10:18])[0]
            info = {
                "rate": (sr_cc_bb >> 44) & 0xFFFFF,
                "channels": ((sr_cc_bb >> 41) & 0x7) + 1,
                "bits": ((sr_cc_bb >> 36) & 0x1F) + 1,
                "total": sr_cc_bb & 0xFFFFFFFFF,
                "md5": body[18:34],
            }
        i += 4 + blen
        if last:
            break
    if info is None:
        return None

    chans = []
    n_ch = info["channels"]
    bps = info["bits"]
    # ONE bit-unpack for the whole stream: frames are byte-aligned, so a
    # shared reader at an absolute bit position replaces the per-frame
    # _Bits(payload[i:]) rebuild (which re-unpacked the remaining bytes
    # every frame — O(frames x stream) memory traffic)
    br = _Bits(payload, pos_bits=i * 8)
    nbits = br.bits.size
    while br.pos < nbits:
        # frame header ----------------------------------------------
        hstart = br.pos // 8
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: reserved frame bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved frame bit 2")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        elif sr_code in _SAMPLE_RATE_CODE:
            # a common-rate code must agree with STREAMINFO (frames
            # cannot change the stream's rate mid-file)
            if _SAMPLE_RATE_CODE[sr_code] != info["rate"]:
                raise ValueError("flac: frame sample rate != STREAMINFO")
        # code 0 = "get from STREAMINFO"; 3 is reserved (RFC 9639 §9.1.4)
        # and must not silently fall back to the STREAMINFO depth
        if ss_code and ss_code not in _SAMPLE_SIZE_CODE:
            raise ValueError("flac: reserved frame sample-size code")
        fbps = _SAMPLE_SIZE_CODE[ss_code] if ss_code else bps
        # header fields always total a whole byte count; CRC-8 covers them
        # and sits in the next byte, which must be consumed before the
        # first subframe
        hdr_end = br.pos // 8  # absolute byte offset (shared reader)
        if crc8(payload[hstart:hdr_end]) != payload[hdr_end]:
            raise ValueError("flac: frame header CRC mismatch")
        br.read(8)

        # subframes --------------------------------------------------
        # the side channel of a stereo decorrelation carries one extra
        # bit (RFC 9639 §9.2.3): left/side and mid/side widen subframe 1,
        # right/side widens subframe 0
        if ch_code <= 7:
            if ch_code + 1 != n_ch:
                raise ValueError("flac: channel count mismatch")
            subs = [_read_subframe(br, block_size, fbps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise ValueError("flac: stereo decorrelation on non-stereo")
            w0 = fbps + (1 if ch_code == 9 else 0)
            w1 = fbps + (1 if ch_code in (8, 10) else 0)
            s0 = _read_subframe(br, block_size, w0)
            s1 = _read_subframe(br, block_size, w1)
            if ch_code == 8:  # left/side: R = L - S
                subs = [s0, s0 - s1]
            elif ch_code == 9:  # right/side: L = R + S
                subs = [s1 + s0, s1]
            else:  # mid/side
                lr = (s0 << 1) | (s1 & 1)
                subs = [(lr + s1) >> 1, (lr - s1) >> 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        br.align()
        fend = br.pos // 8
        fcrc = br.read(16)
        if crc16(payload[hstart:fend]) != fcrc:
            raise ValueError("flac: frame CRC16 mismatch")
        chans.append(np.stack(subs, axis=1))

    pcm = np.concatenate(chans, axis=0)
    if info["total"]:
        pcm = pcm[: info["total"]]
    if info["md5"] != b"\0" * 16:
        if _pcm_md5(pcm, bps) != info["md5"]:
            raise ValueError("flac: MD5 mismatch")
    return pcm.astype(np.int32), int(info["rate"]), bps


def _pcm_md5(pcm: np.ndarray, bits: int) -> bytes:
    """STREAMINFO MD5: interleaved little-endian signed PCM."""
    width = (bits + 7) // 8
    inter = pcm.astype(np.int64).reshape(-1)
    if width == 1:
        raw = (inter & 0xFF).astype(np.uint8).tobytes()
    elif width == 2:
        raw = inter.astype("<i2").tobytes()
    else:
        raw = b"".join(
            int(v).to_bytes(width, "little", signed=True) for v in inter
        )
    return hashlib.md5(raw).digest()


# ------------------------------------------------------------ bit writer
class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _encode_coded_number(v: int) -> bytes:
    """UTF-8-style frame number (RFC 9639 §9.1.5)."""
    if v < 0x80:
        return bytes([v])
    out = []
    n = 2
    while v >= (1 << (5 * n + 1)) and n < 7:
        n += 1
    for _ in range(n - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF00 >> n) & 0xFF | v
    return bytes([lead] + out[::-1])


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    """Order-k residual = k-th finite difference (exact int math)."""
    d = x.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    return d


def _rice_param(resid: np.ndarray) -> int:
    u = (resid << 1) ^ (resid >> 63)  # zigzag
    total = int(u.sum())
    cnt = max(len(u), 1)
    rp = 0
    while (cnt << rp) < total and rp < 14:
        rp += 1
    return rp


def flac_encode(pcm: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n, channels) int PCM -> a real FLAC stream: per-block best FIXED
    predictor (order 0-2), single-partition Rice residuals, independent
    channels, correct CRC-8/CRC-16 and STREAMINFO MD5."""
    x = np.asarray(pcm, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, n_ch = x.shape
    if not 1 <= n_ch <= 8:
        raise ValueError("flac: 1-8 channels")
    # STREAMINFO packs rate into 20 bits and total samples into 36
    # (RFC 9639 §8.2) — out-of-range values would silently bleed into
    # the adjacent bit fields of the >Q pack below
    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("flac: sample_rate must fit in 20 bits")
    if n >= (1 << 36):
        raise ValueError("flac: total samples must fit in 36 bits")
    block = 4096
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bits, 0)

    frames = bytearray()
    fno = 0
    for s0 in range(0, n, block):
        blk = x[s0 : s0 + block]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # mandatory 0
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # block size: 16-bit at end of header
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(n_ch - 1, 4)  # independent channels
        w.write(ss_code, 3)
        w.write(0, 1)
        for b in _encode_coded_number(fno):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr = bytes(w.buf)
        w.write(crc8(hdr), 8)
        for c in range(n_ch):
            ch = blk[:, c]
            best, best_cost = 0, None
            for order in range(0, min(3, bs)):
                r = _fixed_residual(ch, order)
                cost = int(np.abs(r).sum())
                if best_cost is None or cost < best_cost:
                    best, best_cost = order, cost
            resid = _fixed_residual(ch, best)
            w.write(0, 1)  # pad
            w.write(8 + best, 6)  # FIXED order
            w.write(0, 1)  # no wasted bits
            for v in ch[:best].tolist():  # warmup
                w.write(int(v), bits)
            w.write(0, 2)  # rice method 0 (4-bit params)
            w.write(0, 4)  # partition order 0
            rp = _rice_param(resid)
            w.write(rp, 4)
            u = ((resid << 1) ^ (resid >> 63)).tolist()
            for uv in u:
                w.write_unary(uv >> rp)
                w.write(uv, rp)
        w.align()
        body = w.bytes()
        frames += body + struct.pack(">H", crc16(body))
        fno += 1

    si = bytearray()
    si += struct.pack(">H", block)  # min block
    si += struct.pack(">H", block)  # max block
    si += b"\0\0\0" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | n
    si += struct.pack(">Q", packed)
    si += _pcm_md5(x, bits)
    header = MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si)
    return header + bytes(frames)


def flac_decode(payload: bytes):
    """WAV-decode-shaped entry: ``(samples float64 in [-1,1] shaped
    (n, channels), sample_rate)`` or None."""
    dec = flac_decode_int(payload)
    if dec is None:
        return None
    pcm, rate, bits = dec
    return pcm.astype(np.float64) / float(1 << (bits - 1)), rate
