"""Pure-NumPy baseline JPEG codec (no PIL/libjpeg).

Decoder: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
components, Huffman entropy coding, 1x1/2x1/1x2/2x2 sampling factors
(4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers, 0xFF00 byte stuffing.
Anything else (progressive SOF2, arithmetic coding, 12-bit, CMYK)
returns ``None`` so callers fall through to their stub branches — the
same contract as the PPM/PNG/WAV codecs beside it
(``operators/multimodal.py``).

Encoder: baseline 4:4:4 (or grayscale) with the JPEG Annex K example
quantization and Huffman tables, quality-scaled the libjpeg way — enough
to produce real interoperable files and to round-trip-test the decoder.

The IDCT/FDCT run vectorized over ALL blocks at once (einsum against the
8x8 orthonormal DCT-II basis); only the entropy coding walks bits in
Python, which is the honest cost of a dependency-free codec at test
scale (the Spark plumbing batches via Arrow either way).

Reference for scope: the reference repo treats media as opaque binary
columns; this codec exists so the multimodal pipeline's decode /
feature / resize stages are REAL for the most common web image format.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
UNZIGZAG = np.argsort(ZIGZAG)

#: orthonormal 8x8 DCT-II basis: X = A @ x @ A.T, x = A.T @ X @ A
_A = np.array([
    [np.sqrt(1 / 8) * (1 if k == 0 else np.sqrt(2))
     * np.cos(np.pi * (2 * n + 1) * k / 16) for n in range(8)]
    for k in range(8)
]) * np.array([[1.0]])
# normalize row 0 (c_0 = 1/sqrt(2) folded above via the k==0 branch)
_A[0] = np.sqrt(1 / 8)

# JPEG Annex K example tables (the de-facto standard set)
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])
# (counts[1..16], symbols) per Annex K
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


# --------------------------------------------------------------- Huffman
def build_huffman(counts, symbols):
    """Canonical JPEG Huffman table (Annex C): {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def build_huffman_encode(counts, symbols):
    """symbol -> (length, code), inverse of :func:`build_huffman`."""
    return {sym: (ln, code) for (ln, code), sym in
            build_huffman(counts, symbols).items()}


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing; restart markers are
    consumed by the caller via :meth:`restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1s past the end (spec-sanctioned for the tail)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # any real marker (RSTn, EOI, DNL, …) ends the entropy
                    # bytes: stop consuming and pad with 1s
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table) -> int | None:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None

    def restart(self) -> bool:
        """Byte-align and consume an RSTn marker; False if absent."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            return True
        return False


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude category decode (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------- decoder
def jpeg_decode(payload: bytes) -> np.ndarray | None:
    """Baseline JPEG -> (H, W, 3) uint8 RGB (grayscale replicated).
    Returns None for anything outside baseline-sequential scope."""
    try:
        return _jpeg_decode(payload)
    except (IndexError, ValueError, KeyError, struct.error):
        return None  # malformed streams route to the stub fallback


def _jpeg_decode(payload: bytes) -> np.ndarray | None:
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside a scan
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    return None  # 16-bit tables out of scope
                qtables[tq] = np.frombuffer(
                    seg[j + 1 : j + 65], np.uint8
                ).astype(np.int32)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                syms = list(seg[j + 17 : j + 17 + total])
                htables[(tc, th)] = build_huffman(counts, syms)
                j += 17 + total
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                return None
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive/arithmetic/hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                payload, i + 2 + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        i += 2 + seglen
    return None


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    reader = _BitReader(data, pos)
    # coefficient stores, one (rows, cols, 8, 8) per component
    planes_coef = []
    for c in comps:
        planes_coef.append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8), np.float64)
        )
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                if not reader.restart():
                    return None  # missing RST where declared
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                dct = htables.get((0, dc_t))
                act = htables.get((1, ac_t))
                if dct is None or act is None:
                    return None
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, np.float64)
                        s = reader.decode(dct)
                        if s is None:
                            return None
                        diff = _extend(reader.read_bits(s), s)
                        preds[ci] += diff
                        coef[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode(act)
                            if rs is None:
                                return None
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            coef[k] = (
                                _extend(reader.read_bits(size), size) * q[k]
                            )
                            k += 1
                        planes_coef[ci][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = coef[UNZIGZAG].reshape(8, 8)
    # vectorized IDCT over every block of every component
    planes = []
    for ci, c in enumerate(comps):
        blocks = planes_coef[ci]
        spatial = np.einsum("ku,rcuv,vl->rckl", _A.T, blocks, _A)
        rows, cols = blocks.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        plane = np.clip(np.rint(plane + 128.0), 0, 255)
        # upsample to full resolution (nearest; spec-legal)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# --------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of a base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, coef_z, pred, dc_enc, ac_enc):
    """coef_z: 64 quantized ints in zigzag order. Returns new DC pred."""
    dc = int(coef_z[0])
    diff = dc - pred
    size = int(diff).bit_length() if diff else 0
    ln, code = dc_enc[size]
    bw.write(code, ln)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(v, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_z[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        ln, code = ac_enc[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample (edge-padded to even dims first)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])


def jpeg_encode(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB (or (H, W) / (H, W, 1) grayscale) -> baseline
    JFIF bytes with Annex K tables quality-scaled. ``subsampling``:
    '444' (each component full-resolution) or '420' (chroma box-averaged
    2x2, the web default). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (resettable streams)."""
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    if gray:
        planes = [img.reshape(h, w).astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and not gray
    if sub420:
        planes = [planes[0], _box2(planes[1]), _box2(planes[2])]
        hv = [(2, 2), (1, 1), (1, 1)]
    else:
        hv = [(1, 1)] * len(planes)
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    q_luma = _quality_scale(QTBL_LUMA, quality)
    q_chroma = _quality_scale(QTBL_CHROMA, quality)
    qts = [q_luma] if gray else [q_luma, q_chroma, q_chroma]
    tq = [0] if gray else [0, 1, 1]
    dc_encs = [build_huffman_encode(*DC_LUMA)]
    ac_encs = [build_huffman_encode(*AC_LUMA)]
    if not gray:
        dc_encs.append(build_huffman_encode(*DC_CHROMA))
        ac_encs.append(build_huffman_encode(*AC_CHROMA))
    tsel = [0] if gray else [0, 1, 1]

    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane to its MCU-aligned block grid, FDCT all blocks at once
    coefs = []
    for pi, plane in enumerate(planes):
        rows, cols = mcus_y * hv[pi][1], mcus_x * hv[pi][0]
        ph, pw = plane.shape
        padded = np.pad(
            plane, ((0, rows * 8 - ph), (0, cols * 8 - pw)), mode="edge"
        ) - 128.0
        blocks = padded.reshape(rows, 8, cols, 8).transpose(0, 2, 1, 3)
        dct = np.einsum("ku,rcuv,vl->rckl", _A, blocks, _A.T)
        qz = np.rint(
            dct.reshape(rows, cols, 64)[..., ZIGZAG]
            / qts[pi][None, None, :].astype(np.float64)
        ).astype(np.int64)
        coefs.append(qz)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and (
                mcu_idx % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            mcu_idx += 1
            for pi in range(len(planes)):
                ch, cv = hv[pi]
                for by in range(cv):
                    for bx in range(ch):
                        preds[pi] = _encode_block(
                            bw,
                            coefs[pi][my * cv + by, mx * ch + bx],
                            preds[pi],
                            dc_encs[tsel[pi]],
                            ac_encs[tsel[pi]],
                        )
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid, tbl):
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in tbl))

    def dht(tc, th, counts, syms):
        return seg(
            0xC4,
            bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms),
        )

    ncomp = len(planes)
    sof_body = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof_body += bytes(
            [ci + 1, (hv[ci][0] << 4) | hv[ci][1], tq[ci]]
        )
    sos_body = bytes([ncomp])
    for ci in range(ncomp):
        sos_body += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos_body += bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += dqt(0, q_luma[ZIGZAG])
    if not gray:
        out += dqt(1, q_chroma[ZIGZAG])
    out += seg(0xC0, sof_body)
    out += dht(0, 0, *DC_LUMA) + dht(1, 0, *AC_LUMA)
    if not gray:
        out += dht(0, 1, *DC_CHROMA) + dht(1, 1, *AC_CHROMA)
    out += seg(0xDA, sos_body)
    out += bytes(bw.out)
    out += b"\xff\xd9"
    return out
