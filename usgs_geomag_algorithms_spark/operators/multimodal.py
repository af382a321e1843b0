"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a struct of
metadata; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Payloads that are **PPM (P6) images get a REAL pure-NumPy codec**: header
parse, pixel decode, per-channel feature stats, bilinear resize, and
re-encode — a genuinely functional image path with zero external
libraries. Compressed formats (JPEG/PNG/audio/video) remain STUBBED
(no pillow/ffmpeg in this container): ``deterministic=True`` produces a
seeded fake decode (hash-derived dimensions + features) so the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested;
``deterministic=False`` raises NotImplementedError at the library call
site.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string"
)

DECODE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int, feature array<float>"
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Typed metadata projection over the opaque binary column — pure JVM
    expressions; the payload bytes are never shipped to Python here."""
    return df.select(
        id_col,
        "kind",
        F.length(payload_col).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
        F.col(payload_col),
    )


# ------------------------------------------------------ real PPM codec
def ppm_decode(payload: bytes) -> np.ndarray | None:
    """Parse a binary PPM (P6, maxval 255) payload into an (H, W, 3)
    uint8 array; None when the payload is not P6."""
    if not payload.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval
    if len(fields) < 3 or fields[2] != 255:
        return None
    w, h = fields[0], fields[1]
    # malformed/truncated payloads route to the fallback branches instead
    # of raising inside mapInPandas and failing the whole job
    if w <= 0 or h <= 0 or n - i < w * h * 3:
        return None
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3)


def ppm_encode(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6) payload."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def bilinear_resize(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Pure-NumPy bilinear resample to (target_h, target_w, 3), uint8 —
    vectorized over the whole image (edge-clamped sample grid)."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) + 0.5) * h / target_h - 0.5
    xs = (np.arange(target_w) + 0.5) * w / target_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _ppm_features(img: np.ndarray, feat_dim: int) -> np.ndarray:
    """Real per-channel statistics: mean and std of R/G/B scaled to
    [0, 1], padded/truncated to ``feat_dim``."""
    flat = img.reshape(-1, 3).astype(np.float64) / 255.0
    feats = np.concatenate([flat.mean(axis=0), flat.std(axis=0)])
    return np.resize(feats, feat_dim).astype(np.float32)


def _fake_decode(digest: bytes, kind: str, feat_dim: int) -> tuple:
    """Deterministic stand-in for a real decoder: dimensions and a feature
    vector derived from the payload digest (computed ONCE by the caller —
    hashing is the dominant per-byte cost of the stage). Replace with
    PIL/ffmpeg at deploy time."""
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 if kind == "image" else 1 + digest[2] % 32
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feat = np.resize(rng / 255.0, feat_dim)
    return width, height, n_frames, feat


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    feat_dim: int = 8,
    deterministic: bool = True,
    batch_rows_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches; payload
    bytes cross to Python once, per batch, never per row)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.sha256(bytes(b)).digest() for b in pdf[payload_col]]
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
                "sha256": [d.hex() for d in digests],
            }
            decoded = []
            for b, d, k in zip(pdf[payload_col], digests, pdf["kind"]):
                img = ppm_decode(bytes(b))
                if img is not None:
                    # the REAL path: parsed header, pixel statistics
                    decoded.append(
                        (
                            img.shape[1],
                            img.shape[0],
                            1,
                            _ppm_features(img, feat_dim),
                        )
                    )
                elif deterministic:
                    decoded.append(_fake_decode(d, k, feat_dim))
                else:
                    raise NotImplementedError(
                        "decoding compressed media requires PIL/ffmpeg; "
                        "not in container (PPM/P6 decodes natively)"
                    )
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["n_frames"] = pd.Series([d[2] for d in decoded], dtype="int32")
            out["feature"] = [d[3] for d in decoded]
            yield pd.DataFrame(out)

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def frame_sample(
    decoded: DataFrame, every_n: int = 8
) -> DataFrame:
    """Frame sampling plan: explode sampled frame indices JVM-side (the
    per-frame decode would live in a follow-up mapInPandas)."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


RESIZE_SCHEMA = (
    "media_id long, width int, height int, target_w int, target_h int, "
    "resized binary"
)


def resize_media(
    decoded_with_payload: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    payload_col: str = "payload",
    deterministic: bool = True,
) -> DataFrame:
    """Resize plan: Arrow-batched ``mapInPandas`` producing a new binary
    payload at (target_w, target_h). The pixel kernel is STUBBED like
    decode — ``deterministic=True`` emits a digest-derived payload whose
    length scales with the target area (so batch-shape/size accounting is
    testable); ``deterministic=False`` marks the PIL call site."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for b in pdf[payload_col]:
                img = ppm_decode(bytes(b))
                if img is not None:
                    # REAL path: bilinear resample + re-encode
                    resized.append(
                        ppm_encode(bilinear_resize(img, target_w, target_h))
                    )
                elif deterministic:
                    resized.append(
                        (hashlib.sha256(
                            bytes(b) + b"%dx%d" % (target_w, target_h)
                        ).digest() * (target_w * target_h // 32 + 1))[
                            : target_w * target_h // 8
                        ]
                    )
                else:
                    raise NotImplementedError(
                        "resizing compressed media requires PIL; not in "
                        "container (PPM/P6 resizes natively)"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized": resized,
                }
            )

    return decoded_with_payload.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


def synthetic_ppm(spark, n: int = 16, w: int = 24, h: int = 16) -> DataFrame:
    """Real P6 images (deterministic per-id gradient + id-keyed stripe)
    for exercising the native decode/resize path end to end."""
    rows = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                np.full((h, w), (i * 37) % 256, dtype=np.uint8),
            ],
            axis=-1,
        )
        rows.append((i, "image", bytearray(ppm_encode(img))))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench: payload bytes derived
    from the row id."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("media-payload-"), F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256)),
            "UTF-8",
        ).alias("payload"),
    )
