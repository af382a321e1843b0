"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a struct of
metadata; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries in this container): ``deterministic=True``
produces a seeded fake decode (hash-derived dimensions + features) so the
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested; ``deterministic=False`` raises NotImplementedError where a real
pillow/ffmpeg call would go.
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
            if not deterministic:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; not in container"
                )
            digests = [hashlib.sha256(bytes(b)).digest() for b in pdf[payload_col]]
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
                "sha256": [d.hex() for d in digests],
            }
            decoded = [
                _fake_decode(d, k, feat_dim)
                for d, k in zip(digests, pdf["kind"])
            ]
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
            if not deterministic:
                raise NotImplementedError(
                    "real resize requires PIL; not in container"
                )
            fake = [
                (hashlib.sha256(bytes(b) + b"%dx%d" % (target_w, target_h)).digest()
                 * (target_w * target_h // 32 + 1))[: target_w * target_h // 8]
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "resized": fake,
                }
            )

    return decoded_with_payload.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


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
