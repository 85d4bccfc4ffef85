"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels. The actual media decoding is STUBBED
(this container ships no image/audio libs): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (content-hash-seeded numpy) exercises the full Spark plumbing —
schema, batching, partitioning — which IS what this module tests and ships.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def _seed_from_payload(payload: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """payload → HxWx3 uint8 array. STUB: real decode needs PIL/libjpeg,
    not present in this container."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; pass fake=True for the deterministic test decoder"
        )
    rng = np.random.default_rng(_seed_from_payload(payload))
    return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)


def image_features(
    media: DataFrame, fake: bool = True, payload_col: str = "payload"
) -> DataFrame:
    """media_id → pooled feature vector (mean RGB + intensity histogram).

    The Spark-side contract is real: binary in, fixed-width float array out,
    one Arrow batch at a time; swap the fake decoder for a real one and
    nothing else changes.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf[payload_col]:
                img = decode_image(bytes(payload), fake=fake).astype(np.float64)
                mean_rgb = img.mean(axis=(0, 1)) / 255.0
                hist, _ = np.histogram(img.mean(axis=2), bins=8, range=(0, 255))
                hist = hist / hist.sum()
                feats.append(np.concatenate([mean_rgb, hist]).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": [f.tolist() for f in feats]}
            )

    return media.select("media_id", payload_col).mapInPandas(
        batch, schema="media_id long, features array<float>"
    )


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    fake: bool = True,
    payload_col: str = "payload",
) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_idx, frame binary).

    Frame extraction is faked (hash-derived bytes); the explode shape —
    a mapInPandas that yields MORE rows than it receives, partition-local,
    no shuffle — is the real pattern for 100 TB video tables.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf[payload_col], pdf["duration_ms"]
            ):
                n_frames = max(1, int(dur or 0) // every_ms)
                seed = _seed_from_payload(bytes(payload))
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.blake2b(
                            f"{seed}:{i}".encode(), digest_size=16
                        ).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", payload_col, "duration_ms").mapInPandas(
        batch, schema="media_id long, frame_idx int, frame binary"
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[
                    kind
                ],
                32,
                32,
                int(rng.integers(500, 5000)),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
