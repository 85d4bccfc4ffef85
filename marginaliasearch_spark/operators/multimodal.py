"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with typed
metadata; decode / feature-extraction / frame-sample run as Arrow-batched
``mapInPandas`` kernels. The actual media decoding is STUBBED (this
container ships no image/audio libs): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (content-hash-seeded splitmix64 pixels) exercises the full
Spark plumbing — schema, batching, partitioning — which IS what this module
tests and ships.

The fake decoder and the synthetic media table are built from md5 +
splitmix64 only, so the driver's DuckDB correctness oracle recomputes the
identical features/frames in pure SQL (functions/sql_oracles.py) — the
plumbing gets a hash-exact check, not a rows-only one.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _splitmix64

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMG_H = IMG_W = 32
_N_PIX = IMG_H * IMG_W  # 1024 pixels, 3 channels
HIST_BINS = 8
# intensity bin = min((r+g+b) // 96, 7): integer arithmetic, identical in
# numpy and SQL (np.histogram's float bin edges are not replayable in SQL)
_BIN_DIV = 96


def _seed_from_payload(payload: bytes) -> np.uint64:
    """First 8 md5 bytes of the payload's lowercase hex — matches the SQL
    twin ``('0x' || substr(md5(payload_hex), 1, 16))::UBIGINT``."""
    digest = hashlib.md5(payload.hex().encode()).digest()
    return np.uint64(int.from_bytes(digest[:8], "big"))


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → HxWx3 uint8. Pure numpy — no image libs.

    Header grammar (netpbm spec): ``P6``, then three ASCII integers
    (width, height, maxval) separated by whitespace, ``#`` comments
    allowed between tokens, one whitespace byte, then ``h*w*3`` raw bytes.
    """
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BI_RGB) → HxWx3 uint8. Pure numpy.

    Rows are 4-byte padded, stored bottom-up (positive height) in BGR
    order; both quirks are undone here.
    """
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        img = img[::-1]
    return img.copy()


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """payload → HxWx3 uint8 array.

    Real decoders (pure numpy, no external libs): binary PPM (``P6``) and
    uncompressed 24-bit BMP (``BM``). Compressed formats (JPEG/PNG/...)
    still raise ``NotImplementedError`` — this container ships no codec
    libs. ``fake=True`` keeps the deterministic content-hash decoder used
    by the SQL-twinned correctness oracles."""
    if fake:
        seed = _seed_from_payload(payload)
        idx = np.arange(_N_PIX * 3, dtype=np.uint64)
        vals = (_splitmix64(seed + idx) & np.uint64(255)).astype(np.uint8)
        return vals.reshape(IMG_H, IMG_W, 3)
    if payload[:2] == b"P6":
        return _decode_ppm(bytes(payload))
    if payload[:2] == b"BM":
        return _decode_bmp(bytes(payload))
    raise NotImplementedError(
        "compressed image formats require codec libraries not present in "
        "this container; supported real formats: PPM (P6), 24-bit BMP"
    )


FEATURE_COLS = ["mean_r", "mean_g", "mean_b"] + [f"h{b}" for b in range(HIST_BINS)]
FEATURES_SCHEMA = "media_id long, " + ", ".join(f"{c} double" for c in FEATURE_COLS)


def image_features(
    media: DataFrame, fake: bool = True, payload_col: str = "payload"
) -> DataFrame:
    """media_id → pooled features as SCALAR columns (mean RGB + 8-bin
    intensity histogram).

    Scalar columns (not array<float>) so downstream tabular tooling — and
    the driver's canonicalizer — can sort/hash them. The Spark-side
    contract is real: binary in, fixed-width features out, one Arrow batch
    at a time; swap the fake decoder for a real one and nothing changes.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {c: [] for c in FEATURE_COLS}
            for payload in pdf[payload_col]:
                img = decode_image(bytes(payload), fake=fake)
                flat = img.reshape(-1, 3).astype(np.int64)
                n_pix = flat.shape[0]  # == _N_PIX for the fake decoder
                for c, name in enumerate(FEATURE_COLS[:3]):
                    out[name].append(float(flat[:, c].sum()) / n_pix / 255.0)
                bins = np.minimum(flat.sum(axis=1) // _BIN_DIV, HIST_BINS - 1)
                counts = np.bincount(bins, minlength=HIST_BINS)
                for b in range(HIST_BINS):
                    out[f"h{b}"].append(float(counts[b]) / n_pix)
            yield pd.DataFrame({"media_id": pdf["media_id"], **out})

    return media.select("media_id", payload_col).mapInPandas(
        batch, schema=FEATURES_SCHEMA
    )


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    fake: bool = True,
    payload_col: str = "payload",
) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_idx, frame_hex).

    Frame extraction is faked (md5-derived frame ids); the explode shape —
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
                seed_hex = hashlib.md5(
                    bytes(payload).hex().encode()
                ).hexdigest()
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(
                        hashlib.md5(f"{seed_hex}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hex": frames}
            )

    return media.select("media_id", payload_col, "duration_ms").mapInPandas(
        batch, schema="media_id long, frame_idx int, frame_hex string"
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table, regenerable in pure SQL
    (sql_oracles.media_ctes): payload = 64 md5-chained bytes, metadata
    derived from media_id by closed-form arithmetic."""
    rows = []
    for i in range(n):
        payload_hex = "".join(
            hashlib.md5(f"media:{i}:{b}".encode()).hexdigest() for b in range(4)
        )
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(bytes.fromhex(payload_hex)),
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[
                    kind
                ],
                IMG_W,
                IMG_H,
                500 + (i * 3589) % 4500,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
