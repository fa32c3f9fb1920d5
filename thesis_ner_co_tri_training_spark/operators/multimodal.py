"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Decode is REAL for every format decodable without native libraries —
P6 PPM and 24-bit uncompressed BMP images (`decode_image`, numpy) and
RIFF/WAVE PCM audio (`_decode_wav`, struct+numpy) — with
nearest-neighbor resize + grid-pooled features for images and windowed
RMS energy for audio. Compressed formats (PNG/JPEG, MP3, any video)
would need libjpeg/ffmpeg, which this container does not have: those
payloads raise NotImplementedError, which extract_features records
per-row (`decode_error`) while emitting a deterministic fallback
feature vector, so the distributed shape is identical either way.

Pattern at scale: binary payloads ride in their own column so Parquet
column pruning skips them unless the stage actually decodes; decode
stages run mapInPandas with small maxRecordsPerBatch (payloads are MBs,
not rows); metadata-only stages never touch the bytes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "mime string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, feat array<float>, feat_dim int, "
    "decode_error string"
)


def _decode_ppm(payload: bytes) -> np.ndarray:
    """P6 (binary) PPM -> float32 (h, w, 3) in [0, 1]."""
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (comments start with '#'); pixel data follows the single whitespace
    # after maxval.
    pos, tokens = 0, []
    while len(tokens) < 4:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    if tokens[0] != b"P6":
        raise ValueError(f"not a P6 ppm: {tokens[0]!r}")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    # Degenerate headers must route to decode_error, not slip through:
    # w/h <= 0 yields an empty array whose feature means are NaN (with
    # decode_error null!), maxval <= 0 divides by zero, and maxval >
    # 255 means 2-byte samples per the P6 spec — reading those as uint8
    # is silent garbage.
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise ValueError(
            f"unsupported PPM maxval {maxval} (only 1-byte samples)")
    pos += 1  # single whitespace after maxval
    if len(payload) - pos < w * h * 3:
        raise ValueError(
            f"truncated PPM payload: need {w * h * 3} bytes, "
            f"have {len(payload) - pos}")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).astype(np.float32) / float(maxval)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> float32 (h, w, 3) RGB in [0, 1]."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24bpp uncompressed BMP decodes natively (bpp={bpp}, "
            f"compression={compression})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].astype(np.float32) / 255.0  # BGR -> RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Binary image -> float32 (h, w, 3) in [0, 1].

    Real for P6 PPM and 24-bit BMP (pure numpy — no native codecs).
    Compressed formats raise NotImplementedError (libjpeg/PIL are not in
    this container); extract_features records that per row and falls back
    to deterministic fake features so the pipeline shape is unchanged.
    """
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "only PPM/BMP decode without native codecs (PNG/JPEG need libjpeg)")


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (float32 samples in [-1, 1] shape (n, channels),
    sample_rate). Pure struct+numpy: WAV PCM is uncompressed, so unlike
    JPEG/MP3 it is honestly decodable without native codecs. Supports
    8-bit unsigned and 16-bit signed PCM (format tag 1)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            # a declared chunk size past the payload end means the file
            # was truncated/corrupted; a silent Python-slice cut would
            # compute features from partial audio — route to decode_error
            raise ValueError(
                f"wav chunk {cid!r} declares {size} bytes but only "
                f"{len(payload) - pos - 8} remain (truncated payload)")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"only PCM wav (format 1), got format {audio_format}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported PCM width {bits}")
    if channels < 1:
        raise ValueError("wav with zero channels")
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), sample_rate


def audio_features(samples: np.ndarray, dim: int = 8) -> list[float]:
    """Windowed RMS energy: the mono mix split into `dim` equal windows,
    one root-mean-square per window — the audio analog of the image
    grid pool (dim floats in [0, 1])."""
    mono = samples.mean(axis=1)
    n = len(mono)
    out = []
    for i in range(dim):
        lo = (i * n) // dim
        hi = max(((i + 1) * n) // dim, lo + 1)
        seg = mono[lo:hi] if lo < n else np.zeros(1, np.float32)
        out.append(float(np.sqrt(np.mean(seg * seg))))
    return out


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure index arithmetic."""
    idx_r = (np.arange(out_h) * img.shape[0]) // out_h
    idx_c = (np.arange(out_w) * img.shape[1]) // out_w
    return img[idx_r][:, idx_c]


def image_features(img: np.ndarray, dim: int = 8) -> list[float]:
    """Grid-pooled grayscale features: resize to (1 x dim) cells by
    nearest neighbor of the cell means — dim floats in [0, 1]."""
    gray = img.mean(axis=2)
    cells = []
    for i in range(dim):
        lo = (i * gray.shape[1]) // dim
        hi = max(((i + 1) * gray.shape[1]) // dim, lo + 1)
        cells.append(float(gray[:, lo:hi].mean()))
    return cells


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in features for undecodable payloads:
    md5-seeded floats in [0,1)."""
    h = hashlib.md5(payload or b"").digest()
    out = []
    for i in range(dim):
        h = hashlib.md5(h + bytes([i])).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**32)
    return out


def extract_features(media: DataFrame, dim: int = 8,
                     batch_rows: int = 64) -> DataFrame:
    """Binary payload -> feature vector, Arrow-batched.

    Decodes PPM/BMP for real (decode_error = null); any other payload
    records the error and emits the deterministic fake (keeps downstream
    shape identical). Small batches: payloads dominate memory, not rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                try:
                    if raw[:4] == b"RIFF":
                        feats.append(
                            audio_features(_decode_wav(raw)[0], dim))
                    else:
                        feats.append(
                            image_features(decode_image(raw), dim))
                    errs.append(None)
                # struct.error covers truncated BMP headers (struct.error
                # is a direct Exception subclass, NOT a ValueError): a
                # short b"BM..." payload must record decode_error, not
                # kill the task.
                except (NotImplementedError, ValueError, IndexError,
                        struct.error) as e:
                    feats.append(_fake_features(raw, dim))
                    errs.append(str(e))
            if len(pdf):
                # zero-row chunks yield nothing (empty float64 columns
                # don't Arrow-convert to array<float>)
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "feat_dim": [dim] * len(pdf),
                    "decode_error": errs,
                })

    src = media.repartition(max(media.sparkSession.sparkContext.defaultParallelism, 4))
    return src.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def gen_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic P6 test image: seeded gradient pattern."""
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)[:, None]
    r = ((x * 16 + seed) % 256).astype(np.uint8) + np.zeros((height, width), np.uint8)
    g = ((y * 21 + 2 * seed) % 256).astype(np.uint8) + np.zeros((height, width), np.uint8)
    b = ((x + y + seed) % 256).astype(np.uint8)
    img = np.stack([r, g, np.broadcast_to(b, (height, width))], axis=2)
    return b"P6\n%d %d\n255\n" % (width, height) + img.tobytes()


def gen_wav(n_samples: int = 800, sample_rate: int = 8000,
            seed: int = 0) -> bytes:
    """Deterministic 16-bit PCM mono WAV: seeded sine burst."""
    t = np.arange(n_samples, dtype=np.float64)
    freq = 220.0 + 55.0 * (seed % 8)
    x = np.sin(2 * np.pi * freq * t / sample_rate) * 0.5
    pcm = (x * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def gen_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests: real PPM payloads for image
    rows and real PCM WAV payloads for audio rows (both exercising true
    decode paths); opaque seeded bytes for video (exercising the
    recorded-error fallback path — no ffmpeg in this container)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            payload = gen_ppm(16, 12, seed=i)
            mime = "image/x-portable-pixmap"
        elif kind == "audio":
            payload = gen_wav(seed=i)
            mime = "audio/wav"
        else:
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
            mime = f"application/x-fake-{kind}"
        rows.append((i, kind, bytearray(payload), mime, 16, 12, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: rows (media_id, frame_ts_ms) without
    decoding — pure sequence explode, JVM-side. The decode of each frame
    would be a second extract_features pass."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
