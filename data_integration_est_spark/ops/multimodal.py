"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery — schemas, Arrow-batched ``mapInPandas``
pipelines, partition sizing — is real and tested, and so is a minimal
REAL decode layer for uncompressed formats, implemented in pure
numpy/stdlib (this environment has no image/audio libraries):

  - PPM (P6) / PGM (P5) binary images
  - BMP (24-bit uncompressed, bottom-up)
  - WAV (RIFF, 16-bit PCM)

Compressed codecs (JPEG/PNG/MP3/H.264...) still raise
``NotImplementedError`` — honest about the environment — and the
hash-derived ``fake=True`` path remains for plumbing tests.

Design for 100 TB: media bytes stay in executor memory only for the
duration of one Arrow batch; metadata/features (tiny) flow on; batch size
is bounded with ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs cannot OOM an executor.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("content", BinaryType(), True),       # opaque encoded bytes
    StructField("mime", StringType(), True),
    StructField("width", IntegerType(), True),        # typed metadata
    StructField("height", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("feature", ArrayType(DoubleType()), True),
])


def decode_ppm(content: bytes) -> np.ndarray:
    """Decode binary PPM (P6) / PGM (P5) into a (h, w, c) uint8 array.
    Pure stdlib/numpy header parse — handles whitespace and # comments."""
    if content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM (P6/P5) stream")
    channels = 3 if content[:2] == b"P6" else 1
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = w * h * channels
    pix = np.frombuffer(content, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(h, w, channels)


def decode_bmp(content: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit bottom-up BMP into (h, w, 3) uint8
    (RGB order)."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack_from("<I", content, 10)[0]
    w = struct.unpack_from("<i", content, 18)[0]
    h = struct.unpack_from("<i", content, 22)[0]
    _planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((abs(h), w, 3), dtype=np.uint8)
    for r in range(abs(h)):
        src = data_off + r * row_bytes
        row = np.frombuffer(content, dtype=np.uint8, count=w * 3, offset=src).reshape(w, 3)
        # BMP stores BGR bottom-up (when h > 0)
        dst = abs(h) - 1 - r if h > 0 else r
        out[dst] = row[:, ::-1]
    return out


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE 16-bit PCM stream.  Returns (sample_rate,
    n_channels, samples[int16, shape (n, channels)])."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"only 16-bit PCM WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, n_ch, samples.reshape(-1, n_ch)


def _image_feature(pix: np.ndarray, dim: int) -> list[float]:
    """Real image features: dims, moments, extremes + an 8-bin luminance
    histogram, padded/truncated to ``dim``."""
    h, w, c = pix.shape
    flat = pix.astype(np.float64)
    lum = flat.mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    hist = hist / max(lum.size, 1)
    feat = [float(w), float(h), float(c), float(flat.mean()), float(flat.std()),
            float(flat.min()), float(flat.max()), float(lum.mean())] + [float(v) for v in hist]
    return (feat + [0.0] * dim)[:dim]


def _audio_feature(rate: int, n_ch: int, samples: np.ndarray, dim: int) -> list[float]:
    """Real audio features: rate/shape, moments, RMS, zero-crossing rate."""
    x = samples.astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if mono.size > 1 else 0.0
    feat = [float(rate), float(n_ch), float(len(mono)), float(mono.mean()),
            float(np.sqrt((mono ** 2).mean())) if mono.size else 0.0,
            float(mono.min()) if mono.size else 0.0,
            float(mono.max()) if mono.size else 0.0, zc]
    return (feat + [0.0] * dim)[:dim]


def synth_ppm(media_id: int, w: int = 8, h: int = 6) -> bytes:
    """Deterministic REAL PPM blob: pixel j (row-major, interleaved RGB)
    has value (media_id*31 + j) % 256 — closed-form moments, so decode
    output is SQL-oracle-checkable."""
    header = f"P6\n{w} {h}\n255\n".encode()
    n = w * h * 3
    return header + bytes((media_id * 31 + j) % 256 for j in range(n))


def synth_wav(media_id: int, n: int = 64, rate: int = 8000) -> bytes:
    """Deterministic REAL mono 16-bit PCM WAV: sample i is
    ((media_id*7 + i*13) % 2001) - 1000 — closed-form moments."""
    data = b"".join(
        struct.pack("<h", ((media_id * 7 + i * 13) % 2001) - 1000) for i in range(n)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_feature(content: bytes | None, dim: int) -> list[float] | None:
    """Dispatch on magic bytes to the real decoders.  Unsupported codecs
    raise NotImplementedError (JPEG/PNG/compressed audio)."""
    if content is None:
        return None
    if content[:2] in (b"P6", b"P5"):
        return _image_feature(decode_ppm(content), dim)
    if content[:2] == b"BM":
        return _image_feature(decode_bmp(content), dim)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return _audio_feature(*decode_wav(content), dim)
    raise NotImplementedError(
        "unsupported media codec (only PPM/PGM/BMP/16-bit-PCM WAV decode in "
        "this environment; JPEG/PNG/MP3/video codecs need external libraries)"
    )


def _fake_feature(content: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    the blob's sha256, scaled to [0,1).  NOT a real decoder."""
    if content is None:
        return [0.0] * dim
    h = hashlib.sha256(content).digest()
    raw = (h * (dim // len(h) + 1))[:dim]
    return [b / 256.0 for b in raw]


def extract_features(
    df: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched ``mapInPandas``.

    The real path decodes PPM/PGM/BMP/PCM-WAV with the pure-numpy parsers
    above (other codecs raise ``NotImplementedError`` — no media libs in
    this environment); ``fake=True`` substitutes the deterministic
    hash-derived feature, exercising identical plumbing."""
    featurize = _fake_feature if fake else decode_feature

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "feature": pdf["content"].map(lambda b: featurize(b, dim)),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def _ppm_frame_end(content: bytes, off: int) -> int:
    """End offset of the P6/P5 frame starting at ``off`` in a
    concatenated multi-frame PPM stream (header whitespace/# comments
    handled exactly like ``decode_ppm``)."""
    magic = content[off : off + 2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM frame at offset {off}")
    channels = 3 if magic == b"P6" else 1
    pos = off + 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    end = pos + w * h * channels
    if end > len(content):
        raise ValueError(
            f"truncated PPM frame at offset {off}: header promises "
            f"{w}x{h}x{channels} bytes past the stream end"
        )
    return end


def split_ppm_stream(content: bytes) -> list[bytes]:
    """Split a concatenated multi-frame binary PPM/PGM stream (the
    uncompressed 'video' container this environment CAN decode — P6/P5
    frames back to back, each self-describing via its header) into
    per-frame blobs.  Executed frame EXTRACTION (r14), upgrading the
    decode-free ``sample_frames`` plan: each returned blob feeds
    ``decode_ppm`` / ``media_dedup.dhash_bands`` unchanged."""
    frames: list[bytes] = []
    off = 0
    while off < len(content):
        end = _ppm_frame_end(content, off)
        frames.append(content[off:end])
        off = end
    return frames


def wav_windows(
    content: bytes, window_ms: int = 250, hop_ms: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Fixed-length PCM windows from a RIFF/WAV blob — the audio
    analogue of frame sampling (r14): (start_ms, samples[int16,
    (n, channels)]) tuples, hop defaulting to the window (no overlap).
    The trailing partial window is kept (real pipelines score it too);
    an empty data chunk yields no windows."""
    rate, n_ch, samples = decode_wav(content)
    if hop_ms is None:
        hop_ms = window_ms
    win = max(1, rate * window_ms // 1000)
    hop = max(1, rate * hop_ms // 1000)
    out: list[tuple[int, np.ndarray]] = []
    for start in range(0, len(samples), hop):
        chunk = samples[start : start + win]
        if chunk.size == 0:
            break
        out.append((start * 1000 // rate, chunk))
    return out


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    pairs from the typed metadata WITHOUT decoding — pure Column exprs, so
    the expensive decode fan-out can be scheduled independently."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
