"""Real media decode (PPM/PGM/BMP/PCM-WAV) + the Arrow mapInPandas
feature pipeline.  The decoders are pure numpy/stdlib; correctness is
pinned against directly-constructed arrays (and, at the gate, against
DuckDB recomputing the closed-form moments of the synthetic blobs —
``media_decode_features``)."""

import struct

import numpy as np
import pytest

from data_integration_est_spark.ops import multimodal as mm


def test_ppm_roundtrip():
    pix = mm.decode_ppm(mm.synth_ppm(3, w=8, h=6))
    assert pix.shape == (6, 8, 3)
    expect = np.array([(3 * 31 + j) % 256 for j in range(144)],
                      dtype=np.uint8).reshape(6, 8, 3)
    assert (pix == expect).all()


def test_ppm_comments_and_pgm():
    blob = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    pix = mm.decode_ppm(blob)
    assert pix.shape == (2, 4, 1)
    assert pix.ravel().tolist() == list(range(8))


def test_bmp_decode():
    # 3x2 24-bit bottom-up BMP, one padded row (3*3=9 -> 12 bytes/row)
    w, h = 3, 2
    rows = [
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],   # top row (stored last)
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],            # bottom row (stored first)
    ]
    row_bytes = (w * 3 + 3) & ~3
    data = b""
    for r in reversed(rows):  # bottom-up storage
        line = b"".join(bytes((b, g, rr)) for (rr, g, b) in r)
        data += line + b"\x00" * (row_bytes - len(line))
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    pix = mm.decode_bmp(header + info + data)
    assert pix.shape == (2, 3, 3)
    assert pix[0].tolist() == [list(t) for t in rows[0]]
    assert pix[1].tolist() == [list(t) for t in rows[1]]


def test_wav_roundtrip():
    rate, n_ch, samples = mm.decode_wav(mm.synth_wav(5, n=64, rate=8000))
    assert (rate, n_ch) == (8000, 1)
    expect = np.array([((5 * 7 + i * 13) % 2001) - 1000 for i in range(64)],
                      dtype=np.int16)
    assert (samples.ravel() == expect).all()


def test_unsupported_codec_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_feature(b"\xff\xd8\xff\xe0JFIF-like", 16)  # JPEG magic


def test_extract_features_real_decode(spark):
    rows = [
        (0, "image", bytearray(mm.synth_ppm(0)), "image/x-portable-pixmap", 8, 6, None),
        (1, "audio", bytearray(mm.synth_wav(1)), "audio/wav", None, None, 8),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in mm.extract_features(df, dim=16).collect()}
    img = out[0]["feature"]
    expect_mean = np.mean([(0 * 31 + j) % 256 for j in range(144)])
    assert img[0:3] == [8.0, 6.0, 3.0]
    assert abs(img[3] - expect_mean) < 1e-9
    aud = out[1]["feature"]
    s = np.array([((1 * 7 + i * 13) % 2001) - 1000 for i in range(64)]) / 32768.0
    assert aud[0:3] == [8000.0, 1.0, 64.0]
    assert abs(aud[3] - s.mean()) < 1e-9
    assert abs(aud[4] - np.sqrt((s ** 2).mean())) < 1e-9
