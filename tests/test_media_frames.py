"""Executed media frame extraction (r14 — upgrading the decode-free
``sample_frames`` plan): multi-frame PPM stream splitting, PCM-WAV
windowing, and the frame-sampled dHash pipeline feeding the
Hamming-band near-dup path."""

from __future__ import annotations

import numpy as np
import pytest

from data_integration_est_spark.ops import media_dedup as md
from data_integration_est_spark.ops import multimodal as mm


def test_split_ppm_stream_roundtrip():
    frames = [mm.synth_ppm(i, w=9, h=8) for i in range(5)]
    stream = b"".join(frames)
    out = mm.split_ppm_stream(stream)
    assert out == frames
    # each recovered frame decodes identically to the original
    for f, o in zip(frames, out):
        assert np.array_equal(mm.decode_ppm(f), mm.decode_ppm(o))


def test_split_ppm_stream_mixed_sizes_and_pgm():
    a = mm.synth_ppm(1, w=9, h=8)
    b = b"P5\n4 2\n255\n" + bytes(range(8))
    c = mm.synth_ppm(2, w=18, h=16)
    assert mm.split_ppm_stream(a + b + c) == [a, b, c]


def test_split_ppm_stream_truncated_raises():
    good = mm.synth_ppm(3, w=9, h=8)
    with pytest.raises(ValueError, match="truncated"):
        mm.split_ppm_stream(good + good[:-10])
    with pytest.raises(ValueError, match="offset"):
        mm.split_ppm_stream(good + b"JUNK")


def test_wav_windows_cover_all_samples_without_overlap():
    blob = mm.synth_wav(7, n=64, rate=8000)
    wins = mm.wav_windows(blob, window_ms=2)  # 16 samples per window
    assert [w[0] for w in wins] == [0, 2, 4, 6]
    rate, n_ch, samples = mm.decode_wav(blob)
    got = np.concatenate([w[1] for w in wins])
    assert np.array_equal(got, samples)


def test_wav_windows_hop_overlap_and_trailing_partial():
    blob = mm.synth_wav(9, n=40, rate=8000)
    wins = mm.wav_windows(blob, window_ms=2, hop_ms=1)  # win 16, hop 8
    assert [w[0] for w in wins] == [0, 1, 2, 3, 4]
    assert [len(w[1]) for w in wins] == [16, 16, 16, 16, 8]


def test_dhash_frames_samples_every_nth_and_matches_image_hash(spark):
    frames = [md.synth_ppm_variant(2, v) for v in range(4)]
    df = spark.createDataFrame(
        [(1, bytearray(b"".join(frames)))], "media_id long, content binary"
    )
    out = {(r["frame_idx"]): r["bands"]
           for r in md.dhash_frames(df, every_n=2).collect()}
    assert set(out) == {0, 2}
    for fi in (0, 2):
        pix = mm.decode_ppm(frames[fi])
        assert out[fi] == md.dhash_bands(pix)


def test_dhash_frames_refusal_rows(spark):
    good = md.synth_ppm_variant(0, 0)
    df = spark.createDataFrame(
        [(1, bytearray(b"NOTAPPM")), (2, bytearray(good))],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in md.dhash_frames(df).collect()}
    assert rows[1]["frame_idx"] == -1 and rows[1]["bands"] is None
    assert rows[2]["frame_idx"] == 0 and rows[2]["bands"] is not None


def test_frame_neardup_pipeline_exact_dups_across_videos(spark):
    # two videos sharing variants -> sampled frames are exact dups
    v0 = b"".join(md.synth_ppm_variant(5, (0 + f) % 5) for f in range(4))
    v1 = b"".join(md.synth_ppm_variant(5, (2 + f) % 5) for f in range(4))
    df = spark.createDataFrame(
        [(0, bytearray(v0)), (1, bytearray(v1))],
        "media_id long, content binary",
    )
    from pyspark.sql import functions as F

    frames = md.dhash_frames(df, every_n=2)
    hashes = frames.select(
        (F.col("media_id") * 4 + F.col("frame_idx")).alias("media_id"),
        "bands",
    )
    stats = {r["hamming"]: r["n_pairs"]
             for r in md.hamming_neardup_stats(hashes, max_distance=7).collect()}
    # expected distances computed locally from the same decoders: the
    # sampled frames are (video, frame) -> variant {0:{0,2}, 1:{2,4}};
    # variants may collide to identical hashes (sparse perturbation)
    import itertools

    local = {}
    for vid, base in ((0, 0), (1, 2)):
        for fi in (0, 2):
            blob = md.synth_ppm_variant(5, (base + fi) % 5)
            local[(vid, fi)] = md.dhash_bands(mm.decode_ppm(blob))
    expect: dict[int, int] = {}
    for a, b in itertools.combinations(sorted(local), 2):
        d = sum(bin(x ^ y).count("1") for x, y in zip(local[a], local[b]))
        if d <= 7:
            expect[d] = expect.get(d, 0) + 1
    assert stats == expect and expect.get(0, 0) >= 1


def test_wav_window_fingerprints_match_direct_formula(spark):
    blob = md.synth_wav_variant(3, 1)
    df = spark.createDataFrame(
        [(9, bytearray(blob))], "media_id long, content binary"
    )
    rows = {r["win_idx"]: r["fp"]
            for r in md.wav_window_fingerprints(df, window_ms=2).collect()}
    # direct closed-form replay (the SQL oracle's formula)
    expect = {}
    for i in range(64):
        s = ((3 * 7 + i * 13) % 2001) - 1000 + (50 if i % 37 == 0 else 0)
        w = i // 16
        expect[w] = expect.get(w, 0) + (s + 1000) * (i % 16 + 1)
    assert rows == expect


def test_wav_window_fingerprints_refusal_row(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"NOTAWAV")), (2, bytearray(md.synth_wav_variant(0, 0)))],
        "media_id long, content binary",
    )
    out = md.wav_window_fingerprints(df).collect()
    bad = [r for r in out if r["media_id"] == 1]
    good = [r for r in out if r["media_id"] == 2]
    assert len(bad) == 1 and bad[0]["win_idx"] == -1 and bad[0]["fp"] is None
    assert len(good) == 4 and all(r["fp"] is not None for r in good)


def test_audio_variants_share_unperturbed_windows():
    # variants of one group fingerprint identically on windows without
    # a perturbed position (i % 37 == 0 hits windows 0 and 2 only)
    import numpy as np

    from data_integration_est_spark.ops.multimodal import wav_windows

    def fps(v):
        wins = wav_windows(md.synth_wav_variant(5, v), window_ms=2)
        return [int(((w[:, 0].astype(np.int64) + 1000)
                     * np.arange(1, len(w) + 1)).sum()) for _, w in wins]

    f0, f1 = fps(0), fps(1)
    assert f0[1] == f1[1] and f0[3] == f1[3]   # shared windows
    assert f0[0] != f1[0] and f0[2] != f1[2]   # perturbed windows
