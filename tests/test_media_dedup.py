"""Perceptual media near-dup (``ops/media_dedup``, r13).

The load-bearing claims, each pinned:

1. ``dhash_bands`` is the classic 9x8 difference hash, integerized —
   verified against a hand-computed tiny case and against a direct
   numpy reimplementation on synthetic images.
2. The decode round-trip: hashing REAL encoded PPM bytes through the
   Arrow pipeline equals hashing the decoded arrays directly.
3. The pigeonhole recall guarantee: at max_distance <= 7 < 8 bands the
   banded candidate join finds EXACTLY the true all-pairs Hamming
   <= d set (brute-force ground truth in numpy).
4. Honest refusals: non-poolable dimensions and a too-large
   max_distance raise.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops import media_dedup as md
from data_integration_est_spark.ops.multimodal import decode_ppm


def _pix(group: int, variant: int, w: int = 18, h: int = 16) -> np.ndarray:
    raw = md.synth_ppm_variant(group, variant, w=w, h=h)
    return decode_ppm(raw)


def _brute_bands(pix: np.ndarray) -> np.ndarray:
    """Independent dHash reimplementation (flat loops, no reshape)."""
    h, w, c = pix.shape
    gray = pix.astype(np.int64).sum(axis=2)
    bh, bw = h // 8, w // 9
    blocks = np.zeros((8, 9), dtype=np.int64)
    for r in range(8):
        for cc in range(9):
            blocks[r, cc] = gray[
                r * bh:(r + 1) * bh, cc * bw:(cc + 1) * bw
            ].sum()
    bands = []
    for r in range(8):
        v = 0
        for cc in range(8):
            if blocks[r, cc] < blocks[r, cc + 1]:
                v |= 1 << cc
        bands.append(v)
    return np.array(bands)


def test_dhash_bands_matches_flat_reimplementation():
    for g, v in [(0, 0), (3, 2), (7, 4), (11, 1)]:
        pix = _pix(g, v)
        assert md.dhash_bands(pix) == list(_brute_bands(pix))


def test_dhash_bands_tiny_known_case():
    # 8 rows x 18 cols, single channel, strictly increasing left to
    # right: every horizontal gradient is positive -> all 8 bits set
    # in every band (grid 8x9 pools rows 1:1, cols 2:1)
    img = np.tile(np.arange(18, dtype=np.uint8), (8, 1))[:, :, None]
    assert md.dhash_bands(img) == [255] * 8
    # strictly decreasing -> no bits set
    img_rev = img[:, ::-1, :]
    assert md.dhash_bands(img_rev) == [0] * 8


def test_dhash_refuses_unpoolable_dimensions():
    with pytest.raises(NotImplementedError, match="does not pool"):
        md.dhash_bands(np.zeros((10, 10, 3), dtype=np.uint8))


def test_max_distance_must_respect_pigeonhole():
    with pytest.raises(ValueError, match="pigeonhole"):
        md.hamming_neardup_pairs(None, max_distance=8)


def test_decode_roundtrip_through_arrow_pipeline(spark):
    rows = [
        (g * 5 + v, bytearray(md.synth_ppm_variant(g, v)))
        for g in range(4) for v in range(5)
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {
        r["media_id"]: r["bands"]
        for r in md.dhash_images(df).collect()
    }
    for g in range(4):
        for v in range(5):
            assert got[g * 5 + v] == md.dhash_bands(_pix(g, v))


def test_banded_join_equals_bruteforce_at_pigeonhole_distance(spark):
    ids = [(g, v) for g in range(6) for v in range(5)]
    hashes = {g * 5 + v: _brute_bands(_pix(g, v)) for g, v in ids}

    def ham(a, b):
        return int(sum(bin(x ^ y).count("1")
                       for x, y in zip(hashes[a], hashes[b])))

    truth = {
        (a, b, ham(a, b))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if ham(a, b) <= 7
    }
    assert truth, "fixture produced no near-dup pairs"

    df = spark.createDataFrame(
        [(mid, [int(x) for x in bands]) for mid, bands in hashes.items()],
        "media_id long, bands array<int>",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in md.hamming_neardup_pairs(df, max_distance=7).collect()
    }
    assert got == truth


def test_null_and_undecodable_rows_get_null_bands(spark):
    rows = [
        (0, bytearray(md.synth_ppm_variant(0, 0))),
        (1, None),
        (2, bytearray(b"JFIF not a ppm")),
        # poolable refusal: 10x10 P6 (wrong grid) -> NULL, not a crash
        (3, bytearray(b"P6\n10 10\n255\n" + bytes(300))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r["bands"] for r in md.dhash_images(df).collect()}
    assert got[0] is not None
    assert got[1] is None and got[2] is None and got[3] is None


def test_wide_bands_equal_bruteforce_at_their_distance(spark):
    """n_bands=4 (16-bit values) guarantees recall to distance 3 by the
    same pigeonhole; the found set must equal brute force at d <= 3."""
    ids = [(g, v) for g in range(6) for v in range(5)]
    hashes = {g * 5 + v: _brute_bands(_pix(g, v)) for g, v in ids}

    def ham(a, b):
        return int(sum(bin(x ^ y).count("1")
                       for x, y in zip(hashes[a], hashes[b])))

    truth = {
        (a, b, ham(a, b))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if ham(a, b) <= 3
    }
    df = spark.createDataFrame(
        [(mid, [int(x) for x in bands]) for mid, bands in hashes.items()],
        "media_id long, bands array<int>",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in md.hamming_neardup_pairs(
            df, max_distance=3, n_bands=4
        ).collect()
    }
    assert got == truth
    assert truth, "fixture produced no d<=3 pairs"


def test_max_pairs_refusal_names_the_band_knob(spark):
    rows = [(g * 5 + v, [int(x) for x in _brute_bands(_pix(g, v))])
            for g in range(6) for v in range(5)]
    df = spark.createDataFrame(rows, "media_id long, bands array<int>")
    with pytest.raises(ValueError, match="wider bands"):
        md.hamming_neardup_pairs(df, max_distance=7, max_pairs=1).count()


def test_collapsed_stats_equal_perpair_aggregation(spark):
    """hamming_neardup_stats (exact-collapse-first) must equal the
    per-pair path aggregated — including distance-0 mass from groups of
    identical hashes (duplicated rows planted deliberately)."""
    ids = [(g, v) for g in range(5) for v in range(5)]
    hashes = {g * 5 + v: _brute_bands(_pix(g, v)) for g, v in ids}
    # plant exact duplicates: 3 extra copies of image 0's hash
    for extra in (100, 101, 102):
        hashes[extra] = hashes[0]
    df = spark.createDataFrame(
        [(mid, [int(x) for x in bands]) for mid, bands in hashes.items()],
        "media_id long, bands array<int>",
    )
    per_pair = md.hamming_neardup_pairs(df, max_distance=7).collect()
    want = {}
    for r in per_pair:
        n, s = want.get(r["hamming"], (0, 0))
        want[r["hamming"]] = (n + 1, s + r["id_a"] + r["id_b"])
    got = {
        r["hamming"]: (r["n_pairs"], r["id_sum"])
        for r in md.hamming_neardup_stats(df, max_distance=7).collect()
    }
    assert got == want
    assert want.get(0, (0, 0))[0] >= 6  # C(4,2) from the planted dups


def test_media_dedup_corpus_wiring(spark):
    """r15: the one-call composition must equal the primitives wired by
    hand — exact md5 collapse, per-modality pairs, min-id components —
    and unknown kinds must survive untouched."""
    rows = []
    # images: 2 groups x 3 variants (ids 0..5) + exact copy of (0,0)
    for i, (g, v) in enumerate([(0, 0), (0, 1), (0, 2),
                                (1, 0), (1, 1), (1, 2)]):
        rows.append((i, "image", md.synth_ppm_variant(g, v)))
    rows.append((6, "image", md.synth_ppm_variant(0, 0)))  # exact dup of 0
    # videos: 2-frame streams, two videos per group sharing a frame
    for i, (g, b) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        rows.append((
            10 + i, "video",
            b"".join(md.synth_ppm_variant(g, (b + f) % 5)
                     for f in range(2)),
        ))
    # audios: two variants per group (shared base windows) + exact copy
    for i, (g, v) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        rows.append((20 + i, "audio", md.synth_wav_variant(g, v)))
    rows.append((24, "audio", md.synth_wav_variant(0, 0)))  # dup of 20
    # an unknown kind: must pass through
    rows.append((30, "blob", b"opaque-bytes"))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, content binary"
    )

    kept = sorted(
        r["media_id"]
        for r in md.media_dedup_corpus(media, frame_every_n=1).collect()
    )

    # hand-wired expectation from the primitives
    import hashlib

    seen, work = set(), []
    for mid, kind, content in sorted(rows):
        fp = hashlib.md5(content).hexdigest()
        if fp in seen:
            continue
        seen.add(fp)
        work.append((mid, kind, content))
    wdf = spark.createDataFrame(
        work, "media_id long, kind string, content binary"
    )
    img = md.hamming_neardup_pairs(
        md.dhash_images(wdf.filter(F.col("kind") == "image"))
    ).collect()
    vid = md.hamming_neardup_pairs(
        md.dhash_frames(wdf.filter(F.col("kind") == "video"), every_n=1)
    ).collect()
    afp = md.wav_window_fingerprints(
        wdf.filter(F.col("kind") == "audio")
    ).toPandas()
    from collections import Counter

    shared = Counter()
    cells = {}
    for _, r in afp.iterrows():
        cells.setdefault((r["win_idx"], r["fp"]), []).append(int(r["media_id"]))
    for members in cells.values():
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                shared[(ms[i], ms[j])] += 1
    pairs = (
        [(r["id_a"], r["id_b"]) for r in img]
        + [(r["id_a"], r["id_b"]) for r in vid]
        + [p for p, c in shared.items() if c >= 2]
    )
    parent = {m: m for m, _, _ in work}
    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = sorted(m for m, _, _ in work if find(m) == m)

    assert kept == expect
    assert 30 in kept          # unknown kind untouched
    assert 6 not in kept       # exact image dup dropped
    assert 24 not in kept      # exact audio dup dropped
