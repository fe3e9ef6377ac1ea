"""Perceptual near-duplicate detection for decodable media (r13).

Image-level dedup via difference hash (dHash) + Hamming-band LSH — the
one LLM-pipeline dedup family the engine lacked (documents/embeddings
near-dup existed; image near-dup stopped at featurization).  Reference
parity: the reference repo has no media dedup at all; this extends the
LLM-training-pipeline surface the build brief mandates, reusing the
banded-LSH discipline of ``ops/dedup`` (simhash) on the REAL
pure-numpy decoders in ``ops/multimodal``.

Design for 100 TB:

- hashing is Arrow-batched ``mapInPandas`` (media bytes live only for
  one batch; 8 small ints flow on);
- the candidate join is a band-value equi-join — all-pairs NEVER
  materializes, the same rule every other near-dup path follows;
- recall is EXACT by pigeonhole, not probabilistic: a 64-bit dHash
  split into ``n_bands=8`` row-bands means any pair within Hamming
  distance ``d <= 7 < n_bands`` has at least one identical band (d
  differing bits touch at most d bands), so the banded candidate set
  provably contains every true pair.  The verify step then computes
  exact Hamming distance on candidates only.

dHash definition used (classic 9x8 difference hash, integerized):

- grayscale = per-pixel CHANNEL SUM (not mean — exact integers);
- the image is average-pooled onto an 8-row x 9-column grid by exact
  block sums (requires width % 9 == 0 and height % 8 == 0 — this
  container has no interpolation library, and exact block sums make
  the hash replayable bit-for-bit in a SQL oracle);
- bit(r, c) = 1 iff blocksum(r, c) < blocksum(r, c + 1), giving 8 bits
  per row; band r = the row's byte.  All comparisons are on integers,
  so Spark and any reimplementation agree exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StructField, StructType,
)

from data_integration_est_spark.ops.multimodal import (
    decode_bmp, decode_ppm,
)

GRID_ROWS = 8
GRID_COLS = 9  # 9 columns -> 8 horizontal differences per row

DHASH_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("bands", ArrayType(IntegerType()), True),
])


def dhash_bands(pix: np.ndarray) -> list[int]:
    """The 8 row-band bytes of the integerized 9x8 dHash of one decoded
    image (h, w, c) uint8 array.  Raises ``NotImplementedError`` when
    the dimensions don't pool exactly onto the 8x9 grid (no
    interpolation library in this environment — honest refusal, same
    convention as the compressed-codec decoders)."""
    h, w = pix.shape[0], pix.shape[1]
    if h % GRID_ROWS or w % GRID_COLS:
        raise NotImplementedError(
            f"dhash_bands: image {w}x{h} does not pool exactly onto the "
            f"{GRID_COLS}x{GRID_ROWS} grid (need width % {GRID_COLS} == 0 "
            f"and height % {GRID_ROWS} == 0); resampling needs an image "
            "library this environment does not have"
        )
    gray = pix.astype(np.int64).sum(axis=2)  # channel SUM — exact ints
    bh, bw = h // GRID_ROWS, w // GRID_COLS
    blocks = gray.reshape(GRID_ROWS, bh, GRID_COLS, bw).sum(axis=(1, 3))
    bits = blocks[:, :-1] < blocks[:, 1:]  # (8, 8) horizontal gradients
    weights = 1 << np.arange(GRID_COLS - 1)
    return [int(v) for v in (bits * weights).sum(axis=1)]


def dhash_images(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Arrow-batched dHash over a binary image column (PPM/PGM/BMP via
    the real ``ops/multimodal`` decoders).  Returns (media_id, bands)
    with ``bands`` = the 8 row-band bytes; undecodable/unpoolable rows
    get NULL bands (kept, so callers can count refusals)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_ids, out_bands = [], []
            for mid, content in zip(b[id_col], b[content_col]):
                bands = None
                if content is not None:
                    raw = bytes(content)
                    try:
                        if raw[:2] in (b"P6", b"P5"):
                            pix = decode_ppm(raw)
                        elif raw[:2] == b"BM":
                            pix = decode_bmp(raw)
                        else:
                            pix = None
                        if pix is not None:
                            if pix.ndim == 2:
                                pix = pix[:, :, None]
                            bands = dhash_bands(pix)
                    except (NotImplementedError, ValueError):
                        bands = None
                out_ids.append(mid)
                out_bands.append(bands)
            yield pd.DataFrame({"media_id": out_ids, "bands": out_bands})

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(run, DHASH_SCHEMA)


FRAME_DHASH_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("bands", ArrayType(IntegerType()), True),
])


def dhash_frames(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    every_n: int = 1,
) -> DataFrame:
    """Frame-sampled dHash over multi-frame PPM streams (r14: executed
    frame extraction, upgrading the metadata-only ``sample_frames``
    plan).  One Arrow-batched ``mapInPandas`` pass splits each stream
    (``multimodal.split_ppm_stream``), keeps every ``every_n``-th frame
    (indices 0, every_n, 2·every_n, ...), and dHashes it — stream bytes
    live only for one batch; (media_id, frame_idx, 8 band ints) flow
    on.  Undecodable streams emit ONE null-bands row at frame_idx -1 so
    callers can count refusals; unpoolable frames emit null bands at
    their index.  The per-frame ids feed ``hamming_neardup_stats`` for
    cross-media near-dup exactly like image ids do."""
    from data_integration_est_spark.ops.multimodal import split_ppm_stream

    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids: list[int] = []
            idxs: list[int] = []
            bands_out: list[list[int] | None] = []
            for mid, content in zip(b[id_col], b[content_col]):
                if content is None:
                    continue
                raw = bytes(content)
                try:
                    frames = split_ppm_stream(raw)
                except (NotImplementedError, ValueError):
                    ids.append(mid)
                    idxs.append(-1)
                    bands_out.append(None)
                    continue
                for fi in range(0, len(frames), every_n):
                    bands = None
                    try:
                        pix = decode_ppm(frames[fi])
                        if pix.ndim == 2:
                            pix = pix[:, :, None]
                        bands = dhash_bands(pix)
                    except (NotImplementedError, ValueError):
                        bands = None
                    ids.append(mid)
                    idxs.append(fi)
                    bands_out.append(bands)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "bands": bands_out}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(run, FRAME_DHASH_SCHEMA)


def hamming_neardup_pairs(
    hashes: DataFrame,
    max_distance: int = 7,
    id_col: str = "media_id",
    bands_col: str = "bands",
    n_bands: int = 8,
    max_pairs: int | None = 20_000_000,
) -> DataFrame:
    """Near-duplicate image pairs within ``max_distance`` Hamming bits,
    via the band-value equi-join.  With ``max_distance < n_bands``
    recall is EXACTLY 1 by pigeonhole — the banded candidate set is a
    lossless superset of the true pair set, verified by exact Hamming
    distance (per-band xor popcount) on candidates only.
    Returns (id_a, id_b, hamming).

    ``n_bands`` is the SCALE knob (r13; the sf10 probe OOM'd an
    executor on this): an 8-bit band has only 256 values, so past
    ~10-100k images random collisions alone make the candidate join
    quadratic.  Regrouping the 64 bits into fewer, WIDER bands
    (n_bands=4 -> 16-bit values, 65k;  n_bands=2 -> 32-bit) restores
    selectivity at the price of the guaranteed distance
    (max_distance < n_bands) — exact duplicates (distance 0) are
    caught at ANY width.  ``max_pairs`` is the refusal backstop (the
    ``ngram_jaccard_pairs`` discipline): pre-count candidates, refuse
    loudly naming the knob instead of grinding."""
    if n_bands not in (1, 2, 4, 8):
        raise ValueError("n_bands must be 1, 2, 4, or 8 (regroups the "
                         "8 dHash bytes evenly)")
    if max_distance >= n_bands:
        raise ValueError(
            f"hamming_neardup_pairs: max_distance={max_distance} >= "
            f"{n_bands} bands breaks the pigeonhole recall guarantee — "
            "use more bands or a smaller distance"
        )
    hs = hashes.filter(F.col(bands_col).isNotNull()).select(
        F.col(id_col).alias("mid"), F.col(bands_col).alias("bands")
    )
    group = GRID_ROWS // n_bands  # bytes per (wider) band
    wide = F.array(*[
        sum(
            (F.element_at(F.col("bands"), g * group + j + 1)
             .cast("long") * (1 << (8 * j)))
            for j in range(group)
        )
        for g in range(n_bands)
    ])
    exploded = hs.select(
        "mid", F.posexplode(wide).alias("band_idx", "band_val")
    )
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.mid") < F.col("b.mid"),
            ],
        )
        .select(
            F.col("a.mid").alias("id_a"), F.col("b.mid").alias("id_b")
        )
        .distinct()
    )
    if max_pairs is not None:
        from data_integration_est_spark.util import bounded_persist

        cand = bounded_persist(cand)
        n_cand = cand.count()
        if n_cand > max_pairs:
            raise ValueError(
                f"hamming_neardup_pairs: {n_cand:,} candidate pairs > "
                f"max_pairs={max_pairs:,} — the {n_bands}x"
                f"{64 // n_bands}-bit band space has saturated at this "
                "corpus size.  Use fewer, wider bands (n_bands=4 gives "
                "16-bit values and guarantees recall to distance 3; "
                "exact duplicates are caught at any width) or "
                "raise/disable max_pairs explicitly."
            )
    ham = F.aggregate(
        F.zip_with(
            F.col("ha.bands"), F.col("hb.bands"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(hs.alias("ha"), F.col("id_a") == F.col("ha.mid"))
        .join(hs.alias("hb"), F.col("id_b") == F.col("hb.mid"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
    )


def hamming_neardup_stats(
    hashes: DataFrame,
    max_distance: int = 7,
    id_col: str = "media_id",
    bands_col: str = "bands",
    n_bands: int = 8,
    max_rep_pairs: int | None = 20_000_000,
) -> DataFrame:
    """Per-distance near-dup pair statistics with EXACT-COLLAPSE-FIRST
    (r13; the ``dedup_corpus`` discipline applied to images): identical
    dHashes are grouped before any pairing, the Hamming-band LSH join
    runs on the (usually tiny) set of DISTINCT hashes, and pair counts
    expand arithmetically from group sizes — never materializing the
    per-pair set.  Hamming distance is a function of the hash alone, so
    the expansion is exact: a group pair (A, B) at distance d
    contributes |A|·|B| pairs, a group with itself contributes
    C(|A|, 2) pairs at distance 0, and the symmetric id sum
    decomposes as |B|·Σ(A) + |A|·Σ(B) (resp. (|A|-1)·Σ(A)).

    This is the 100 TB path for duplication-heavy media corpora: the
    sf10 probe found 100k synthetic images collapsing to 407 distinct
    hashes — per-pair banding (``hamming_neardup_pairs``) would carry a
    ~236M-row candidate join that the collapse reduces to C(407, 2).
    Returns (hamming, n_pairs, id_sum) for distances <= max_distance."""
    if n_bands not in (1, 2, 4, 8):
        raise ValueError("n_bands must be 1, 2, 4, or 8")
    if max_distance >= n_bands:
        raise ValueError(
            f"hamming_neardup_stats: max_distance={max_distance} >= "
            f"{n_bands} bands breaks the pigeonhole recall guarantee"
        )
    from data_integration_est_spark.util import bounded_persist

    hs = hashes.filter(F.col(bands_col).isNotNull())
    groups = bounded_persist(
        hs.groupBy(F.col(bands_col).alias("bands")).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(id_col)).alias("id_sum"),
            F.min(F.col(id_col)).alias("rep"),
        )
    )
    # distance-0 pairs inside each group: C(cnt, 2), id sum (cnt-1)*Σ
    within = groups.filter(F.col("cnt") > 1).agg(
        F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2)
        .cast("long").alias("n_pairs"),
        F.sum((F.col("cnt") - 1) * F.col("id_sum"))
        .cast("long").alias("id_sum"),
    ).select(F.lit(0).alias("hamming"), "n_pairs", "id_sum")

    group = GRID_ROWS // n_bands
    wide = F.array(*[
        sum(
            (F.element_at(F.col("bands"), g * group + j + 1)
             .cast("long") * (1 << (8 * j)))
            for j in range(group)
        )
        for g in range(n_bands)
    ])
    exploded = groups.select(
        "rep", F.posexplode(wide).alias("band_idx", "band_val")
    )
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.rep") < F.col("b.rep"),
            ],
        )
        .select(F.col("a.rep").alias("rep_a"), F.col("b.rep").alias("rep_b"))
        .distinct()
    )
    if max_rep_pairs is not None:
        cand = bounded_persist(cand)
        n_cand = cand.count()
        if n_cand > max_rep_pairs:
            raise ValueError(
                f"hamming_neardup_stats: {n_cand:,} DISTINCT-hash "
                f"candidate pairs > max_rep_pairs={max_rep_pairs:,} even "
                "after exact collapse — the corpus has that many "
                "genuinely distinct near-identical textures; use fewer, "
                "wider bands or raise/disable max_rep_pairs."
            )
    ga = groups.select(F.col("rep").alias("rep_a"),
                       F.col("bands").alias("bands_a"),
                       F.col("cnt").alias("cnt_a"),
                       F.col("id_sum").alias("sum_a"))
    gb = groups.select(F.col("rep").alias("rep_b"),
                       F.col("bands").alias("bands_b"),
                       F.col("cnt").alias("cnt_b"),
                       F.col("id_sum").alias("sum_b"))
    ham = F.aggregate(
        F.zip_with(
            F.col("bands_a"), F.col("bands_b"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    cross = (
        cand.join(ga, "rep_a").join(gb, "rep_b")
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_distance)
        .groupBy("hamming")
        .agg(
            F.sum(F.col("cnt_a") * F.col("cnt_b"))
            .cast("long").alias("n_pairs"),
            F.sum(F.col("cnt_b") * F.col("sum_a")
                  + F.col("cnt_a") * F.col("sum_b"))
            .cast("long").alias("id_sum"),
        )
    )
    return (
        within.filter(F.col("n_pairs").isNotNull())
        .unionByName(cross)
        .groupBy("hamming")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"),
             F.sum("id_sum").cast("long").alias("id_sum"))
    )


AUDIO_FP_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("win_idx", IntegerType(), False),
    StructField("fp", LongType(), True),
])


def wav_window_fingerprints(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    window_ms: int = 2,
) -> DataFrame:
    """Per-window integer fingerprints over PCM-WAV blobs (r14 — the
    AUDIO leg of the media near-dup family, completing image/video/
    audio): one Arrow ``mapInPandas`` pass decodes each blob with the
    real ``multimodal.decode_wav``, cuts fixed windows
    (``multimodal.wav_windows``), and fingerprints each window as

        fp = Σ_j (s_j + 1000) * (j + 1)      (channel 0, j 0-based)

    — pure int16/int64 arithmetic, so the fingerprint replays
    bit-for-bit in SQL from a closed-form sample formula.  Blob bytes
    live one Arrow batch; (media_id, win_idx, fp) flow on.  Audios
    sharing a (win_idx, fp) cell are near-dup CANDIDATES via the
    inverted-index equi-join — linear in collision mass, never
    all-pairs (the banded-LSH discipline).  Undecodable blobs emit one
    NULL-fp row at win_idx -1 (refusal count)."""
    from data_integration_est_spark.ops.multimodal import (
        decode_wav, wav_windows,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids: list[int] = []
            idxs: list[int] = []
            fps: list[int | None] = []
            for mid, content in zip(b[id_col], b[content_col]):
                if content is None:
                    continue
                try:
                    wins = wav_windows(bytes(content), window_ms=window_ms)
                except (NotImplementedError, ValueError):
                    ids.append(mid)
                    idxs.append(-1)
                    fps.append(None)
                    continue
                for wi, (_, samples) in enumerate(wins):
                    s = samples[:, 0].astype(np.int64)
                    fp = int(((s + 1000) * np.arange(1, len(s) + 1)).sum())
                    ids.append(mid)
                    idxs.append(wi)
                    fps.append(fp)
            yield pd.DataFrame({"media_id": ids, "win_idx": idxs, "fp": fps})

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(run, AUDIO_FP_SCHEMA)


def synth_wav_variant(
    group: int, variant: int, n: int = 64, rate: int = 8000
) -> bytes:
    """Deterministic REAL mono 16-bit PCM WAV for near-dup testing:
    sample i = ((group*7 + i*13) % 2001) - 1000, plus a sparse
    perturbation (+50*variant at i % 37 == 0) — variants of one group
    share the base signal, so most 16-sample windows fingerprint
    identically across variants while perturbed windows differ.
    Closed-form, SQL-replayable (the audio analogue of
    ``synth_ppm_variant``)."""
    import struct

    # vectorized (r16 optimization round): bit-identical to the original
    # per-sample struct.pack loop — little-endian int16 samples, values
    # in [-1000, 2350] so no overflow; the Python loop was the dominant
    # cost of the media synthesis stage at bench scale (guide §4.2)
    i = np.arange(n, dtype=np.int64)
    samples = ((group * 7 + i * 13) % 2001) - 1000 + np.where(
        i % 37 == 0, 50 * variant, 0
    )
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_ppm_variant(
    group: int, variant: int, w: int = 18, h: int = 16
) -> bytes:
    """Deterministic REAL PPM blob for near-dup testing: byte idx has
    value ((group*37 + idx) % 199 + 24*variant*(idx % 97 == 0)) % 256 —
    variants of one group share the base texture with a sparse
    deterministic perturbation (~9 of 864 bytes), so within-group
    dHash distances spread over 0..9 bits (both sides of a <= 7
    verify threshold are exercised).  Closed-form, so a SQL oracle can
    recompute the hash exactly."""
    header = f"P6\n{w} {h}\n255\n".encode()
    n = w * h * 3
    # vectorized (r16 optimization round): bit-identical to the original
    # per-byte generator — all intermediates are non-negative so numpy
    # and Python % agree (guide §4.2)
    j = np.arange(n, dtype=np.int64)
    vals = ((group * 37 + j) % 199
            + np.where(j % 97 == 0, 24 * variant, 0)) % 256
    return header + vals.astype(np.uint8).tobytes()


def media_dedup_corpus(
    media: DataFrame,
    id_col: str = "media_id",
    kind_col: str = "kind",
    content_col: str = "content",
    max_distance: int = 7,
    n_bands: int = 8,
    frame_every_n: int = 1,
    window_ms: int = 2,
    min_shared_windows: int = 2,
    max_pairs: int | None = 20_000_000,
) -> DataFrame:
    """One-call MEDIA corpus near-dedup across image/video/audio (r15 —
    r14 verdict #7, mirroring ``ops.dedup.dedup_corpus``): the
    composition a multimodal pipeline actually calls.

    1. exact dedup: md5(content) keyed window, keep the minimum id —
       verbatim byte copies collapse before any decoding, so the Python
       decode stages only ever see DISTINCT blobs;
    2. per-modality near-dup pairs over the survivors, each via this
       module's certified primitives:
       - ``kind='image'``: ``dhash_images`` -> Hamming-band LSH pairs
         at ``max_distance``;
       - ``kind='video'``: ``dhash_frames(every_n=frame_every_n)`` ->
         the SAME band join keyed by media id — frames of one video
         never pair (id equality), cross-video frame hits become media
         pairs directly;
       - ``kind='audio'``: ``wav_window_fingerprints`` -> (win_idx, fp)
         inverted-index join, pairs sharing >= ``min_shared_windows``
         windows;
    3. connected components over the union of pair lists -> keep the
       minimum-id representative per near-dup cluster.

    Returns the surviving rows of the exact-dedup survivors (all
    original columns).  Scale posture is the stages' own: media BYTES
    never cross a shuffle (each decode is one Arrow pass emitting ids +
    small ints), every pair path is banded/inverted-index (never
    all-pairs), and the ``max_pairs`` refusal backstop is inherited by
    the image and video band joins.  Unknown kinds and undecodable
    blobs survive untouched (they produce no pairs) — including
    NULL-content rows, which are exempted from the md5 collapse (r16,
    ADVICE r15 #3: ``md5(NULL)`` is NULL for every such row, so the
    keyed window used to treat all of them as one duplicate class and
    keep only the minimum id); the call is safe on mixed corpora."""
    from pyspark.sql import Window

    from data_integration_est_spark.ops.components import (
        dedup_keep_representative,
    )
    from data_integration_est_spark.util import bounded_persist

    win = Window.partitionBy("__fp__").orderBy(id_col)
    # NULL content -> NULL md5: coalesce the fingerprint with a per-row
    # unique key so every contentless row is its own singleton class
    fp = F.coalesce(
        F.md5(F.col(content_col)),
        F.concat(F.lit("__null__"), F.col(id_col).cast("string")),
    )
    work = (
        media.withColumn("__fp__", fp)
        .withColumn("__rn__", F.row_number().over(win))
        .filter(F.col("__rn__") == 1)
        .drop("__fp__", "__rn__")
    )
    # the survivors are re-scanned by one decode pass per modality plus
    # the final keep-rep join; give the persisted frame a
    # data-proportional partition count so small survivor sets (exact
    # collapse can shrink the corpus by orders of magnitude) don't pay
    # a near-empty-task floor per pass (r16 optimization round, guide
    # §2/§6 — no-op for genuinely large survivor sets)
    from data_integration_est_spark.util import adaptive_coalesce

    work = bounded_persist(adaptive_coalesce(work))

    kinds = F.col(kind_col)
    img_pairs = hamming_neardup_pairs(
        dhash_images(
            work.filter(kinds == "image"), id_col=id_col,
            content_col=content_col,
        ),
        max_distance=max_distance, n_bands=n_bands, max_pairs=max_pairs,
    ).select("id_a", "id_b")
    frame_pairs = hamming_neardup_pairs(
        dhash_frames(
            work.filter(kinds == "video"), id_col=id_col,
            content_col=content_col, every_n=frame_every_n,
        ),
        max_distance=max_distance, n_bands=n_bands, max_pairs=max_pairs,
    ).select("id_a", "id_b").distinct()
    fps = wav_window_fingerprints(
        work.filter(kinds == "audio"), id_col=id_col,
        content_col=content_col, window_ms=window_ms,
    ).filter(F.col("fp").isNotNull())
    audio_pairs = (
        fps.select("win_idx", "fp", F.col("media_id").alias("id_a"))
        .join(
            fps.select("win_idx", "fp", F.col("media_id").alias("id_b")),
            ["win_idx", "fp"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_windows)
        .select("id_a", "id_b")
    )
    pairs = img_pairs.unionByName(frame_pairs).unionByName(audio_pairs)
    return dedup_keep_representative(
        work, pairs, id_col=id_col, left_col="id_a", right_col="id_b"
    )
