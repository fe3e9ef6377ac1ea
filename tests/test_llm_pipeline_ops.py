"""Round-4 LLM-pipeline extensions: decontamination, repetition quality,
temperature source mixing, and the O5 plot frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.decontam import contamination_scan, decontaminate
from data_integration_est_spark.ops.mixing import source_mixture, temperature_sample
from data_integration_est_spark.ops.quality_rep import repetition_stats


# ------------------------------------------------------------- decontam
@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1 embeds the benchmark question verbatim -> contaminated
        (1, "intro text here the quick brown fox jumps over the lazy dog today"),
        # doc 2 shares no 5-gram with the benchmark
        (2, "completely unrelated content about spark partitions and shuffles"),
        # doc 3 short (< 5 words): whole text is its single gram
        (3, "tiny document"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


def test_contamination_scan_flags_verbatim_overlap(spark, corpus, bench_docs):
    out = {
        r["doc_id"]: r
        for r in contamination_scan(corpus, bench_docs, n=5).collect()
    }
    assert out[1]["n_hits"] > 0 and out[1]["contaminated"] == 1
    assert out[2]["n_hits"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["n_grams"] == 1 and out[3]["n_hits"] == 0


def test_exact_and_hash_paths_agree(spark, corpus, bench_docs):
    a = sorted(map(tuple, contamination_scan(corpus, bench_docs, n=5, exact=True).collect()))
    b = sorted(map(tuple, contamination_scan(corpus, bench_docs, n=5, exact=False).collect()))
    assert a == b


def test_decontaminate_drops_flagged(spark, corpus, bench_docs):
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, bench_docs, n=5).collect())
    assert kept == [2, 3]


def test_benchmark_side_is_broadcast(spark, corpus, bench_docs):
    import contextlib, io

    df = contamination_scan(corpus, bench_docs, n=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    assert "BroadcastHashJoin" in buf.getvalue()


# ------------------------------------------------------- repetition stats
def test_repetition_stats_known_values(spark):
    # "a b\na b\nc" -> lines [a b, a b, c]: 3 lines, 2 distinct,
    # dup chars = 3 (one repeat of "a b"), line chars = 7
    # tokens (\s+ splits space AND newline): [a,b,a,b,c]
    # bigrams: "a b","b a","a b","b c" -> top "a b" x2, len 3, doc len 9
    docs = spark.createDataFrame([(1, "a b\na b\nc")], "doc_id long, text string")
    r = repetition_stats(docs).collect()[0]
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert r["dup_line_char_frac"] == round(3 / 7, 6)
    assert r["top_bigram_count"] == 2
    assert r["top_bigram_char_frac"] == round(2 * 3 / 9, 6)


def test_repetition_stats_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [(1, "oneword"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["n_lines"] == 1 and out[1]["dup_line_frac"] == 0.0
    assert out[1]["top_bigram_count"] == 0
    assert out[2]["top_bigram_char_frac"] == 0.0


# ------------------------------------------------------------- mixing
@pytest.fixture(scope="module")
def sourced_docs(spark):
    # 90 docs from 'web', 10 from 'books'
    return spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 90, "web").otherwise("books").alias("source"),
    )


def test_source_mixture_weights(spark, sourced_docs):
    mix = {r["source"]: r for r in source_mixture(sourced_docs, alpha=0.5).collect()}
    z = 90 ** 0.5 + 10 ** 0.5
    assert mix["web"]["p"] == 0.9 and mix["books"]["p"] == 0.1
    assert mix["web"]["q"] == round(90 ** 0.5 / z, 6)
    assert mix["books"]["q"] == round(10 ** 0.5 / z, 6)
    # alpha < 1 up-weights the small source relative to natural share
    assert mix["books"]["q"] > mix["books"]["p"]
    # expected sample of the small source exceeds natural-proportion share
    assert mix["books"]["rate"] > mix["web"]["rate"]


def test_temperature_sample_deterministic_and_shaped(spark, sourced_docs):
    s1 = sorted(r["doc_id"] for r in temperature_sample(sourced_docs).collect())
    s2 = sorted(r["doc_id"] for r in temperature_sample(sourced_docs).collect())
    assert s1 == s2 and len(s1) > 0
    # every sampled id satisfies the acceptance rule for its source
    mix = {r["source"]: r["rate"] for r in source_mixture(sourced_docs).collect()}
    for r in temperature_sample(sourced_docs).collect():
        u = (r["doc_id"] * 2654435761) % 1_000_000 / 1_000_000
        assert u < mix[r["source"]]


def test_alpha_one_is_uniform_rate(spark, sourced_docs):
    """alpha=1 -> q == p -> every source gets the same acceptance rate
    (= target_frac)."""
    mix = {r["source"]: r for r in source_mixture(sourced_docs, alpha=1.0, target_frac=0.4).collect()}
    assert mix["web"]["rate"] == mix["books"]["rate"] == 0.4


# ------------------------------------------------------------- O5 plots
def test_bias_frame_shape(spark):
    from data_integration_est_spark.plots import bias_frame

    summary = spark.createDataFrame(
        [(1.0, "B", 0.2, 0.01, 0.2, 5), (0.0, "A", 0.0, 0.02, 0.02, 5),
         (1.0, "A", 0.1, 0.01, 0.1, 5)],
        "gamma double, estimator string, bias_mean double, bias_sd double, rmse double, n_sim long",
    )
    pdf = bias_frame(summary)
    assert list(pdf.columns) == ["gamma", "estimator", "bias_mean", "bias_sd", "rmse"]
    # sorted by (gamma, estimator) for deterministic line order
    assert list(zip(pdf["gamma"], pdf["estimator"])) == [
        (0.0, "A"), (1.0, "A"), (1.0, "B")
    ]


def test_plot_render_gated_on_matplotlib(spark):
    from data_integration_est_spark.plots import plot_bias_vs_gamma

    summary = spark.createDataFrame(
        [(0.0, "A", 0.0, 0.02, 0.02, 5)],
        "gamma double, estimator string, bias_mean double, bias_sd double, rmse double, n_sim long",
    )
    try:
        import matplotlib  # noqa: F401
        has_mpl = True
    except ImportError:
        has_mpl = False
    if has_mpl:
        fig = plot_bias_vs_gamma(summary)
        assert fig is not None
    else:
        with pytest.raises(NotImplementedError, match="matplotlib"):
            plot_bias_vs_gamma(summary)


# ------------------------------------------------------------- PII scan
def test_pii_scan_counts_and_redaction(spark):
    from data_integration_est_spark.ops.pii import pii_scan

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or 10.0.0.1 works"),
            (2, "ssn 123-45-6789 phone 555-123-4567"),
            (3, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1 and out[1]["n_pii"] == 2
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1 and out[2]["n_pii"] == 2
    assert out[3]["n_pii"] == 0 and out[3]["redacted"] == docs.collect()[2]["text"]
    assert out[1]["redacted"] == "mail me at [EMAIL] or [IP] works"
    assert out[2]["redacted"] == "ssn [SSN] phone [PHONE]"


def test_pii_redaction_order_no_remap(spark):
    """An SSN-shaped run inside a longer digit context must not leave
    digits that re-match the phone family after redaction."""
    from data_integration_est_spark.ops.pii import pii_scan

    docs = spark.createDataFrame(
        [(1, "contact 123-45-6789 and 999-888-7777")], "doc_id long, text string"
    )
    r = pii_scan(docs).collect()[0]
    assert r["redacted"] == "contact [SSN] and [PHONE]"
    assert "[" in r["redacted"] and not any(ch.isdigit() for ch in r["redacted"])


# --------------------------------------------------------- sequence packing
def test_pack_chunks_known_layout(spark):
    from data_integration_est_spark.ops.packing import chunk_occupancy, pack_chunks

    # one stream, budget 10: docs of 4, 8, 10, 3 tokens
    # offsets: [0,4) [4,12) [12,22) [22,25)
    # chunks:  0     0-1    1-2     2
    docs = spark.createDataFrame(
        [(1, "s", 4), (2, "s", 8), (3, "s", 10), (4, "s", 3)],
        "doc_id long, source string, n_tok long",
    )
    plan = {r["doc_id"]: r for r in pack_chunks(docs, "n_tok", 10).collect()}
    assert (plan[1]["first_chunk"], plan[1]["last_chunk"]) == (0, 0)
    assert (plan[2]["first_chunk"], plan[2]["last_chunk"]) == (0, 1)
    assert (plan[3]["first_chunk"], plan[3]["last_chunk"]) == (1, 2)
    assert (plan[4]["first_chunk"], plan[4]["last_chunk"]) == (2, 2)
    assert plan[3]["n_chunks_spanned"] == 2

    occ = chunk_occupancy(pack_chunks(docs, "n_tok", 10), 10).collect()[0]
    assert occ["total_tokens"] == 25 and occ["n_chunks"] == 3 and occ["pad_tokens"] == 5


def test_pack_chunks_streams_independent(spark):
    from data_integration_est_spark.ops.packing import pack_chunks

    docs = spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, "a", 7), (4, "b", 7)],
        "doc_id long, source string, n_tok long",
    )
    plan = {r["doc_id"]: r for r in pack_chunks(docs, "n_tok", 10).collect()}
    # each stream packs from offset 0 independently
    assert plan[1]["start_off"] == 0 and plan[2]["start_off"] == 0
    assert plan[3]["start_off"] == 7 and plan[4]["start_off"] == 7


def test_pack_chunks_zero_token_doc(spark):
    from data_integration_est_spark.ops.packing import pack_chunks

    docs = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 0), (3, "s", 1)],
        "doc_id long, source string, n_tok long",
    )
    plan = {r["doc_id"]: r for r in pack_chunks(docs, "n_tok", 10).collect()}
    # zero-token doc sits AT the boundary (offset 10) and spans 1 chunk
    assert plan[2]["n_chunks_spanned"] == 1
    assert plan[2]["first_chunk"] == plan[2]["last_chunk"] == 1


def test_pack_chunks_keyed_window_plan(spark):
    """The packing window must be keyed by the stream column — no
    unpartitioned (single-task) window in the plan."""
    import contextlib, io

    from data_integration_est_spark.ops.packing import pack_chunks

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"),
        (F.col("id") % 100 + 1).alias("n_tok"),
    )
    df = pack_chunks(docs, "n_tok", 4096)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "hashpartitioning(source" in plan


# ---------------------------------------------------- connected components
def test_connected_components_chain_and_star(spark):
    from data_integration_est_spark.ops.components import connected_components

    # chain 1-2-3-4, star 10-(11,12), singleton edge 20-20 (self-loop)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 20)],
        "src long, dst long",
    )
    comp = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == 20


def test_connected_components_merges_via_transitivity(spark):
    from data_integration_est_spark.ops.components import connected_components

    # two pair-lists that only connect transitively: (5,6) and (6,7)
    edges = spark.createDataFrame([(5, 6), (6, 7)], "src long, dst long")
    comp = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[5] == comp[6] == comp[7] == 5


def test_dedup_keep_representative(spark):
    from data_integration_est_spark.ops.components import dedup_keep_representative

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_l long, id_r long"
    )
    kept = sorted(r["doc_id"] for r in dedup_keep_representative(docs, pairs).collect())
    # clusters {1,2,3} -> keep 1; {5,6} -> keep 5; untouched: 4, 7
    assert kept == [1, 4, 5, 7]


def test_connected_components_max_iter_guard(spark):
    from data_integration_est_spark.ops.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(edges, max_iter=2, driver_max_edges=0)


def test_connected_components_driver_path_matches_distributed(spark):
    # the small-edge-list union-find fast path must produce byte-identical
    # labels to the distributed fixpoint (chain + star + isolated pair)
    from data_integration_est_spark.ops.components import connected_components

    rows = [(i, i + 1) for i in range(10)] + [(100, x) for x in (101, 102, 103)]
    rows += [(200, 201)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    fast = sorted(map(tuple, connected_components(edges).collect()))
    slow = sorted(map(tuple,
                      connected_components(edges, driver_max_edges=0).collect()))
    assert fast == slow


def test_connected_components_string_ids(spark):
    # string vertex ids (doc hashes / URLs) with a diameter-4 chain: the
    # old decimal-sum convergence signal NULLed out on strings and
    # returned after ONE propagation round — this chain needs several.
    from data_integration_est_spark.ops.components import connected_components

    edges = spark.createDataFrame(
        [("e", "d"), ("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        "src string, dst string",
    )
    comp = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"] == comp["e"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_dedup_keep_representative_string_ids(spark):
    from data_integration_est_spark.ops.components import dedup_keep_representative

    docs = spark.createDataFrame(
        [(f"h{i}", f"t{i}") for i in range(1, 6)], "doc_id string, text string"
    )
    # transitively connected chain h1-h2-h3 (diameter > 2 after symmetry)
    pairs = spark.createDataFrame(
        [("h1", "h2"), ("h2", "h3")], "id_l string, id_r string"
    )
    kept = sorted(r["doc_id"] for r in dedup_keep_representative(docs, pairs).collect())
    assert kept == ["h1", "h4", "h5"]


def test_temperature_sample_rejects_string_ids(spark):
    # a string id silently NULLed the hash-uniform and dropped every row;
    # now it must refuse loudly.
    docs = spark.createDataFrame(
        [(f"d{i}", "web") for i in range(10)], "doc_id string, source string"
    )
    with pytest.raises(TypeError, match="INTEGRAL id"):
        temperature_sample(docs)


# ----------------------------------------------------- no-split bin packing
def _nextfit_oracle(items, budget):
    """Reference next-fit in plain python: [(id, tokens)] -> {id: bin}."""
    out, b, fill = {}, 0, 0
    for i, t in items:
        if fill + t > budget and fill > 0:
            b, fill = b + 1, 0
        out[i] = b
        fill += t
    return out


def test_pack_bins_matches_python_oracle(spark):
    from data_integration_est_spark.ops.packing import pack_bins

    # deterministic pseudo-random sizes incl. zero and oversize docs
    rows = [(i, str(i % 3), (i * 37) % 130) for i in range(200)]
    rows[17] = (17, "2", 0)
    rows[23] = (23, "2", 500)  # > budget: bin of its own
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    got = {
        (r["source"], r["doc_id"]): r["bin"]
        for r in pack_bins(docs, "n_tok", budget=100, by="source").collect()
    }
    for s in ("0", "1", "2"):
        items = [(i, t) for (i, src, t) in rows if src == s]
        want = _nextfit_oracle(sorted(items), 100)
        for i, b in want.items():
            assert got[(s, i)] == b, (s, i)


def test_pack_bins_invariants_and_stats(spark):
    from data_integration_est_spark.ops.packing import bin_stats, pack_bins

    docs = spark.createDataFrame(
        [(i, "s", (i * 13) % 40 + 1) for i in range(100)],
        "doc_id long, source string, n_tok long",
    )
    plan = pack_bins(docs, "n_tok", budget=64, by="source")
    rows = plan.collect()
    assert len(rows) == 100  # no doc dropped or duplicated
    fills = {}
    for r in rows:
        fills[r["bin"]] = fills.get(r["bin"], 0) + r["n_tokens"]
    assert all(f <= 64 for f in fills.values())  # no oversize docs here
    assert sorted(fills) == list(range(len(fills)))  # contiguous bin ids

    st = bin_stats(plan, 64).collect()[0]
    assert st["n_docs"] == 100
    assert st["n_bins"] == len(fills)
    assert st["total_tokens"] == sum(fills.values())
    assert st["pad_tokens"] == sum(64 - f for f in fills.values())
    assert st["utilization"] == pytest.approx(
        st["total_tokens"] / (64 * st["n_bins"]), abs=1e-6
    )


def test_pack_bins_oversize_doc_owns_bin_no_padding_charge(spark):
    from data_integration_est_spark.ops.packing import bin_stats, pack_bins

    docs = spark.createDataFrame(
        [(1, "s", 50), (2, "s", 300), (3, "s", 60)],
        "doc_id long, source string, n_tok long",
    )
    plan = {r["doc_id"]: r["bin"] for r in
            pack_bins(docs, "n_tok", budget=100, by="source").collect()}
    assert plan == {1: 0, 2: 1, 3: 2}
    st = bin_stats(
        pack_bins(docs, "n_tok", budget=100, by="source"), 100
    ).collect()[0]
    # pads: bin0 50, bin1 overflow->0, bin2 40
    assert st["pad_tokens"] == 90


def test_pack_bins_custom_order_nextfit_decreasing(spark):
    from data_integration_est_spark.ops.packing import pack_bins

    docs = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 90), (3, "s", 85), (4, "s", 15)],
        "doc_id long, source string, n_tok long",
    ).withColumn("neg_len", -F.col("n_tok") * 1000 + F.col("doc_id"))
    # length-descending visit order: 90, 85, 15, 10 -> bins 0,1,1,2? no:
    # 90 -> bin0 (fill 90); 85 -> bin1 (85); 15 -> bin1 (100); 10 -> bin2
    plan = {r["doc_id"]: r["bin"] for r in
            pack_bins(docs, "n_tok", budget=100, by="source",
                      order_col="neg_len").collect()}
    assert plan == {2: 0, 3: 1, 4: 1, 1: 2}


# -------------------------------------------------------- document chunking
def test_chunk_documents_overlap(spark):
    from data_integration_est_spark.ops.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    out = sorted(
        (r["chunk_idx"], r["tok_start"], r["tok_end"], r["chunk_text"])
        for r in chunk_documents(docs, size=4, stride=2).collect()
    )
    # 7 tokens, size 4, stride 2 -> ceil((7-4)/2)+1 = 3 chunks
    assert out == [
        (0, 0, 4, "a b c d"),
        (1, 2, 6, "c d e f"),
        (2, 4, 7, "e f g"),
    ]


def test_chunk_documents_disjoint_default_and_short_doc(spark):
    from data_integration_est_spark.ops.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, size=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"])
        )
    assert sorted(by_doc[1]) == [(0, "a b"), (1, "c d"), (2, "e")]
    assert by_doc[2] == [(0, "x")]
    # empty doc still yields exactly one (empty) chunk
    assert by_doc[3] == [(0, "")]


def test_chunk_documents_reassembles_disjoint(spark):
    """With stride == size, concatenating chunks in order restores the
    tokenized document exactly."""
    from data_integration_est_spark.ops.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(57))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(docs, size=10).collect()
    )
    assert " ".join(t for _, t in rows) == text


# -------------------------------------------------- line dedup / source cap
def test_line_dedup_removes_cross_doc_boilerplate(spark):
    from data_integration_est_spark.ops.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro one\nCOOKIE BANNER\nbody A\n\nend A"),
            (2, "COOKIE BANNER\nbody B"),
            (3, "body C\nCOOKIE BANNER"),
            (4, "unique doc"),
            (5, "COOKIE BANNER"),  # all-boilerplate doc -> empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert len(out) == 5
    # the shared line is stripped from EVERY doc, order preserved
    assert out[1]["text_dedup"] == "intro one\nbody A\n\nend A"
    assert out[2]["text_dedup"] == "body B"
    assert out[3]["text_dedup"] == "body C"
    assert out[4]["text_dedup"] == "unique doc"
    assert out[5]["text_dedup"] == "" and out[5]["n_kept"] == 0
    # blank lines are kept (formatting), not treated as boilerplate
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 4


def test_line_dedup_hash_equals_raw_path(spark):
    """The xxhash64-keyed scale path and the raw-string gate path must
    agree exactly (same doctrine as decontam's exact/hash twin)."""
    from data_integration_est_spark.ops.dedup import line_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id", F.regexp_replace("text", " the ", "\n").alias("text")
        )
    )
    a = line_dedup(docs, hash_lines=True).orderBy("doc_id").collect()
    b = line_dedup(docs, hash_lines=False).orderBy("doc_id").collect()
    assert a == b


def test_cap_per_key_binds_and_is_deterministic(spark):
    from data_integration_est_spark.ops.mixing import cap_per_key

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(100)],
        "doc_id long, source string, score double",
    )
    capped = cap_per_key(docs, "source", n_max=5, order_col="doc_id")
    got = sorted(r["doc_id"] for r in capped.collect())
    # first 5 ids of each of the 3 sources
    want = sorted(
        i for s in range(3) for i in [j for j in range(100) if j % 3 == s][:5]
    )
    assert got == want
    # descending keeps the TOP scores per key
    top = cap_per_key(docs, "source", n_max=2, order_col="score", descending=True)
    assert sorted(r["doc_id"] for r in top.collect()) == sorted(
        [99, 96, 98, 95, 97, 94]
    )


def test_cap_per_key_plan_has_window_group_limit(spark):
    import contextlib
    import io

    from data_integration_est_spark.ops.mixing import cap_per_key

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("string").alias("source")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cap_per_key(docs, "source", n_max=10, order_col="doc_id").explain()
    assert "WindowGroupLimit" in buf.getvalue()


# ------------------------------------------------------ unigram quality
def test_unigram_logprob_known_values(spark):
    import math

    from data_integration_est_spark.ops.text import unigram_logprob_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
    # corpus counts: a=2, b=1, c=1, T=4
    want1 = (2 * math.log(2 / 4) + math.log(1 / 4)) / 3
    want2 = math.log(1 / 4)
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(want1, abs=1e-6)
    assert out[2]["avg_logprob"] == pytest.approx(want2, abs=1e-6)
    # rare-token docs score lower than common-token docs
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]


# ------------------------------------------------------ deterministic splits
def test_hash_split_partitions_and_is_stable(spark):
    from data_integration_est_spark.ops.mixing import hash_split

    docs = spark.range(10_000).select(F.col("id").alias("doc_id"))
    out = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 10_000          # total partition
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 8_000                 # roughly proportional
    # stability: identical assignment on a second run
    again = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    diff = (
        out.alias("a").join(again.alias("b"), "doc_id")
        .filter(F.col("a.split") != F.col("b.split")).count()
    )
    assert diff == 0


def test_hash_split_validates_inputs(spark):
    from data_integration_est_spark.ops.mixing import hash_split

    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"train": 0.5, "val": 0.1})
    sdocs = spark.createDataFrame([("a",)], "doc_id string")
    with pytest.raises(TypeError, match="INTEGRAL id"):
        hash_split(sdocs, {"train": 1.0})
    # float ids would turn % into floating modulo — refuse those too
    fdocs = spark.createDataFrame([(1.5,)], "doc_id double")
    with pytest.raises(TypeError, match="INTEGRAL id"):
        hash_split(fdocs, {"train": 1.0})


def test_hash_split_no_int64_overflow(spark):
    """ids >= ~3.47e9 overflowed the raw Knuth multiply (silent int64
    wrap under non-ANSI Spark vs HUGEINT promotion in DuckDB); the
    mod-before-multiply form must agree with exact Python arithmetic."""
    from data_integration_est_spark.ops.mixing import hash_split

    big = [2**62 + 12345, 2**48 + 7, 3_470_000_000, 17]
    docs = spark.createDataFrame([(i,) for i in big], "doc_id long")
    out = {r["doc_id"]: r["split"]
           for r in hash_split(docs, {"a": 0.5, "b": 0.5}).collect()}
    for i in big:
        u = ((i % 1_000_000) * 2654435761 % 1_000_000) / 1_000_000.0
        assert out[i] == ("a" if u < 0.5 else "b"), i


# --------------------------------------------------- end-to-end corpus dedup
def test_dedup_corpus_end_to_end(spark):
    from data_integration_est_spark.ops.dedup import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "sleepy")          # near-dup of base
    rows = [
        (1, base),
        (2, base),                                  # exact dup of 1
        (3, near),                                  # near-dup cluster with 1
        (4, "completely different text about spark shuffles and partitions"),
        (5, "another unrelated document with its own distinct content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup_corpus(docs, threshold=0.5).collect())
    # 2 collapses into 1 (exact); 3 collapses into 1 (near); 4, 5 survive
    assert kept == [1, 4, 5]


def test_dedup_corpus_no_false_merges(spark):
    from data_integration_est_spark.ops.dedup import dedup_corpus

    rows = [(i, f"document number {i} with unique words token{i} alpha{i} "
                f"beta{i} gamma{i} delta{i} epsilon{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup_corpus(docs, threshold=0.5).count() == 40


def test_dedup_corpus_lsh_misses_no_true_pair_on_gate_corpus(spark, sf_dir):
    """ADVICE r5: the dedup_corpus gate row's all-pairs oracle is only
    valid if banded LSH (16 bands x 2 rows) misses no true pair at
    threshold 0.5 ON THIS CORPUS (a pair at s=0.5 is missed w.p. ~1%).
    Pin that corpus-dependent assumption: ground-truth pairs from a
    first-principles python shingle scan vs the engine's candidates."""
    import itertools
    import re as _re

    from data_integration_est_spark.ops.dedup import (
        lsh_candidate_pairs, minhash_signatures)

    sf01 = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf01}/documents.parquet")
    rows = docs.select("doc_id", "text").collect()

    def norm_fp(t):
        return _re.sub(r"\s+", " ", _re.sub(r"[^a-z0-9\s]", "", t.lower())).strip()

    # exact-dedup survivors (min id per normalized fingerprint)
    by_fp = {}
    for r in rows:
        fp = norm_fp(r["text"])
        if fp not in by_fp or r["doc_id"] < by_fp[fp]["doc_id"]:
            by_fp[fp] = r

    def shingles(t):
        toks = _re.split(r"\s+", t.strip())
        if len(toks) < 3:
            return {t.strip()}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sh = {r["doc_id"]: shingles(r["text"]) for r in by_fp.values()}
    true_pairs = set()
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        inter = len(sa & sb)
        if inter and inter / len(sa | sb) >= 0.5:
            true_pairs.add((a, b))

    work = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in by_fp.values()],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(work, text_col="text", num_hashes=32,
                              shingle_n=3, id_col="doc_id")
    cand = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in lsh_candidate_pairs(sigs, id_col="doc_id", bands=16,
                                     rows_per_band=2).collect()
    }
    missed = true_pairs - cand
    assert not missed, f"LSH missed true pairs on the gate corpus: {missed}"
    assert true_pairs, "gate corpus has no true near-dup pairs — oracle vacuous"


def test_bigram_logprob_scores_matches_python(spark):
    """r6: interpolated bigram LM vs a from-scratch python replay."""
    import math
    from collections import Counter

    from data_integration_est_spark.ops.text import bigram_logprob_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "dog"),                      # < 2 tokens: absent from output
        (4, "on the mat the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}

    pairs_by_doc = {}
    allp = []
    for i, t in rows:
        toks = t.split()
        ps = list(zip(toks, toks[1:]))
        if ps:
            pairs_by_doc[i] = ps
            allp.extend(ps)
    cb = Counter(allp)
    cv = Counter(v for v, _ in allp)
    cw = Counter(w for _, w in allp)
    T = sum(cw.values())
    lam = 0.75
    for i, ps in pairs_by_doc.items():
        lps = [
            math.log(lam * cb[p] / cv[p[0]] + (1 - lam) * cw[p[1]] / T)
            for p in ps
        ]
        assert got[i]["n_bigrams"] == len(ps)
        assert got[i]["avg_logprob2"] == pytest.approx(
            round(sum(lps) / len(lps), 6), abs=2e-6)
    assert 3 not in got
    # repeated bigram ("the cat") scores above a one-off ("sat on")
    assert got[2]["avg_logprob2"] > got[1]["avg_logprob2"]


def test_neardup_decontam_catches_paraphrase_missed_by_exact(spark):
    """r6: the fuzzy layer must flag a lightly-edited copy that shares
    no verbatim 5-gram with the benchmark (exact scan misses it), and
    must NOT flag unrelated text."""
    from data_integration_est_spark.ops.decontam import (
        contamination_scan, decontaminate_neardup, neardup_contamination)

    words = [f"w{i:02d}" for i in range(1, 21)]
    bench_text = " ".join(words)
    para = list(words)
    for pos in (5, 10, 15, 20):       # swap every 5th word: runs of 4
        para[pos - 1] = f"X{pos}"     # -> no shared 5-gram anywhere,
    para_text = " ".join(para)        # bigram-shingle Jaccard ~0.46
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, para_text),
            (2, "completely different text about spark adaptive execution"),
            (3, bench_text),
        ],
        "doc_id long, text string",
    )
    exact = {r["doc_id"]: r["contaminated"]
             for r in contamination_scan(corpus, bench, n=5).collect()}
    assert exact[1] == 0          # exact 5-gram scan misses the paraphrase
    # bands=32 x 1 row: candidate prob per band = s, miss prob (1-s)^32
    # ~ 5e-8 at s=0.46 — deterministic for test purposes
    kw = dict(threshold=0.3, bands=32, num_hashes=32, shingle_n=2)
    flagged = {r["doc_id"]: r["jaccard"] for r in
               neardup_contamination(corpus, bench, **kw).collect()}
    assert 1 in flagged and flagged[1] == pytest.approx(12 / 26, abs=1e-6)
    assert flagged[3] == 1.0
    assert 2 not in flagged
    kept = sorted(r["doc_id"] for r in
                  decontaminate_neardup(corpus, bench, **kw).collect())
    assert kept == [2]


def test_clean_text_normalizations(spark):
    from data_integration_est_spark.ops.text import clean_text

    dirty = (
        "​zero‌width­ gone  "        # zw chars + soft hyphen
        "“quoted” ‘single’ "     # curly quotes
        "a—b – c … "                  # dashes + ellipsis
        "nb sp　wide\x07bell\ttab\nline"    # spaces, control, keep \t\n
    )
    df = spark.createDataFrame([(1, dirty)], "doc_id long, text string")
    r = clean_text(df).collect()[0]
    out = r["text_clean"]
    assert out == (
        'zerowidth gone "quoted" \'single\' a-b - c ... nb sp wide'
        "bell\ttab\nline"
    )
    assert r["n_chars_removed"] == len(dirty) - len(out)
    assert "\n" in out and "\t" in out      # structure preserved


def test_trigram_logprob_scores_matches_python(spark):
    """r7: interpolated trigram LM vs a from-scratch python replay with
    STANDARD JM counts (bigram counts from the pair table, not trigram
    marginals)."""
    import math
    from collections import Counter

    from data_integration_est_spark.ops.text import trigram_logprob_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "dog barks"),                # < 3 tokens: absent from output
        (4, "on the mat the cat sat on"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in trigram_logprob_scores(df).collect()}

    allp, allt, trip_by_doc = [], [], {}
    for i, t in rows:
        toks = t.split()
        allp.extend(zip(toks, toks[1:]))
        ts = list(zip(toks, toks[1:], toks[2:]))
        if ts:
            trip_by_doc[i] = ts
            allt.extend(ts)
    ct = Counter(allt)
    cb = Counter(allp)
    cv = Counter(v for v, _ in allp)
    cw = Counter(w for _, w in allp)
    T = sum(cw.values())
    l3, l2, l1 = 0.5, 0.375, 0.125
    for i, ts in trip_by_doc.items():
        lps = [
            math.log(l3 * ct[t] / cb[(t[0], t[1])]
                     + l2 * cb[(t[1], t[2])] / cv[t[1]]
                     + l1 * cw[t[2]] / T)
            for t in ts
        ]
        assert got[i]["n_trigrams"] == len(ts)
        assert got[i]["avg_logprob3"] == pytest.approx(
            round(sum(lps) / len(lps), 6), abs=2e-6)
    assert 3 not in got
    # the repeated trigram context scores doc 2 above doc 1's mix
    with pytest.raises(ValueError, match="lams"):
        trigram_logprob_scores(df, lams=(0.5, 0.5, 0.5))


def test_contamination_flags_matches_scan(spark):
    """r7: the map-only/streaming form must produce contamination_scan's
    exact numbers on both key paths, and refuse oversized benchmarks."""
    from data_integration_est_spark.ops.decontam import (
        contamination_flags, contamination_scan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    for exact in (True, False):
        want = {
            r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
            for r in contamination_scan(
                corpus, bench, n=5, frac_threshold=0.05, exact=exact
            ).collect()
        }
        got = {
            r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
            for r in contamination_flags(
                corpus, bench, n=5, frac_threshold=0.05, exact=exact
            ).collect()
        }
        assert got == want, exact
    with pytest.raises(ValueError, match="max_bench_grams"):
        contamination_flags(corpus, bench, max_bench_grams=1)
