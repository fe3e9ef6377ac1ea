"""End-to-end training-data curation pipeline — the composition a user
switching to this engine actually runs, as ONE script over the test
corpus.  Stages (each an already-certified operator; this file is glue,
all counts come out of one JSON line):

  ingest -> clean/stats/lang-ID -> near-dedup (exact + MinHash-LSH +
  components) -> Bloom decontamination vs a benchmark slice ->
  per-source quality cut -> DSIR selection toward the English target
  (per-source quotas) -> deterministic train/val/test split ->
  shuffle-sharding for emission.

Usage:
    python tools/pipeline_demo.py [sf_dir] [--k-per-source N]

Prints one JSON line with per-stage row counts and settings — the
shape of a nightly curation report.  Every stage is deterministic
(hash-derived randomness only), so the whole pipeline reproduces
bit-for-bit across runs and engines.

Scale notes: stage order matters at 100 TB — dedup before decontam
(fewer docs probe the filter), decontam before the quality model
(don't spend scores on leaked eval data), selection last (budgets are
set against the CLEAN pool).  No stage collects the corpus: the
pipeline's only driver-side values are the stage counts below.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run_pipeline(spark, sf_dir: str, k_per_source: int = 10) -> dict:
    from data_integration_est_spark.ops.decontam import (
        bloom_contamination_flags,
    )
    from data_integration_est_spark.ops.dedup import dedup_corpus
    from data_integration_est_spark.ops.dsir import (
        dsir_importance_weights, dsir_resample_by,
    )
    from data_integration_est_spark.ops.mixing import (
        hash_split, keep_top_fraction, shuffle_shards,
    )
    from data_integration_est_spark.ops.text import (
        language_id, quality_score,
    )

    out: dict = {"sf_dir": sf_dir, "k_per_source": k_per_source}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["n_ingested"] = docs.count()

    # 1. enrich: quality heuristics + language ID (pure column exprs)
    docs = quality_score(language_id(docs))

    # 2. near-dedup: exact collapse -> MinHash/LSH -> Jaccard verify ->
    #    components keep-rep (one call; all certified pieces)
    docs = dedup_corpus(docs, threshold=0.8)
    out["n_after_dedup"] = docs.count()

    # 3. decontamination: the held-out "benchmark" is a deterministic
    #    slice of the corpus (stands in for an eval suite); membership
    #    rides the portable Bloom filter, so the SAME word table could
    #    be consulted by any ingesting engine
    bench = docs.filter(F.col("doc_id") % 97 == 3).select("doc_id", "text")
    flagged = bloom_contamination_flags(
        docs, bench, n=5, n_bits=1 << 22, n_hashes=5
    )
    docs = flagged.filter(F.col("contaminated") == 0).drop(
        "n_grams", "n_hits", "contamination_frac", "contaminated"
    )
    out["n_after_decontam"] = docs.count()

    # 4. per-source quality cut (scores only comparable within a source)
    docs = keep_top_fraction(docs, "quality", 0.8, key_cols="source")
    out["n_after_quality_cut"] = docs.count()

    # 5. DSIR selection toward the English slice, per-source quotas so
    #    no source eats the budget; deterministic Gumbel race
    target = docs.filter(F.col("lang_pred") == "en")
    w = dsir_importance_weights(docs, target, n_buckets=4096)
    w = w.join(docs.select("doc_id", "source"), "doc_id")
    chosen = dsir_resample_by(w, k_per_source, "source")
    selected = docs.join(chosen.select("doc_id"), "doc_id")
    out["n_selected"] = selected.count()

    # 6. stable split + emission sharding (pure hash maps; the split
    #    never migrates a doc between train and eval across reruns)
    final = shuffle_shards(
        hash_split(selected, {"train": 0.9, "val": 0.05, "test": 0.05}),
        n_shards=8,
    )
    splits = {
        r["split"]: r["n"]
        for r in final.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["splits"] = splits
    out["n_shards"] = final.select("shard").distinct().count()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    k = 10
    if "--k-per-source" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k-per-source") + 1])
    from data_integration_est_spark.session import get_spark

    spark = get_spark(app_name="pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_pipeline(spark, sf_dir, k)))


if __name__ == "__main__":
    main()
