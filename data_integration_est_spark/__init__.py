"""data_integration_est_spark — a PySpark-native data-integration estimation engine.

A from-scratch, Spark-first re-implementation of the query and data-processing
capabilities of the reference repository ``JoseAndReyes/data_integration_est``
(an R survey/dplyr library implementing the RegDI calibration estimator of
Kim & Tam (2021) and the PC pseudo-calibration estimator of Golini & Righi
(2024), plus a Monte Carlo simulation harness).

Architecture (see SURVEY.md for the full blueprint):

- All O(N) work is expressed as lazy DataFrame transformations; only
  O(k^2 * groups) Gram-matrix aggregates reach the driver (k = number of
  calibration/model columns, <= ~10 in every reference usage).
- GREG calibration / OLS / logistic-IRLS are implemented as a shared
  Gram-aggregation kernel (one ``df.agg`` producing the k x k cross-product
  matrix) + a tiny numpy solve on the driver + a broadcast of the k-vector
  back into a column expression.  No row-level Python UDFs anywhere in the
  estimator hot path.
- Monte Carlo replication is vectorized: ``sim_id`` (and grid parameters)
  become key columns of ONE DataFrame and every kernel accepts
  ``group_cols`` so the whole replicate grid runs as a single Spark job.
"""

from data_integration_est_spark.design import SurveyDesign, CalibrationSpec
from data_integration_est_spark.formula import Formula
from data_integration_est_spark.integrate import integrate_samples, IntegratedData
from data_integration_est_spark.estimators.regdi import regdi, RegDIResult
from data_integration_est_spark.estimators.pc import pc_estimator, PCResult
from data_integration_est_spark.montecarlo import (
    run_nmar_study, run_contaminated_study, run_nmar_v2_study,
    run_stratified_study, run_deterministic_study, MCResult, NMARv2Result,
)
from data_integration_est_spark.ops.asof import asof_join
from data_integration_est_spark.ops.components import (
    connected_components, dedup_keep_representative,
)
from data_integration_est_spark.ops.bpe import bpe_segment, learn_bpe
from data_integration_est_spark.ops.decontam import (
    contamination_flags, contamination_scan, decontaminate, decontaminate_neardup,
    neardup_contamination,
)
from data_integration_est_spark.ops.dedup import (
    dedup_corpus,
    duplicated_span_dedup,
    line_dedup,
)
from data_integration_est_spark.ops.heavy_hitters import (
    heavy_hitters, heavy_hitters_by, misra_gries_candidates,
)
from data_integration_est_spark.ops.mixing import (
    cap_per_key, hash_split, keep_top_fraction, source_mixture,
    temperature_sample, token_budget_mixture,
)
from data_integration_est_spark.estimators.domains import pc_by, regdi_by
from data_integration_est_spark.estimators.glm import svyglm
from data_integration_est_spark.estimators.twophase import twophase_regression_mean
from data_integration_est_spark.kernels.stats import design_effect, pairwise_corr, svycov
from data_integration_est_spark.ops.outliers import mad_outlier_flags
from data_integration_est_spark.ops.mixing import shuffle_shards
from data_integration_est_spark.kernels.quantile import (
    svyquantile, trim_weights, trimmed_mean,
)
from data_integration_est_spark.kernels.stats import (
    svyby, svychisq_rao_scott, svyciprop, svymean, svyratio, svytotal,
)
from data_integration_est_spark.ops.pq import pq_encode, pq_knn, pq_train
from data_integration_est_spark.ops.text import (
    bigram_logprob_scores,
    clean_text,
    line_language_mix,
    trigram_logprob_scores,
    unigram_logprob_scores,
)
from data_integration_est_spark.kernels.rake import poststratify, rake
from data_integration_est_spark.kernels.replicate import (
    brr_mean,
    jackknife_mean,
    jackknife_psu_calibrated_mean,
    poisson_bootstrap_mean,
)
from data_integration_est_spark.ops.packing import (
    bin_stats, chunk_documents, chunk_occupancy, pack_bins, pack_chunks,
)
from data_integration_est_spark.ops.pii import pii_scan
from data_integration_est_spark.ops.quality_rep import repetition_stats
from data_integration_est_spark.ops.range_join import range_join_points
from data_integration_est_spark.kernels.linalg import calibrate, calibrate_bounded, calibrate_raking
from data_integration_est_spark.ops.crossval import kfold_cv_logistic
from data_integration_est_spark.ops.quality_model import classifier_quality_cut
from data_integration_est_spark.ops.semdedup import semdedup, semdedup_flags
from data_integration_est_spark.ops.sketches import (
    hll_count_distinct, hll_estimate, hll_merge, hll_registers,
)
from data_integration_est_spark.ops.bloom import (
    bloom_build, bloom_contains, bloom_merge, bloom_stats,
)
from data_integration_est_spark.ops.cms import (
    cms_build, cms_merge, cms_query,
)
from data_integration_est_spark.ops.dsir import (
    dsir_importance_weights, dsir_resample, dsir_resample_by,
)
from data_integration_est_spark.ops.timeseries import resample_timeseries
from data_integration_est_spark.ops.collocations import pmi_collocations
from data_integration_est_spark.ops.qsketch import (
    qhist_build, qhist_merge, qhist_quantiles,
)
from data_integration_est_spark.estimators.ipw import propensity_weighted_mean
from data_integration_est_spark.estimators.vectorized import clw_grouped
from data_integration_est_spark.estimators.sae import fay_herriot
from data_integration_est_spark.ops.fs_linkage import fs_classify, fs_em
from data_integration_est_spark.ops.nn_impute import nn_impute, nn_mass_mean
from data_integration_est_spark.ops.profile import profile
from data_integration_est_spark.ops.scd import scd2_merge, snapshot_diff
from data_integration_est_spark.session import get_spark
from data_integration_est_spark.streaming.docs import curate_docs, ingest_summary

__all__ = [
    "SurveyDesign",
    "CalibrationSpec",
    "Formula",
    "integrate_samples",
    "IntegratedData",
    "regdi",
    "RegDIResult",
    "pc_estimator",
    "PCResult",
    "run_nmar_study",
    "run_contaminated_study",
    "run_nmar_v2_study",
    "run_stratified_study",
    "MCResult",
    "NMARv2Result",
    "run_deterministic_study",
    "asof_join",
    "range_join_points",
    "connected_components",
    "dedup_keep_representative",
    "contamination_scan",
    "contamination_flags",
    "twophase_regression_mean",
    "mad_outlier_flags",
    "pairwise_corr",
    "design_effect",
    "svycov",
    "shuffle_shards",
    "decontaminate",
    "line_dedup",
    "duplicated_span_dedup",
    "dedup_corpus",
    "heavy_hitters",
    "heavy_hitters_by",
    "misra_gries_candidates",
    "cap_per_key",
    "keep_top_fraction",
    "token_budget_mixture",
    "hash_split",
    "source_mixture",
    "temperature_sample",
    "pack_chunks",
    "chunk_occupancy",
    "chunk_documents",
    "pack_bins",
    "bin_stats",
    "poststratify",
    "rake",
    "svyquantile",
    "trim_weights",
    "brr_mean",
    "jackknife_mean",
    "jackknife_psu_calibrated_mean",
    "poisson_bootstrap_mean",
    "regdi_by",
    "pc_by",
    "svyglm",
    "pii_scan",
    "learn_bpe",
    "bpe_segment",
    "neardup_contamination",
    "decontaminate_neardup",
    "clean_text",
    "trimmed_mean",
    "svyby",
    "svymean",
    "svytotal",
    "svyratio",
    "svyciprop",
    "svychisq_rao_scott",
    "pq_train",
    "pq_encode",
    "pq_knn",
    "calibrate",
    "calibrate_bounded",
    "calibrate_raking",
    "curate_docs",
    "ingest_summary",
    "unigram_logprob_scores",
    "bigram_logprob_scores",
    "trigram_logprob_scores",
    "line_language_mix",
    "repetition_stats",
    "semdedup",
    "semdedup_flags",
    "classifier_quality_cut",
    "kfold_cv_logistic",
    "hll_count_distinct",
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "bloom_build",
    "bloom_contains",
    "bloom_merge",
    "bloom_stats",
    "cms_build",
    "cms_merge",
    "cms_query",
    "dsir_importance_weights",
    "dsir_resample",
    "dsir_resample_by",
    "resample_timeseries",
    "pmi_collocations",
    "qhist_build",
    "qhist_merge",
    "qhist_quantiles",
    "fay_herriot",
    "propensity_weighted_mean",
    "clw_grouped",
    "fs_em",
    "fs_classify",
    "nn_impute",
    "nn_mass_mean",
    "profile",
    "snapshot_diff",
    "scd2_merge",
    "get_spark",
]

__version__ = "0.1.0"
