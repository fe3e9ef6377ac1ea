from data_integration_est_spark.kernels.gram import gram_aggregate, GramResult
from data_integration_est_spark.kernels.linalg import (
    CalibrationError,
    calibrate,
    calibrate_bounded,
    calibrate_logit,
    calibrate_raking,
    fit_logistic,
    fit_poisson,
    fit_ols,
)
from data_integration_est_spark.kernels.special import chi2_sf, gammainc_q
from data_integration_est_spark.kernels.stats import (
    svyby,
    svychisq_rao_scott,
    svyciprop,
    svymean,
    svyratio,
    svyvar,
    svytable,
    svychisq_pearson,
    svytotal,
    weighted_mean,
)

__all__ = [
    "gram_aggregate",
    "GramResult",
    "calibrate",
    "calibrate_bounded",
    "calibrate_logit",
    "calibrate_raking",
    "fit_ols",
    "fit_logistic",
    "fit_poisson",
    "CalibrationError",
    "svymean",
    "svyratio",
    "svyvar",
    "svytable",
    "svychisq_pearson",
    "svyby",
    "svychisq_rao_scott",
    "svyciprop",
    "chi2_sf",
    "gammainc_q",
    "svytotal",
    "weighted_mean",
]
