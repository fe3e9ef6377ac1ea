from data_integration_est_spark.kernels.gram import gram_aggregate, GramResult
from data_integration_est_spark.kernels.linalg import (
    CalibrationError,
    calibrate,
    calibrate_bounded,
    fit_logistic,
    fit_ols,
)
from data_integration_est_spark.kernels.stats import (
    svymean,
    svyratio,
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
    "fit_ols",
    "fit_logistic",
    "CalibrationError",
    "svymean",
    "svyratio",
    "svytable",
    "svychisq_pearson",
    "svytotal",
    "weighted_mean",
]
