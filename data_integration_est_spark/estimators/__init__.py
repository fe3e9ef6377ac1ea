from data_integration_est_spark.estimators.regdi import RegDIResult, regdi
from data_integration_est_spark.estimators.pc import PCResult, pc_estimator

__all__ = ["regdi", "RegDIResult", "pc_estimator", "PCResult"]
