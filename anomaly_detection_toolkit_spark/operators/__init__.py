"""Operators: detector families + feature/dataflow operators."""

from anomaly_detection_toolkit_spark.operators.base import Detector  # noqa: F401
from anomaly_detection_toolkit_spark.operators.statistical import (  # noqa: F401
    IQROutlierDetector,
    SeasonalBaselineDetector,
    ZScoreDetector,
)
