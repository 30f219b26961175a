"""Operators: detector families + feature/dataflow operators.

Heavy submodules (Spark ML, numpy kernels) are imported lazily by
their users; this namespace re-exports the detector family roots.
"""

from anomaly_detection_toolkit_spark.operators.autoencoder import (  # noqa: F401
    WindowedAutoencoderDetector,
)
from anomaly_detection_toolkit_spark.operators.base import Detector  # noqa: F401
from anomaly_detection_toolkit_spark.operators.ensemble import (  # noqa: F401
    EnsembleDetector,
    VotingEnsemble,
)
from anomaly_detection_toolkit_spark.operators.ml import (  # noqa: F401
    IsolationForestDetector,
    RobustCovarianceDetector,
)
from anomaly_detection_toolkit_spark.operators.pca import PCADetector  # noqa: F401
from anomaly_detection_toolkit_spark.operators.statistical import (  # noqa: F401
    IQROutlierDetector,
    SeasonalBaselineDetector,
    ZScoreDetector,
)
