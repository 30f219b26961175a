"""Plans: the validation suite (checks, runner, resume ledger)."""

from anomaly_detection_toolkit_spark.plans.checks import (  # noqa: F401
    ColumnStatsCheck,
    DriftCheck,
    PayloadCheck,
    ReferentialCheck,
    SchemaCheck,
    UniquenessCheck,
)
from anomaly_detection_toolkit_spark.plans.runner import SuiteResult, run_suite  # noqa: F401
