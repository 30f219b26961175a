"""anomaly_detection_toolkit_spark — a PySpark-native validation engine.

A brand-new, idiomatic-Spark engine providing the query and
data-processing capabilities of the reference
``kylejones200/anomaly-detection-toolkit`` (a single-node NumPy
library), re-expressed as DataFrame aggregations, window functions and
Arrow-vectorized pandas UDFs, plus a schema + constraint validation
suite (column stats, uniqueness, referential, drift, payload checks)
over an image+caption table designed for 10^12-row scale.

Layout
------
- ``session``    : tuned SparkSession builders (local + cluster-shaped)
- ``operators``  : detectors (fit = aggregation job, transform =
                   closed-form expressions), PM feature extraction,
                   ensembles, evaluation, dedup, text, similarity
- ``sources``    : parquet/testdata loaders, synthetic image table
- ``functions``  : reusable column-expression builders
- ``plans``      : the validation suite, checks, resume ledger
- ``streaming``  : Structured Streaming sliding-buffer operators
"""

__version__ = "0.1.0"

from anomaly_detection_toolkit_spark.session import get_spark  # noqa: F401
