"""Sources: driver testdata loaders + synthetic north-star image table."""

from anomaly_detection_toolkit_spark.sources.testdata import TABLES, load_table  # noqa: F401
