"""Driver-contract queries for the PCA detector (SURVEY §2 ops
15-21). Eigendecomposition is not ANSI-SQL-expressible, so these are
rows-only checks (the driver's weaker gate); exact numerical parity
vs the reference math is covered by ``tests/test_pca.py`` golden
tests against a numpy re-implementation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register
from anomaly_detection_toolkit_spark.operators.pca import PCADetector
from anomaly_detection_toolkit_spark.sources.testdata import load_table

_PCA_DIMS = 8  # leading embedding dims as feature columns


def _embedding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "embeddings", sf_dir)
    return df.select(
        "vec_id",
        *[F.col("embedding")[i].cast("double").alias(f"f{i}") for i in range(_PCA_DIMS)],
    )


@register("pca_reconstruction_embeddings")  # rows-only: eigh not in SQL
def pca_reconstruction_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _embedding_features(spark, sf_dir)
    det = PCADetector(n_components=0.8, score_method="reconstruction").fit(
        feats, [f"f{i}" for i in range(_PCA_DIMS)]
    )
    return det.transform(feats).select(
        "vec_id", r4(F.col("score")).alias("score"), "verdict"
    )


@register("pca_mahalanobis_embeddings")  # rows-only: eigh not in SQL
def pca_mahalanobis_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _embedding_features(spark, sf_dir)
    det = PCADetector(n_components=4, score_method="mahalanobis").fit(
        feats, [f"f{i}" for i in range(_PCA_DIMS)]
    )
    return det.transform(feats).select(
        "vec_id", r4(F.col("score")).alias("score"), "verdict"
    )
