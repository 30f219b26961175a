"""Predictive-maintenance models on Spark ML (SURVEY §2 ops 48-49,
53): RUL regression, failure classification, and the composite
per-asset process pipeline.

Counterparts of ``/root/reference/src/anomaly_detection_toolkit/
predictive_maintenance.py:226-449`` (sklearn RandomForests behind a
StandardScaler) built on ``pyspark.ml`` — distributed training, no
driver-side sample needed:

- pipeline = VectorAssembler → StandardScaler → RandomForest
  {Regressor, Classifier};
- RUL predictions are clipped at 0 (``:326``: "RUL cannot be
  negative") with ``greatest(0, prediction)``;
- the reference's 'degradation' fit mode converts targets with
  ``y = max(0, threshold − y)`` then falls back to regression
  (``:280-300``) — reproduced as a label expression;
- classifier probabilities come from the ``probability`` vector
  column (``predict_proba``, ``:420-449``).

``PMProcessPipeline`` (op-53, ``:659-762``): feature extraction →
latest-row-per-asset (``max_by`` semantics via a ranked window) →
RUL + failure probability + anomaly score on that row → threshold
alerts over all rows. Each sub-result is nullable: a missing/broken
stage yields NULL columns, never a job abort (the reference's
try/except→None re-expressed as data).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _pipeline(feature_cols: Sequence[str], model) -> Pipeline:
    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="_features_raw", handleInvalid="keep"
    )
    scaler = StandardScaler(
        inputCol="_features_raw", outputCol="_features", withMean=True, withStd=True
    )
    return Pipeline(stages=[assembler, scaler, model])


class RULEstimator:
    """Distributed RUL regression (``:226-334``)."""

    def __init__(
        self,
        method: str = "regression",
        n_estimators: int = 100,
        max_depth: int | None = None,
        seed: int = 42,
    ) -> None:
        if method not in ("regression", "degradation"):
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.seed = seed
        self.model_: PipelineModel | None = None
        self.feature_cols: list[str] = []

    def fit(
        self,
        df: DataFrame,
        feature_cols: Sequence[str],
        label_col: str = "rul",
        degradation_threshold: float | None = None,
    ) -> "RULEstimator":
        label = F.col(label_col).cast("double")
        if degradation_threshold is not None:
            # degradation → RUL conversion (:280-282)
            label = F.greatest(F.lit(0.0), F.lit(float(degradation_threshold)) - label)
        train = df.withColumn("_label", label).dropna(subset=["_label"])
        rf = RandomForestRegressor(
            featuresCol="_features",
            labelCol="_label",
            numTrees=self.n_estimators,
            maxDepth=self.max_depth or 10,
            seed=self.seed,
        )
        self.model_ = _pipeline(feature_cols, rf).fit(train)
        self.feature_cols = list(feature_cols)
        return self

    def predict(self, df: DataFrame, out_col: str = "rul_pred") -> DataFrame:
        if self.model_ is None:
            raise ValueError("Estimator must be fitted before prediction")
        out = self.model_.transform(df)
        return out.withColumn(
            out_col, F.greatest(F.lit(0.0), F.col("prediction"))  # RUL ≥ 0 (:326)
        ).drop("_features_raw", "_features", "prediction")


class FailureClassifier:
    """Distributed binary failure classification (``:337-449``)."""

    def __init__(
        self, n_estimators: int = 100, max_depth: int | None = None, seed: int = 42
    ) -> None:
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.seed = seed
        self.model_: PipelineModel | None = None
        self.feature_cols: list[str] = []

    def fit(
        self, df: DataFrame, feature_cols: Sequence[str], label_col: str = "binary_label"
    ) -> "FailureClassifier":
        train = df.withColumn("_label", F.col(label_col).cast("double")).dropna(
            subset=["_label"]
        )
        rf = RandomForestClassifier(
            featuresCol="_features",
            labelCol="_label",
            numTrees=self.n_estimators,
            maxDepth=self.max_depth or 10,
            seed=self.seed,
        )
        self.model_ = _pipeline(feature_cols, rf).fit(train)
        self.feature_cols = list(feature_cols)
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        """Append ``failure_pred`` (0/1) and ``failure_proba``
        (P[class 1], the ``predict_proba`` channel)."""
        if self.model_ is None:
            raise ValueError("Classifier must be fitted before prediction")
        out = self.model_.transform(df)
        return (
            out.withColumn("failure_pred", F.col("prediction").cast("int"))
            .withColumn("failure_proba", vector_to_array(F.col("probability"))[1])
            .drop("_features_raw", "_features", "prediction", "rawPrediction", "probability")
        )


class PMProcessPipeline:
    """Composite per-asset process (op-53, ``:659-762``): score the
    LATEST cycle per asset with RUL + failure probability + anomaly
    verdict; alerts run over all rows via ``alerts.check_thresholds``.
    Null-on-missing-model semantics, never aborts."""

    def __init__(
        self,
        rul: RULEstimator | None = None,
        classifier: FailureClassifier | None = None,
        anomaly_detector=None,
        thresholds: dict[str, dict[str, float]] | None = None,
    ) -> None:
        self.rul = rul
        self.classifier = classifier
        self.anomaly_detector = anomaly_detector
        self.thresholds = thresholds or {}

    def process(
        self, df: DataFrame, asset_col: str = "asset_id", cycle_col: str = "cycle"
    ) -> tuple[DataFrame, DataFrame | None]:
        """Returns (results_df, alerts_df|None); results has one row
        per asset (the latest cycle) with nullable model outputs."""
        w = Window.partitionBy(asset_col).orderBy(F.col(cycle_col).desc())
        latest = df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
        out = latest
        if self.rul is not None and self.rul.model_ is not None:
            out = self.rul.predict(out)
        else:
            out = out.withColumn("rul_pred", F.lit(None).cast("double"))
        if self.classifier is not None and self.classifier.model_ is not None:
            out = self.classifier.predict(out)
        else:
            out = out.withColumn("failure_pred", F.lit(None).cast("int")).withColumn(
                "failure_proba", F.lit(None).cast("double")
            )
        if self.anomaly_detector is not None and getattr(
            self.anomaly_detector, "is_fitted", False
        ):
            out = self.anomaly_detector.transform(out)
        else:
            out = out.withColumn("score", F.lit(None).cast("double")).withColumn(
                "verdict", F.lit(None).cast("int")
            )
        alerts_df = None
        if self.thresholds:
            from anomaly_detection_toolkit_spark.operators import alerts as alerts_mod

            alerts_df = alerts_mod.check_thresholds(
                df, self.thresholds, asset_col=asset_col, entity_cols=[cycle_col]
            )
        return out, alerts_df
