"""Statistical detectors: z-score, IQR fences, seasonal baseline.

Spark-first re-expressions of the reference's statistical family
(``/root/reference/src/anomaly_detection_toolkit/statistical.py``):

- fit = a single ``HashAggregate`` pass (all sibling aggregates fused
  by Catalyst) collecting a few scalars per feature column;
- transform = whole-stage-codegen projections closing over the fitted
  scalars as literals;
- the seasonal detector's fitted state is a tiny (≤ 366 rows) stats
  dimension table applied with an explicit **broadcast hash join** —
  the 10^12-row-safe plan (no shuffle of the fact side).

Semantics parity notes (oracle-checked):
- z-score uses **population** stddev (``np.std`` ddof=0 at
  ``statistical.py:68``) → ``stddev_pop``; zero-std → 1.0 guard
  (``statistical.py:69-70``).
- IQR quantiles use linear interpolation (``np.percentile`` at
  ``statistical.py:129-130``) → exact ``percentile``; at huge scale
  callers may opt into ``percentile_approx`` (documented tolerance).
- seasonal stats use **sample** stddev (pandas groupby ``std`` ddof=1
  at ``statistical.py:233``) → ``stddev_samp``; NaN/0 std → 1.0;
  unseen seasonal keys score 0.0 (``statistical.py:291-297``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.base import (
    SCORE_COL,
    VERDICT_COL,
    Detector,
    validate_feature_cols,
    verdict_expr,
)


def _guarded(value: float | None, *, zero_to_one: bool = True) -> float:
    """Replicate the reference's zero/NaN-scale guards driver-side."""
    if value is None or value != value:  # None or NaN
        return 1.0
    if zero_to_one and value == 0.0:
        return 1.0
    return float(value)


class ZScoreDetector(Detector):
    """Max-over-features |(x-μ)/σ| vs a sigma threshold.

    Parity: ``statistical.py:32-95`` (fit μ/σ_pop per feature with
    σ=0→1 guard; score = row-wise max abs z; verdict -1 iff score >
    threshold).
    """

    def __init__(self, threshold: float = 3.0) -> None:
        super().__init__()
        self.threshold = threshold
        self.mean_: dict[str, float] = {}
        self.std_: dict[str, float] = {}

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "ZScoreDetector":
        cols = validate_feature_cols(df, cols)
        aggs = []
        for c in cols:
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"mu_{c}"))
            aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"sd_{c}"))
        row = df.agg(*aggs).first()
        self.mean_ = {c: float(row[f"mu_{c}"]) for c in cols}
        self.std_ = {c: _guarded(row[f"sd_{c}"]) for c in cols}
        self.feature_cols = list(cols)
        self.is_fitted = True
        return self

    def zscore_exprs(self) -> list[Column]:
        self._check_fitted()
        return [
            F.abs((F.col(c).cast("double") - F.lit(self.mean_[c])) / F.lit(self.std_[c]))
            for c in self.feature_cols
        ]

    def score_expr(self) -> Column:
        zs = self.zscore_exprs()
        return zs[0] if len(zs) == 1 else F.greatest(*zs)

    def verdict_from_score(self, score: Column) -> Column:
        return verdict_expr(score, self.threshold, strict=True)


class IQROutlierDetector(Detector):
    """Tukey-fence outlier flags; score ∈ {0.0, 1.0}.

    Parity: ``statistical.py:98-171`` (Q1/Q3 linear-interp percentile,
    IQR=0→1 guard, score 1.0 iff ANY feature outside
    [Q1-f·IQR, Q3+f·IQR], verdict -1 iff score >= 1.0).

    ``exact=True`` uses Spark's exact ``percentile`` (sort-based; fine
    up to ~10^9 rows/col). At 10^12 set ``exact=False`` →
    ``approx_percentile`` with ``accuracy`` (error ≤ 1/accuracy
    rank-fraction), recorded in the fitted state for metrics rows.
    """

    def __init__(self, factor: float = 1.5, exact: bool = True, accuracy: int = 10000) -> None:
        super().__init__()
        self.factor = factor
        self.exact = exact
        self.accuracy = accuracy
        self.q1_: dict[str, float] = {}
        self.q3_: dict[str, float] = {}
        self.iqr_: dict[str, float] = {}

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "IQROutlierDetector":
        cols = validate_feature_cols(df, cols)
        aggs = []
        for c in cols:
            col = F.col(c).cast("double")
            if self.exact:
                q = F.percentile(col, F.lit([0.25, 0.75]))
            else:
                q = F.percentile_approx(col, F.lit([0.25, 0.75]), F.lit(self.accuracy))
            aggs.append(q.alias(f"q_{c}"))
        row = df.agg(*aggs).first()
        for c in cols:
            q1, q3 = row[f"q_{c}"]
            self.q1_[c] = float(q1)
            self.q3_[c] = float(q3)
            self.iqr_[c] = _guarded(q3 - q1)
        self.feature_cols = list(cols)
        self.is_fitted = True
        return self

    def outside_expr(self, c: str) -> Column:
        lo = self.q1_[c] - self.factor * self.iqr_[c]
        hi = self.q3_[c] + self.factor * self.iqr_[c]
        col = F.col(c).cast("double")
        return (col < F.lit(lo)) | (col > F.lit(hi))

    def score_expr(self) -> Column:
        self._check_fitted()
        any_out = self.outside_expr(self.feature_cols[0])
        for c in self.feature_cols[1:]:
            any_out = any_out | self.outside_expr(c)
        # NULL feature → NULL comparison → treat as not-outlier (0.0),
        # matching NaN falling through numpy comparisons.
        return F.when(any_out, F.lit(1.0)).otherwise(F.lit(0.0))

    def verdict_from_score(self, score: Column) -> Column:
        return verdict_expr(score, 1.0, strict=False)


# Key names mirror the reference's seasonality_map (statistical.py:205-210)
SEASONAL_KEYS = {
    "week": lambda ts: F.weekofyear(ts),
    "month": lambda ts: F.month(ts),
    "day": lambda ts: F.dayofyear(ts),
    "hour": lambda ts: F.hour(ts),
}


class SeasonalBaselineDetector(Detector):
    """Per-seasonal-key baseline z-score.

    Parity: ``statistical.py:174-297``. fit = grouped agg (mean +
    **stddev_samp**, NaN/0→1.0) producing a tiny stats dim table;
    transform = broadcast left join on the seasonal key + |z|
    expression with unseen-key → 0.0.

    Scale: the stats table has ≤ 366 rows regardless of input size →
    broadcast join; the fact side is never shuffled.
    """

    def __init__(self, season: str = "week", threshold_sigma: float = 3.0) -> None:
        super().__init__()
        if season not in SEASONAL_KEYS:
            raise ValueError(f"season must be one of {sorted(SEASONAL_KEYS)}")
        self.season = season
        self.threshold_sigma = threshold_sigma
        self.stats_: DataFrame | None = None
        self.date_col = "ts"
        self.value_col = "value"

    def seasonal_key(self, ts_col: str | Column) -> Column:
        ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
        return SEASONAL_KEYS[self.season](ts).alias("seasonal_key")

    def fit(
        self, df: DataFrame, cols: Sequence[str] = ("value",), date_col: str = "ts"
    ) -> "SeasonalBaselineDetector":
        value_col = cols[0] if not isinstance(cols, str) else cols
        self.date_col, self.value_col = date_col, value_col
        v = F.col(value_col).cast("double")
        self.stats_ = (
            df.groupBy(self.seasonal_key(date_col))
            .agg(
                F.avg(v).alias("seasonal_mean"),
                # pandas groupby .std() is ddof=1; single-row groups
                # yield NaN → NULL here → coalesce to 1.0; 0.0 → 1.0.
                F.stddev_samp(v).alias("sd_raw"),
            )
            .select(
                "seasonal_key",
                "seasonal_mean",
                F.when(
                    F.coalesce(F.col("sd_raw"), F.lit(0.0)) == 0.0, F.lit(1.0)
                ).otherwise(F.col("sd_raw")).alias("seasonal_std"),
            )
        )
        self.feature_cols = [value_col]
        self.is_fitted = True
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        assert self.stats_ is not None
        keyed = df.withColumn("seasonal_key", self.seasonal_key(self.date_col))
        joined = keyed.join(F.broadcast(self.stats_), "seasonal_key", "left")
        z = F.abs(
            (F.col(self.value_col).cast("double") - F.col("seasonal_mean"))
            / F.col("seasonal_std")
        )
        scored = joined.withColumn(SCORE_COL, F.coalesce(z, F.lit(0.0)))
        return scored.withColumn(
            VERDICT_COL, verdict_expr(F.col(SCORE_COL), self.threshold_sigma, strict=True)
        ).drop("seasonal_mean", "seasonal_std")

    def score_expr(self) -> Column:  # pragma: no cover - join-based
        raise NotImplementedError("seasonal scoring is join-based; use transform()")

    def verdict_from_score(self, score: Column) -> Column:
        return verdict_expr(score, self.threshold_sigma, strict=True)
