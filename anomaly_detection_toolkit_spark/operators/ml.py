"""ML-method detectors re-expressed for Spark without sklearn.

Counterparts of ``/root/reference/src/anomaly_detection_toolkit/
ml_methods.py`` (IsolationForest / EllipticEnvelope wrappers; LOF is
a documented non-goal — kNN at 10^12 rows needs an ANN index, see
``similarity.py`` for the LSH machinery a production LOF would use):

- **fit on a bounded driver-side sample** (`df.sample(...)` →
  numpy; sklearn itself subsamples to 256 rows per isolation tree,
  so this matches the algorithm's own design, and is the standard
  cluster pattern for models whose fit is not distributable);
- **score distributed** via a scalar Arrow pandas UDF closing over
  the broadcast model arrays — vectorized tree traversal / matrix
  math per batch, no per-row Python;
- thresholds from the contamination percentile of training scores
  (the reference's decision_function offset re-expressed in our
  Detector protocol; exact sklearn offsets are not reproduced —
  documented divergence, same flagged fraction).

IsolationForest (Liu, Ting & Zhou 2008, public algorithm):
anomaly score = 2^(−E[path length]/c(ψ)); trees built on ψ=256-row
subsamples, split = uniform random in [min, max] of a random
feature. StandardScaler applied first (``ml_methods.py:61,69``).

RobustCovariance: deterministic C-step MCD (Rousseeuw & Van
Driessen 1999): start from the full-sample mean/cov, iterate
"keep the h lowest-Mahalanobis points, refit" until the support is
stable; score = Mahalanobis distance under the robust estimate
(``ml_methods.py:218-308`` semantics).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.base import (
    SCORE_COL,
    VERDICT_COL,
    Detector,
    validate_feature_cols,
)


def _collect_sample(
    df: DataFrame,
    cols: Sequence[str],
    max_rows: int,
    seed: int,
    order_col: str | None = None,
) -> np.ndarray:
    """Bounded driver-side sample as a float64 matrix (NaN rows
    dropped) in ONE scan — no count() pre-pass (the round-2 audit's
    extra-scan finding).

    Every row gets a deterministic priority = 60-bit md5 of its
    seed-salted feature values; the global ``max_rows``
    smallest-priority rows are taken via sort+limit, which Catalyst
    plans as TakeOrderedAndProject (per-partition top-k, then a
    single bounded merge — no full shuffle). Because the priority is
    derived from VALUES, not partition layout, the sample is
    identical under any repartitioning/cluster layout — the old
    ``sample().limit()`` pattern was layout-dependent. Rows with
    identical feature values share a priority and enter/leave the
    sample together; acceptable for sample-fit detectors (documented
    bias toward treating duplicates atomically).

    ``order_col`` switches the priority to a 60-bit md5 of the
    seed-salted KEY column instead of the feature values: still
    layout-independent, removes the duplicate-row atomicity bias
    (clean uniform sample), and — because integer→string casts are
    engine-stable — makes the sample order reproducible OUTSIDE
    Spark (the iForest driver-gate oracle re-derives it in DuckDB:
    ``entry_ml._iforest_oracle_sql``)."""
    vals = [F.col(c).cast("double") for c in cols]
    salt = (
        [F.col(order_col).cast("string")]
        if order_col is not None
        else [v.cast("string") for v in vals]
    )
    prio = F.conv(
        F.substring(
            F.md5(F.concat_ws(",", F.lit(str(seed)), *salt)),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    sdf = df.select(*vals, prio.alias("_prio"))
    x = (
        sdf.orderBy("_prio")
        .limit(max_rows)
        .drop("_prio")
        .toPandas()
        .to_numpy(dtype=np.float64)
    )
    return x[~np.isnan(x).any(axis=1)]


# ---------------------------------------------------------------------------
# Isolation forest
# ---------------------------------------------------------------------------


def _c_factor(n: int) -> float:
    """Average BST unsuccessful-search path length c(n)."""
    if n <= 1:
        return 0.0
    h = np.log(n - 1) + np.euler_gamma
    return float(2.0 * h - 2.0 * (n - 1) / n)


def _build_tree(x: np.ndarray, rng: np.random.Generator, depth_cap: int):
    """One isolation tree as parallel arrays:
    feature[i] (−1 = leaf), thresh[i], left[i], right[i], size[i]."""
    feature, thresh, left, right, size = [], [], [], [], []

    def grow(rows: np.ndarray, depth: int) -> int:
        idx = len(feature)
        feature.append(-1)
        thresh.append(0.0)
        left.append(-1)
        right.append(-1)
        size.append(len(rows))
        if depth >= depth_cap or len(rows) <= 1:
            return idx
        sub = x[rows]
        spans = sub.max(axis=0) - sub.min(axis=0)
        avail = np.where(spans > 0)[0]
        if not len(avail):
            return idx
        f = int(rng.choice(avail))
        lo, hi = sub[:, f].min(), sub[:, f].max()
        t = float(rng.uniform(lo, hi))
        mask = sub[:, f] < t
        feature[idx] = f
        thresh[idx] = t
        left[idx] = grow(rows[mask], depth + 1)
        right[idx] = grow(rows[~mask], depth + 1)
        return idx

    grow(np.arange(len(x)), 0)
    return (
        np.asarray(feature, dtype=np.int32),
        np.asarray(thresh, dtype=np.float64),
        np.asarray(left, dtype=np.int32),
        np.asarray(right, dtype=np.int32),
        np.asarray(size, dtype=np.int64),
    )


def _tree_path_lengths(tree, x: np.ndarray) -> np.ndarray:
    """Vectorized traversal: advance every row one level per loop
    iteration (≤ depth_cap iterations per tree, numpy all the way)."""
    feature, thresh, left, right, size = tree
    node = np.zeros(len(x), dtype=np.int32)
    depth = np.zeros(len(x), dtype=np.float64)
    active = feature[node] >= 0
    while active.any():
        f = feature[node[active]]
        t = thresh[node[active]]
        go_left = x[active, f] < t
        nxt = np.where(go_left, left[node[active]], right[node[active]])
        node[active] = nxt
        depth[active] += 1.0
        active = feature[node] >= 0
    leaf_sizes = size[node]
    adjust = np.array([_c_factor(int(s)) for s in np.unique(leaf_sizes)])
    lut = dict(zip(np.unique(leaf_sizes).tolist(), adjust.tolist()))
    return depth + np.vectorize(lut.get)(leaf_sizes)


def fit_forest_arrays(
    xs: np.ndarray, n_estimators: int, max_samples: int, seed: int
) -> tuple[list, int, int]:
    """Deterministic forest build on an ALREADY-standardized,
    ALREADY-ordered matrix: (trees, psi, depth_cap). Split out of
    ``IsolationForestDetector.fit`` so the driver-gate oracle can
    replay the identical fit outside Spark (``entry_ml``)."""
    rng = np.random.default_rng(seed)
    psi = min(max_samples, len(xs))
    depth_cap = int(np.ceil(np.log2(max(psi, 2))))
    trees = []
    for _ in range(n_estimators):
        rows = rng.choice(len(xs), size=psi, replace=False)
        trees.append(_build_tree(xs[rows], rng, depth_cap))
    return trees, psi, depth_cap


class IsolationForestDetector(Detector):
    """iForest: fit on sample, score via Arrow UDF. Parity target:
    ``ml_methods.py:15-110`` (scaling + contamination threshold)."""

    def __init__(
        self,
        n_estimators: int = 100,
        max_samples: int = 256,
        contamination: float = 0.05,
        max_fit_rows: int = 100_000,
        seed: int = 42,
        sample_order_col: str | None = None,
    ) -> None:
        super().__init__()
        self.n_estimators = n_estimators
        self.max_samples = max_samples
        self.contamination = contamination
        self.max_fit_rows = max_fit_rows
        self.seed = seed
        self.sample_order_col = sample_order_col
        self.trees_: list | None = None
        self.mean_: np.ndarray | None = None
        self.scale_: np.ndarray | None = None
        self.psi_: int = 0
        self.threshold_: float | None = None

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "IsolationForestDetector":
        cols = validate_feature_cols(df, cols)
        x = _collect_sample(
            df, cols, self.max_fit_rows, self.seed, self.sample_order_col
        )
        if len(x) < 2:
            raise ValueError("need ≥2 sample rows to fit")
        self.mean_ = x.mean(axis=0)
        sd = x.std(axis=0)
        sd[sd == 0] = 1.0
        self.scale_ = sd
        xs = (x - self.mean_) / self.scale_
        self.trees_, self.psi_, _ = fit_forest_arrays(
            xs, self.n_estimators, self.max_samples, self.seed
        )
        self.feature_cols = list(cols)
        self.is_fitted = True
        # contamination threshold from the training sample's scores
        train_scores = self._score_matrix(xs)
        self.threshold_ = float(
            np.percentile(train_scores, 100.0 * (1.0 - self.contamination))
        )
        return self

    def _score_matrix(self, xs: np.ndarray) -> np.ndarray:
        depths = np.zeros(len(xs))
        for tree in self.trees_:
            depths += _tree_path_lengths(tree, xs)
        mean_depth = depths / len(self.trees_)
        return np.power(2.0, -mean_depth / _c_factor(self.psi_))

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        mean, scale, trees, psi, n_trees = (
            self.mean_,
            self.scale_,
            self.trees_,
            self.psi_,
            len(self.trees_),
        )

        @F.pandas_udf("double")
        def score(*series: pd.Series) -> pd.Series:
            x = np.column_stack([s.to_numpy(dtype=np.float64) for s in series])
            xs = (x - mean) / scale
            depths = np.zeros(len(xs))
            for tree in trees:
                depths += _tree_path_lengths(tree, xs)
            return pd.Series(np.power(2.0, -(depths / n_trees) / _c_factor(psi)))

        out = df.withColumn(SCORE_COL, score(*[F.col(c) for c in self.feature_cols]))
        return out.withColumn(VERDICT_COL, self.verdict_from_score(F.col(SCORE_COL)))

    def score_expr(self) -> Column:  # pragma: no cover - UDF-based
        raise NotImplementedError("UDF-based; use transform()")

    def verdict_from_score(self, score: Column) -> Column:
        return (
            F.when(score > F.lit(self.threshold_), F.lit(-1)).otherwise(F.lit(1)).cast("int")
        )


# ---------------------------------------------------------------------------
# Robust covariance (deterministic C-step MCD)
# ---------------------------------------------------------------------------


class RobustCovarianceDetector(Detector):
    """Robust-Mahalanobis detector (``ml_methods.py:218-308``)."""

    def __init__(
        self,
        contamination: float = 0.05,
        support_fraction: float | None = None,
        max_fit_rows: int = 100_000,
        max_iter: int = 30,
        seed: int = 42,
    ) -> None:
        super().__init__()
        self.contamination = contamination
        self.support_fraction = support_fraction
        self.max_fit_rows = max_fit_rows
        self.max_iter = max_iter
        self.seed = seed
        self.location_: np.ndarray | None = None
        self.inv_cov_: np.ndarray | None = None
        self.threshold_: float | None = None

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "RobustCovarianceDetector":
        cols = validate_feature_cols(df, cols)
        x = _collect_sample(df, cols, self.max_fit_rows, self.seed)
        n, k = x.shape
        if n <= k:
            raise ValueError("need more sample rows than features")
        h = (
            int(np.ceil(self.support_fraction * n))
            if self.support_fraction
            else (n + k + 1) // 2
        )
        support = np.arange(n)
        for _ in range(self.max_iter):  # C-steps from full-set start
            mu = x[support].mean(axis=0)
            cov = np.cov(x[support].T, ddof=1).reshape(k, k)
            try:
                inv = np.linalg.inv(cov)
            except np.linalg.LinAlgError:
                inv = np.linalg.pinv(cov)
            d2 = np.einsum("ij,jk,ik->i", x - mu, inv, x - mu)
            new_support = np.argsort(d2, kind="stable")[:h]
            if np.array_equal(np.sort(new_support), np.sort(support)):
                break
            support = new_support
        mu = x[support].mean(axis=0)
        cov = np.cov(x[support].T, ddof=1).reshape(k, k)
        try:
            inv = np.linalg.inv(cov)
        except np.linalg.LinAlgError:
            inv = np.linalg.pinv(cov)
        self.location_, self.inv_cov_ = mu, inv
        self.feature_cols = list(cols)
        self.is_fitted = True
        d = np.sqrt(np.clip(np.einsum("ij,jk,ik->i", x - mu, inv, x - mu), 0, None))
        self.threshold_ = float(np.percentile(d, 100.0 * (1.0 - self.contamination)))
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        mu, inv = self.location_, self.inv_cov_

        @F.pandas_udf("double")
        def score(*series: pd.Series) -> pd.Series:
            x = np.column_stack([s.to_numpy(dtype=np.float64) for s in series])
            d2 = np.einsum("ij,jk,ik->i", x - mu, inv, x - mu)
            return pd.Series(np.sqrt(np.clip(d2, 0.0, None)))

        out = df.withColumn(SCORE_COL, score(*[F.col(c) for c in self.feature_cols]))
        return out.withColumn(VERDICT_COL, self.verdict_from_score(F.col(SCORE_COL)))

    def score_expr(self) -> Column:  # pragma: no cover - UDF-based
        raise NotImplementedError("UDF-based; use transform()")

    def verdict_from_score(self, score: Column) -> Column:
        return (
            F.when(score > F.lit(self.threshold_), F.lit(-1)).otherwise(F.lit(1)).cast("int")
        )
