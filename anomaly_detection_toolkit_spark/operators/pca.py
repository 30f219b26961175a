"""PCA anomaly detector: distributed fit, Arrow-batched scoring.

Spark-first re-expression of ``/root/reference/src/
anomaly_detection_toolkit/pca_detector.py`` with NO sklearn:

fit (two jobs, SURVEY §4.2 two-pass pattern):
1. **Sufficient statistics** — one ``mapInPandas`` pass emits per
   Arrow-batch partials ``(n, Σx, Σ xxᵀ)`` (k + k² doubles per
   batch); the driver reduces ~numPartitions tiny rows with numpy —
   the treeAggregate-style Gram reduction from SURVEY §4.2.3. The
   driver never sees more than (batches × k²) numbers.
2. Driver-side closed forms: StandardScaler stats (mean, population
   std, zero→1 guard like sklearn's ``scale_``), covariance of the
   scaled data from the raw moments, ``numpy.linalg.eigh`` for
   components (same eigenvectors sklearn's SVD finds; variance
   ratios are scale-invariant so component selection matches),
   PC-space mean (exactly 0 by construction) and covariance
   (diag of (n-1)-normalized eigenvalues, = ``np.cov`` of the
   projected data in exact arithmetic).
3. **Threshold pass** — score the training frame and take the
   ``100·(1-contamination)`` percentile (``pca_detector.py:81``).

scoring: a scalar Arrow pandas UDF closing over the broadcast
(μ, σ, V, Σ⁻¹) — matrix multiplies per batch, never per row
(``pca_detector.py:140-160``):
- reconstruction: ‖x_s − x_s V Vᵀ‖²  (V orthonormal ⇒ no explicit
  inverse_transform needed)
- mahalanobis: sqrt(diag(P Σ⁻¹ Pᵀ)) with pinv fallback on singular Σ
- both: min-max normalize each over the DATASET then average
  (``pca_detector.py:162-173``) — needs one extra min/max agg job,
  genuinely unfusable.

Component sign is fixed deterministically (largest-|loading| entry
made positive, sklearn's ``svd_flip`` convention) so transforms are
reproducible across runs; reconstruction/Mahalanobis are
sign-invariant anyway.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anomaly_detection_toolkit_spark.operators.base import (
    SCORE_COL,
    VERDICT_COL,
    Detector,
    validate_feature_cols,
)


def _suff_stats(df: DataFrame, cols: Sequence[str]) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed (n, Σx, Σ xxᵀ) over the feature columns.

    One narrow scan; per Arrow batch the partial is k + k² doubles,
    reduced on the driver. NULL-containing rows are dropped (the
    reference's float64 matrix has no notion of missing rows)."""
    k = len(cols)
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("g", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = pdf.to_numpy(dtype=np.float64)
            x = x[~np.isnan(x).any(axis=1)]
            if not len(x):
                continue
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = df.select(*[F.col(c).cast("double") for c in cols]).mapInPandas(
        partials, schema=schema
    ).collect()
    if not rows:
        raise ValueError("no complete rows to fit on")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(k, k) for r in rows], axis=0)
    return int(n), s, g


class PCADetector(Detector):
    """See module docstring. Parity: ``pca_detector.py:13-249``."""

    def __init__(
        self,
        n_components: float | int = 0.95,
        score_method: str = "reconstruction",
        contamination: float = 0.05,
        exact_percentile: bool = True,
    ) -> None:
        super().__init__()
        if score_method not in ("reconstruction", "mahalanobis", "both"):
            raise ValueError(f"Unknown score_method: {score_method}")
        self.n_components = n_components
        self.score_method = score_method
        self.contamination = contamination
        self.exact_percentile = exact_percentile
        self.mean_: np.ndarray | None = None  # scaler mean
        self.scale_: np.ndarray | None = None  # scaler std (pop, 0→1)
        self.components_: np.ndarray | None = None  # (k_sel, k)
        self.explained_variance_: np.ndarray | None = None
        self.explained_variance_ratio_: np.ndarray | None = None
        self.pc_cov_: np.ndarray | None = None
        self.pc_inv_cov_: np.ndarray | None = None
        self.threshold_: float | None = None
        self._minmax: tuple[float, float, float, float] | None = None

    # -- fit ----------------------------------------------------------

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "PCADetector":
        cols = validate_feature_cols(df, cols)
        n, s, g = _suff_stats(df, cols)
        if n < 2:
            raise ValueError("need at least 2 rows to fit PCA")
        mu = s / n
        # population variance (sklearn StandardScaler semantics)
        var = np.clip(np.diag(g) / n - mu**2, 0.0, None)
        scale = np.sqrt(var)
        scale[scale == 0.0] = 1.0  # sklearn's zero-variance guard
        # covariance of the SCALED data from raw moments:
        # cov_raw = G/n − μμᵀ ; cov_scaled = D⁻¹ cov_raw D⁻¹
        cov_raw = g / n - np.outer(mu, mu)
        d_inv = 1.0 / scale
        cov_scaled = cov_raw * np.outer(d_inv, d_inv)
        evals, evecs = np.linalg.eigh(cov_scaled)  # ascending
        order = np.argsort(evals)[::-1]
        evals = np.clip(evals[order], 0.0, None)
        evecs = evecs[:, order]  # columns = components
        ratio = evals / evals.sum() if evals.sum() > 0 else np.full_like(evals, 1.0 / len(evals))
        if isinstance(self.n_components, int) and not isinstance(self.n_components, bool):
            k_sel = min(self.n_components, len(evals))
        else:
            k_sel = int(np.searchsorted(np.cumsum(ratio), self.n_components, side="right")) + 1
            k_sel = min(k_sel, len(evals))
        v = evecs[:, :k_sel].T  # (k_sel, k)
        # deterministic sign (svd_flip convention)
        signs = np.sign(v[np.arange(k_sel), np.abs(v).argmax(axis=1)])
        signs[signs == 0] = 1.0
        v = v * signs[:, None]
        self.mean_, self.scale_, self.components_ = mu, scale, v
        # np.cov of projected data (ddof=1) == eigenvalues rescaled n/(n-1)
        lam = evals[:k_sel] * (n / (n - 1))
        self.explained_variance_ = lam
        self.explained_variance_ratio_ = ratio[:k_sel]
        if k_sel == 1:
            self.pc_cov_ = np.array([[lam[0]]])
        else:
            self.pc_cov_ = np.diag(lam)
        try:
            self.pc_inv_cov_ = np.linalg.inv(self.pc_cov_)
        except np.linalg.LinAlgError:
            self.pc_inv_cov_ = np.linalg.pinv(self.pc_cov_)
        self.feature_cols = list(cols)
        self.is_fitted = True
        # threshold pass (pca_detector.py:79-81)
        scored = self._with_score(df)
        q = 1.0 - self.contamination
        pct = (
            F.percentile(F.col(SCORE_COL), F.lit(q))
            if self.exact_percentile
            else F.percentile_approx(F.col(SCORE_COL), F.lit(q), F.lit(10000))
        )
        self.threshold_ = float(scored.agg(pct.alias("t")).first()["t"])
        return self

    # -- scoring kernels ---------------------------------------------

    def _score_batch(self, x: np.ndarray, method: str) -> np.ndarray:
        """Vectorized kernel over one Arrow batch (rows × features)."""
        xs = (x - self.mean_) / self.scale_
        p = xs @ self.components_.T
        if method == "reconstruction":
            resid = xs - p @ self.components_
            return np.einsum("ij,ij->i", resid, resid)
        diff = p  # PC-space mean is exactly 0 by construction
        m = np.einsum("ij,jk,ik->i", diff, self.pc_inv_cov_, diff)
        return np.sqrt(np.clip(m, 0.0, None))

    def _score_udf(self, method: str):
        # close over plain numpy arrays (small; serialized into the
        # UDF once — the broadcast-fitted-state pattern), never self
        mean, scale, comps = self.mean_, self.scale_, self.components_
        inv_cov = self.pc_inv_cov_

        @F.pandas_udf("double")
        def score(*series: pd.Series) -> pd.Series:
            x = np.column_stack([s.to_numpy(dtype=np.float64) for s in series])
            xs = (x - mean) / scale
            p = xs @ comps.T
            if method == "reconstruction":
                resid = xs - p @ comps
                return pd.Series(np.einsum("ij,ij->i", resid, resid))
            m = np.einsum("ij,jk,ik->i", p, inv_cov, p)
            return pd.Series(np.sqrt(np.clip(m, 0.0, None)))

        return score

    def _with_score(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        cols = [F.col(c) for c in self.feature_cols]
        if self.score_method in ("reconstruction", "mahalanobis"):
            return df.withColumn(
                SCORE_COL, self._score_udf(self.score_method)(*cols)
            )
        # 'both': min-max normalize each score over the dataset then
        # average (pca_detector.py:166-172) — extra min/max agg job
        scored = df.withColumn(
            "_recon", self._score_udf("reconstruction")(*cols)
        ).withColumn("_maha", self._score_udf("mahalanobis")(*cols))
        mm = scored.agg(
            F.min("_recon").alias("rmin"),
            F.max("_recon").alias("rmax"),
            F.min("_maha").alias("mmin"),
            F.max("_maha").alias("mmax"),
        ).first()
        eps = 1e-10
        rn = (F.col("_recon") - F.lit(mm["rmin"])) / F.lit(mm["rmax"] - mm["rmin"] + eps)
        mn = (F.col("_maha") - F.lit(mm["mmin"])) / F.lit(mm["mmax"] - mm["mmin"] + eps)
        return scored.withColumn(SCORE_COL, (rn + mn) / 2.0).drop("_recon", "_maha")

    # -- protocol -----------------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        scored = self._with_score(df)
        return scored.withColumn(
            VERDICT_COL,
            F.when(F.col(SCORE_COL) > F.lit(self.threshold_), F.lit(-1))
            .otherwise(F.lit(1))
            .cast("int"),
        )

    def score_expr(self) -> Column:  # pragma: no cover - UDF-based
        raise NotImplementedError("PCA scoring is UDF-based; use transform()")

    def verdict_from_score(self, score: Column) -> Column:
        return (
            F.when(score > F.lit(self.threshold_), F.lit(-1)).otherwise(F.lit(1)).cast("int")
        )

    def project(self, df: DataFrame, prefix: str = "pc_") -> DataFrame:
        """Append PC-space coordinates (``pca_detector.py:230-249``)."""
        self._check_fitted()
        mean, scale, comps = self.mean_, self.scale_, self.components_
        k_sel = comps.shape[0]

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def proj(*series: pd.Series) -> pd.Series:
            x = np.column_stack([s.to_numpy(dtype=np.float64) for s in series])
            p = ((x - mean) / scale) @ comps.T
            return pd.Series(list(p))

        out = df.withColumn("_pc", proj(*[F.col(c) for c in self.feature_cols]))
        for i in range(k_sel):
            out = out.withColumn(f"{prefix}{i}", F.col("_pc")[i])
        return out.drop("_pc")
