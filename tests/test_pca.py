"""PCA detector tests replicating ``/root/reference/tests/
test_pca_detector.py`` invariants plus golden parity against a local
numpy re-implementation of the reference math (sklearn-free)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.pca import PCADetector

K = 5


def _make_data():
    rng = np.random.default_rng(42)
    train = rng.standard_normal((200, K))
    test = rng.standard_normal((50, K))
    test[10:15] += 5.0
    return train, test


def _df(spark, x):
    cols = [f"f{i}" for i in range(x.shape[1])]
    rows = [(int(i), *[float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "idx long, " + ", ".join(f"{c} double" for c in cols))


FEATURES = [f"f{i}" for i in range(K)]


def numpy_reference_scores(train, test, n_components=0.95, method="reconstruction"):
    """The reference's math (StandardScaler + PCA + scores) in plain
    numpy — mirrors pca_detector.py:59-160 without sklearn."""
    mu, sd = train.mean(axis=0), train.std(axis=0)
    sd = np.where(sd == 0, 1.0, sd)
    xs = (train - mu) / sd
    cov = np.cov(xs.T, ddof=1) * (len(xs) - 1) / len(xs)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = np.clip(evals[order], 0, None), evecs[:, order]
    ratio = evals / evals.sum()
    if isinstance(n_components, int):
        k_sel = n_components
    else:
        k_sel = int(np.searchsorted(np.cumsum(ratio), n_components, side="right")) + 1
    v = evecs[:, :k_sel].T
    ts = (test - mu) / sd
    p = ts @ v.T
    if method == "reconstruction":
        resid = ts - p @ v
        return np.sum(resid**2, axis=1)
    lam = evals[:k_sel] * (len(xs) / (len(xs) - 1))
    m = np.sum((p / lam) * p, axis=1)
    return np.sqrt(m)


@pytest.fixture(scope="module")
def data(spark):
    train, test = _make_data()
    return train, test, _df(spark, train), _df(spark, test)


def test_reconstruction_scores_match_numpy(data):
    train, test, train_df, test_df = data
    det = PCADetector(n_components=0.95).fit(train_df, FEATURES)
    got = np.array(
        [r.score for r in det.transform(test_df).orderBy("idx").collect()]
    )
    want = numpy_reference_scores(train, test, 0.95, "reconstruction")
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    assert (got >= 0).all()


def test_mahalanobis_scores_match_numpy(data):
    train, test, train_df, test_df = data
    det = PCADetector(n_components=0.95, score_method="mahalanobis").fit(
        train_df, FEATURES
    )
    got = np.array(
        [r.score for r in det.transform(test_df).orderBy("idx").collect()]
    )
    want = numpy_reference_scores(train, test, 0.95, "mahalanobis")
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    assert (got >= 0).all()


def test_both_scores_in_unit_interval(data):
    _, _, train_df, test_df = data
    det = PCADetector(score_method="both").fit(train_df, FEATURES)
    scores = [r.score for r in det.transform(train_df).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_detects_injected_anomalies(data):
    _, _, train_df, test_df = data
    det = PCADetector(n_components=0.95).fit(train_df, FEATURES)
    out = det.transform(test_df).orderBy("idx").collect()
    flagged = {r.idx for r in out if r.verdict == -1}
    assert set(range(10, 15)) <= flagged
    assert all(r.verdict in (-1, 1) for r in out)


def test_n_components_int_vs_float(data):
    _, _, train_df, _ = data
    det_int = PCADetector(n_components=3).fit(train_df, FEATURES)
    assert det_int.components_.shape == (3, K)
    det_float = PCADetector(n_components=0.95).fit(train_df, FEATURES)
    # float mode keeps enough components for >= 95% variance
    assert det_float.explained_variance_ratio_.sum() >= 0.95
    assert det_float.components_.shape[1] == K


def test_transform_projection_shape(data):
    _, _, train_df, _ = data
    det = PCADetector(n_components=3).fit(train_df, FEATURES)
    out = det.project(train_df)
    assert {"pc_0", "pc_1", "pc_2"} <= set(out.columns)
    # projected columns have ~zero mean (centered in scaled space)
    means = out.agg(*[F.avg(f"pc_{i}") for i in range(3)]).first()
    assert all(abs(m) < 1e-9 for m in means)


def test_contamination_monotonicity(data):
    _, _, train_df, _ = data
    t_low = PCADetector(contamination=0.01).fit(train_df, FEATURES).threshold_
    t_high = PCADetector(contamination=0.2).fit(train_df, FEATURES).threshold_
    assert t_high < t_low  # more expected outliers → lower threshold


def test_invalid_method_raises():
    with pytest.raises(ValueError):
        PCADetector(score_method="bogus")


def test_zero_variance_column_guard(spark):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 2))
    x[:, 1] = 7.0  # constant column
    df = _df(spark, x)
    det = PCADetector(n_components=1).fit(df, ["f0", "f1"])
    scores = [r.score for r in det.transform(df).collect()]
    assert all(np.isfinite(s) for s in scores)
