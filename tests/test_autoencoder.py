"""Autoencoder seam (ops 30-31): the pluggable-reconstruction
detector must reproduce the reference's scale → window → score →
threshold → pad pipeline (autoencoders.py:93-245) around a dummy
numpy 'model', since TF/torch are the sanctioned non-goal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_toolkit_spark.operators import autoencoder as ae


def make_mean_model_factory():
    """Dummy 'autoencoder': reconstructs each window as its own mean —
    a 1-component projection, so residuals are real and nonzero.
    Built as a nested closure so cloudpickle ships it BY VALUE to the
    executors (a test-module-level def would pickle by reference and
    fail to import worker-side)."""

    def factory():
        return lambda wins: np.repeat(
            wins.mean(axis=1, keepdims=True), wins.shape[1], axis=1
        )

    return factory


def reference_replay(x: np.ndarray, w: int, k: float) -> tuple[np.ndarray, np.ndarray]:
    """The reference's single-series loop (autoencoders.py:135-245)
    with the same dummy model: MinMax scale, window, score, predict."""
    mn, mx = x.min(), x.max()
    xs = (x - mn) / (mx - mn) if mx > mn else np.zeros_like(x)
    n_w = len(xs) - w + 1
    scores = np.empty(n_w)
    for i in range(n_w):
        win = xs[i : i + w]
        rec = np.full(w, win.mean())
        scores[i] = np.abs(win - rec).mean()
    thr = scores.mean() + k * scores.std()
    verd = np.where(scores > thr, -1, 1)
    verd = np.concatenate([np.ones(w - 1), verd])
    return scores, verd.astype(int)


def test_windows_and_scores_match_reference_shapes():
    x = np.arange(10.0)
    wins = ae.make_windows(x, 4)
    assert wins.shape == (7, 4)
    np.testing.assert_array_equal(wins[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(wins[-1], [6, 7, 8, 9])
    # shorter than window -> zeros(len(x)) (autoencoders.py:228-229)
    s = ae.score_windows(np.arange(3.0), 5, make_mean_model_factory()())
    np.testing.assert_array_equal(s, np.zeros(3))


def test_bad_reconstruction_shape_rejected():
    with pytest.raises(ValueError, match="shape"):
        ae.score_windows(np.arange(10.0), 4, lambda w: w[:, :2])


def test_spark_transform_matches_reference_replay(spark):
    rng = np.random.default_rng(3)
    n, w, k = 200, 20, 3.0
    series = {}
    rows = []
    for sid in ("a", "b"):
        x = np.sin(np.arange(n) * 0.17) + rng.normal(0, 0.05, n)
        x[140 + (sid == "b") * 17] += 4.0  # distinct spike per series
        series[sid] = x
        rows += [(sid, float(i), float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "sid string, o double, v double")
    det = ae.WindowedAutoencoderDetector(
        model_factory=make_mean_model_factory(), window_size=w, threshold_std=k
    ).fit(df, "sid", "v")
    # fitted state is the per-series MinMax record
    assert det.scale_["a"] == (series["a"].min(), series["a"].max())
    out = det.transform(df, "sid", "o", "v").toPandas()
    for sid, x in series.items():
        got = out[out["sid"] == sid].sort_values("o")
        scores, verd = reference_replay(x, w, k)
        np.testing.assert_array_equal(got["verdict"].to_numpy(), verd)
        np.testing.assert_allclose(
            got["score"].to_numpy()[w - 1 :], scores, atol=1e-12
        )
        # first w-1 rows are padded normal
        assert (got["verdict"].to_numpy()[: w - 1] == 1).all()
        # the reconstruction error peaks at a window containing the
        # spike (whether it crosses mean+3σ depends on the model —
        # parity with the replay above is the contract)
        spike = 140 + (sid == "b") * 17
        peak = int(got["score"].to_numpy().argmax())
        assert spike - w < peak <= spike + w


def test_constant_series_zero_range_guard(spark):
    df = spark.createDataFrame(
        [("c", float(i), 5.0) for i in range(30)], "sid string, o double, v double"
    )
    det = ae.WindowedAutoencoderDetector(window_size=5).fit(df, "sid", "v")
    out = det.transform(df, "sid", "o", "v").toPandas()
    assert (out["score"] == 0.0).all()
    assert (out["verdict"] == 1).all()


def test_unfitted_transform_rejected(spark):
    df = spark.createDataFrame([("a", 0.0, 1.0)], "sid string, o double, v double")
    with pytest.raises(ValueError, match="fit"):
        ae.WindowedAutoencoderDetector().transform(df, "sid", "o", "v")
