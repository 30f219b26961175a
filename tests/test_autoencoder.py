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


def test_dense_ae_training_is_deterministic_and_learns():
    rng = np.random.default_rng(7)
    # 1-D manifold embedded in 8-D: reconstructable by a 4-dim code
    t = rng.uniform(0, 2 * np.pi, 400)
    x = np.stack([np.sin(t + p) for p in np.linspace(0, 1.5, 8)], axis=1)
    net1 = ae.NumpyDenseAutoencoder(8, hidden_dims=(6, 4), epochs=120, seed=9).fit(x)
    net2 = ae.NumpyDenseAutoencoder(8, hidden_dims=(6, 4), epochs=120, seed=9).fit(x)
    for w1, w2 in zip(net1.weights, net2.weights):
        np.testing.assert_array_equal(w1, w2)  # bit-identical across fits
    mse_trained = float(np.mean((net1.reconstruct(x) - x) ** 2))
    untrained = ae.NumpyDenseAutoencoder(8, hidden_dims=(6, 4), epochs=120, seed=9)
    untrained._init_params(np.random.default_rng(9))
    mse_init = float(np.mean((untrained.reconstruct(x) - x) ** 2))
    assert mse_trained < 0.05 * mse_init  # Adam actually descends
    # mirrored architecture: input→6→4→6→input
    assert net1.dims == [8, 6, 4, 6, 8]


def test_dense_ae_flags_offmanifold_windows(spark):
    """fit_dense end to end: train on a clean periodic series, then
    the spiked window scores must dominate — the trained net encodes
    the manifold, so an off-manifold spike reconstructs poorly."""
    n, w = 400, 16
    x = np.sin(np.arange(n) * 0.13)
    x[300] += 3.0
    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(x)],
        "sid string, o double, v double",
    )
    det = ae.WindowedAutoencoderDetector(window_size=w, threshold_std=3.0).fit_dense(
        df, "sid", "o", "v", hidden_dims=(8, 4), epochs=200, seed=4
    )
    out = det.transform(df, "sid", "o", "v").toPandas().sort_values("o")
    scores = out["score"].to_numpy()
    peak = int(scores.argmax())
    assert 300 - w < peak <= 300 + w
    # trained reconstruction of clean windows is much better than of
    # the spiked ones
    clean = np.delete(scores[w:], slice(300 - 2 * w, 300 + w))
    assert scores[peak] > 8 * clean.mean()


def test_train_from_sample_matches_fit_dense_weights(spark):
    """The oracle-replay contract: train_from_sample on the collected
    frame must equal the weights fit_dense installs (same code path,
    same sample order)."""
    rng = np.random.default_rng(11)
    rows = []
    for sid in ("a", "b", "c"):
        for i in range(120):
            rows.append((sid, float(i), float(np.sin(i * 0.2) + rng.normal(0, 0.01))))
    df = spark.createDataFrame(rows, "sid string, o double, v double")
    det = ae.WindowedAutoencoderDetector(window_size=8).fit_dense(
        df, "sid", "o", "v", hidden_dims=(4,), epochs=5, seed=3
    )
    # independent replay from the same rows in hash-priority order
    import hashlib

    def prio(sid):
        return int(hashlib.md5(f"3,{sid}".encode()).hexdigest()[:15], 16)

    ordered = sorted(rows, key=lambda r: (prio(r[0]), r[1]))
    pdf = pd.DataFrame(ordered, columns=["sid", "o", "val"])
    replay = ae.train_from_sample(
        pdf, det.scale_, 8, (4,), 1e-3, 5, 64, 3, 20_000
    )
    for w1, w2 in zip(det.ae_.weights, replay.weights):
        np.testing.assert_array_equal(w1, w2)


def test_lstm_bptt_matches_numerical_gradient():
    """Full-network gradient check: analytic BPTT through the stacked
    LSTM encoder/decoder + RepeatVector + TimeDistributed Dense must
    match central differences to ~1e-6."""
    rng = np.random.default_rng(0)
    net = ae.NumpyLSTMAutoencoder(window_size=5, units=(3, 2), seed=7)
    net._init_params(np.random.default_rng(7))
    x = rng.uniform(0, 1, (4, 5))

    def loss():
        out, _ = net._forward(x)
        return float(np.mean((out - x) ** 2))

    out, ctx = net._forward(x)
    grads = net._backward(2.0 * (out - x) / out.size, ctx)
    params = net._params()
    eps = 1e-6
    for pi, p in enumerate(params):
        it = np.nditer(p, flags=["multi_index"])
        for _ in range(min(p.size, 6)):
            idx = it.multi_index
            orig = p[idx]
            p[idx] = orig + eps
            lp = loss()
            p[idx] = orig - eps
            lm = loss()
            p[idx] = orig
            num = (lp - lm) / (2 * eps)
            ana = grads[pi][idx]
            assert abs(num - ana) <= 1e-6 * max(1.0, abs(num)), (pi, idx)
            it.iternext()


def test_lstm_ae_training_is_deterministic_and_learns():
    rng = np.random.default_rng(1)
    t = np.arange(200)
    wins = ae.make_windows(0.5 + 0.4 * np.sin(t * 0.3), 8)
    net = ae.NumpyLSTMAutoencoder(8, units=(6, 3), lr=5e-3, epochs=25, batch_size=32, seed=5)
    l0_net = ae.NumpyLSTMAutoencoder(8, units=(6, 3), seed=5)
    l0_net._init_params(np.random.default_rng(5))
    l0 = float(np.mean((l0_net.reconstruct(wins) - wins) ** 2))
    net.fit(wins)
    l1 = float(np.mean((net.reconstruct(wins) - wins) ** 2))
    assert l1 < l0 * 0.5  # training reduced MSE substantially
    net2 = ae.NumpyLSTMAutoencoder(8, units=(6, 3), lr=5e-3, epochs=25, batch_size=32, seed=5).fit(wins)
    np.testing.assert_array_equal(net.reconstruct(wins), net2.reconstruct(wins))


def test_fit_lstm_matches_train_lstm_from_sample(spark):
    """Same oracle-replay contract as fit_dense, for the LSTM twin."""
    rng = np.random.default_rng(11)
    rows = []
    for sid in ("a", "b"):
        for i in range(80):
            rows.append((sid, float(i), float(np.sin(i * 0.25) + rng.normal(0, 0.01))))
    df = spark.createDataFrame(rows, "sid string, o double, v double")
    det = ae.WindowedAutoencoderDetector(window_size=6).fit_lstm(
        df, "sid", "o", "v", units=(3, 2), epochs=3, seed=4
    )
    import hashlib

    def prio(sid):
        return int(hashlib.md5(f"4,{sid}".encode()).hexdigest()[:15], 16)

    ordered = sorted(rows, key=lambda r: (prio(r[0]), r[1]))
    pdf = pd.DataFrame(ordered, columns=["sid", "o", "val"])
    replay = ae.train_lstm_from_sample(
        pdf, det.scale_, 6, (3, 2), 1e-3, 3, 32, 4, 20_000
    )
    np.testing.assert_array_equal(det.ae_.wd, replay.wd)
    for l1, l2 in zip(det.ae_.layers, replay.layers):
        np.testing.assert_array_equal(l1.wx, l2.wx)
        np.testing.assert_array_equal(l1.uh, l2.uh)
        np.testing.assert_array_equal(l1.b, l2.b)
    # and the distributed transform scores with the installed model
    out = det.transform(df, "sid", "o", "v")
    assert out.filter("score > 0").count() > 0
