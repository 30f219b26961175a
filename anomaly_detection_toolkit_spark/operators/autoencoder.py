"""Autoencoder detector seam (ops 30-31): the full
``LSTMAutoencoderDetector`` / ``PyTorchAutoencoderDetector`` API
surface (``/root/reference/src/anomaly_detection_toolkit/
autoencoders.py:41-498``) with a PLUGGABLE reconstruction model.

Keras/TensorFlow and PyTorch are absent from the target environment
(sanctioned non-goal, SURVEY §7.0), but everything AROUND the neural
net is deterministic numpy and is implemented here verbatim:

- MinMax scaling fitted on the training series (``:90`` —
  ``scaler_ = MinMaxScaler()``; range-0 guard → identity);
- sliding windows ``x[i:i+w]`` with the vectorized index trick
  (``:93-108``), univariate only (``:147-148``);
- score = per-window mean |x_window − reconstruction| (``:233-240``);
- predict threshold = mean + threshold_std·std of the scores at
  PREDICT time (``:199-203``), verdict −1 iff score > threshold,
  first ``window_size−1`` samples padded normal (+1) (``:204-208``).

**Plug-in contract** — the one seam a user fills to get real
LSTM/conv autoencoders back:

``model_factory() -> (windows: np.ndarray (n, w)) -> np.ndarray (n, w)``

A zero-arg factory returning the reconstruction function. Importable
factories run ONCE PER EXECUTOR PYTHON WORKER (module-level cache in
``_cached_model``); closure factories, which cannot be re-imported
worker-side, are cached on the deserialized function object — once
per task, amortized across all its groups. Either way heavyweight
models are loaded worker-side instead of being pickled through the
closure — the same shape as
``pyspark.ml.functions.predict_batch_udf``. The default
factory is an identity-on-scaled-windows model, which makes scores
exactly |residual from window mean reconstruction| ≡ 0 — useful only
for tests; real users plug in e.g.

    def factory():
        import onnxruntime  # loaded on the executor
        sess = onnxruntime.InferenceSession("ae.onnx")
        return lambda w: sess.run(None, {"x": w[..., None]})[0][..., 0]

Spark integration: one time series = one group;
``groupBy(series).applyInPandas`` runs scale → window → reconstruct →
score → threshold per group (the reference is single-series
in-memory, ``:135-245``; here 10^6 series parallelize across
executors, each group's windows batched through Arrow once).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ModelFactory = Callable[[], Callable[[np.ndarray], np.ndarray]]

# worker-process model cache: importable factories are cached by
# qualified name for the lifetime of the Python worker (true
# once-per-executor-worker loading); closure factories (qualname
# contains '<locals>', not importable worker-side anyway) are cached
# on the deserialized function object itself — once per task, which
# still amortizes across every group the task processes.
_WORKER_MODEL_CACHE: dict[tuple[str, str], Callable] = {}


def _cached_model(factory: ModelFactory) -> Callable[[np.ndarray], np.ndarray]:
    mod = getattr(factory, "__module__", "") or ""
    qual = getattr(factory, "__qualname__", "") or ""
    if mod and qual and "<locals>" not in qual and "<lambda>" not in qual:
        key = (mod, qual)
        model = _WORKER_MODEL_CACHE.get(key)
        if model is None:
            model = factory()
            _WORKER_MODEL_CACHE[key] = model
        return model
    model = getattr(factory, "_adt_cached_model", None)
    if model is None:
        model = factory()
        try:
            factory._adt_cached_model = model  # type: ignore[attr-defined]
        except AttributeError:
            pass
    return model


def identity_model_factory() -> Callable[[np.ndarray], np.ndarray]:
    """Default stand-in 'autoencoder': reconstructs every window as
    itself (zero residual). Exists so the seam is runnable without
    TF/torch; tests plug in non-trivial numpy models."""
    return lambda windows: windows


def make_windows(x: np.ndarray, w: int) -> np.ndarray:
    """Sliding windows, (n-w+1, w) — ``autoencoders.py:93-108``."""
    if len(x) < w:
        return np.empty((0, w))
    idx = np.arange(w) + np.arange(len(x) - w + 1)[:, None]
    return x[idx]


def score_windows(
    x_scaled: np.ndarray, w: int, reconstruct: Callable[[np.ndarray], np.ndarray]
) -> np.ndarray:
    """Per-window mean-abs reconstruction error
    (``autoencoders.py:233-240``); zeros when the series is shorter
    than the window (``:228-229``)."""
    wins = make_windows(x_scaled, w)
    if len(wins) == 0:
        return np.zeros(len(x_scaled))
    rec = np.asarray(reconstruct(wins), dtype=np.float64)
    if rec.shape != wins.shape:
        raise ValueError(
            f"reconstruction shape {rec.shape} != windows shape {wins.shape}"
        )
    return np.mean(np.abs(wins - rec), axis=1)


def predict_from_scores(scores: np.ndarray, n: int, threshold_std: float) -> np.ndarray:
    """Verdicts from window scores (``autoencoders.py:199-208``):
    threshold = mean + k·std of the scores themselves, −1 beyond,
    first n − len(scores) samples padded +1."""
    thr = float(np.mean(scores)) + threshold_std * float(np.std(scores))
    verd = np.where(scores > thr, -1, 1)
    if len(verd) < n:
        verd = np.concatenate([np.ones(n - len(verd)), verd])
    return verd.astype(np.int32)


class NumpyDenseAutoencoder:
    """From-scratch dense autoencoder closing ops 30-31 without a
    framework: the reference's PyTorch architecture
    (``autoencoders.py:325-350`` — Linear+ReLU encoder through
    ``hidden_dims``, mirrored decoder, final Linear back to
    ``input_dim``) trained with Adam on MSE
    (``autoencoders.py:393-415``), all in numpy. Deliberately
    DETERMINISTIC end to end (seeded init, seeded epoch shuffles, no
    early stopping) so the driver-gate oracle can replay the
    identical training outside Spark and verify the distributed
    scoring path against literal-weight SQL matmuls.

    Weights are a few KB — they ship to executors inside the model
    factory closure; training happens once on the driver over a
    bounded window sample (sklearn-style sample-fit, the same
    pattern as the iForest/MCD detectors)."""

    def __init__(
        self,
        input_dim: int,
        hidden_dims: tuple[int, ...] = (64, 16, 4),
        lr: float = 1e-3,
        epochs: int = 40,
        batch_size: int = 64,
        seed: int = 42,
    ) -> None:
        self.dims = (
            [int(input_dim)]
            + [int(h) for h in hidden_dims]
            + [int(h) for h in reversed(hidden_dims[:-1])]
            + [int(input_dim)]
        )
        self.lr = float(lr)
        self.epochs = int(epochs)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.weights: list[np.ndarray] = []
        self.biases: list[np.ndarray] = []

    def _init_params(self, rng: np.random.Generator) -> None:
        self.weights, self.biases = [], []
        for fan_in, fan_out in zip(self.dims[:-1], self.dims[1:]):
            self.weights.append(
                rng.standard_normal((fan_in, fan_out)) * np.sqrt(2.0 / fan_in)
            )
            self.biases.append(np.zeros(fan_out))

    def _forward(self, x: np.ndarray) -> list[np.ndarray]:
        acts = [x]
        h = x
        last = len(self.weights) - 1
        for li, (w, b) in enumerate(zip(self.weights, self.biases)):
            h = h @ w + b
            if li < last:  # ReLU on every layer but the output
                h = np.maximum(h, 0.0)
            acts.append(h)
        return acts

    def fit(self, x: np.ndarray) -> "NumpyDenseAutoencoder":
        rng = np.random.default_rng(self.seed)
        self._init_params(rng)
        n = len(x)
        mw = [np.zeros_like(w) for w in self.weights]
        vw = [np.zeros_like(w) for w in self.weights]
        mb = [np.zeros_like(b) for b in self.biases]
        vb = [np.zeros_like(b) for b in self.biases]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        last = len(self.weights) - 1
        for _ in range(self.epochs):
            perm = rng.permutation(n)
            for s in range(0, n, self.batch_size):
                xb = x[perm[s : s + self.batch_size]]
                acts = self._forward(xb)
                # dL/dout for L = mean((out - x)^2)
                g = 2.0 * (acts[-1] - xb) / acts[-1].size
                t += 1
                grads_w, grads_b = [None] * len(self.weights), [None] * len(self.weights)
                for li in range(last, -1, -1):
                    a_in = acts[li]
                    grads_w[li] = a_in.T @ g
                    grads_b[li] = g.sum(axis=0)
                    if li > 0:
                        g = g @ self.weights[li].T
                        g = g * (acts[li] > 0)  # ReLU mask
                for li in range(len(self.weights)):
                    for p, gr, m, v in (
                        (self.weights[li], grads_w[li], mw[li], vw[li]),
                        (self.biases[li], grads_b[li], mb[li], vb[li]),
                    ):
                        m *= b1
                        m += (1 - b1) * gr
                        v *= b2
                        v += (1 - b2) * gr * gr
                        mhat = m / (1 - b1**t)
                        vhat = v / (1 - b2**t)
                        p -= self.lr * mhat / (np.sqrt(vhat) + eps)
        return self

    def reconstruct(self, x: np.ndarray) -> np.ndarray:
        return self._forward(np.asarray(x, dtype=np.float64))[-1]


def _sigmoid(z: np.ndarray) -> np.ndarray:
    """σ over preactivations clipped to ±60 — the clip makes the
    forward pass exactly reproducible in the DuckDB scoring oracle
    (same `greatest(least(z,60),-60)` expression; exp never
    overflows on either engine)."""
    return 1.0 / (1.0 + np.exp(-np.clip(z, -60.0, 60.0)))


class _LSTMLayer:
    """One LSTM layer (Keras cell semantics: gate order i,f,g,o;
    recurrent activation sigmoid; cell/output activation relu — the
    reference passes ``activation="relu"``, ``autoencoders.py:119``;
    ``unit_forget_bias`` → forget bias init 1)."""

    def __init__(self, d_in: int, units: int, rng: np.random.Generator) -> None:
        self.d_in, self.units = int(d_in), int(units)
        lim = np.sqrt(6.0 / (d_in + 4 * units))
        self.wx = rng.uniform(-lim, lim, (d_in, 4 * units))
        # orthogonal recurrent kernel (Keras default): QR of a seeded
        # normal, sign-fixed so the factorization is unique
        a = rng.standard_normal((4 * units, units))
        q, r = np.linalg.qr(a)
        q = q * np.sign(np.diag(r))
        self.uh = q.T  # (units, 4*units)
        self.b = np.zeros(4 * units)
        self.b[units : 2 * units] = 1.0

    def params(self) -> list[np.ndarray]:
        return [self.wx, self.uh, self.b]

    def forward(self, xs: np.ndarray) -> tuple[np.ndarray, list]:
        """xs (n, W, d_in) → hs (n, W, units), plus the BPTT cache."""
        n, steps, _ = xs.shape
        u = self.units
        h = np.zeros((n, u))
        c = np.zeros((n, u))
        hs = np.zeros((n, steps, u))
        cache = []
        for t in range(steps):
            x_t = xs[:, t, :]
            z = x_t @ self.wx + h @ self.uh + self.b
            i = _sigmoid(z[:, :u])
            f = _sigmoid(z[:, u : 2 * u])
            g = np.maximum(z[:, 2 * u : 3 * u], 0.0)
            o = _sigmoid(z[:, 3 * u :])
            c_prev, h_prev = c, h
            c = f * c_prev + i * g
            a = np.maximum(c, 0.0)
            h = o * a
            hs[:, t, :] = h
            cache.append((x_t, h_prev, c_prev, i, f, g, o, c, a))
        return hs, cache

    def backward(
        self, dhs: np.ndarray, cache: list
    ) -> tuple[np.ndarray, list[np.ndarray]]:
        """dhs (n, W, units) → dxs (n, W, d_in), grads [dWx, dUh, db]."""
        n, steps, u = dhs.shape
        dwx = np.zeros_like(self.wx)
        duh = np.zeros_like(self.uh)
        db = np.zeros_like(self.b)
        dxs = np.zeros((n, steps, self.d_in))
        dh_rec = np.zeros((n, u))
        dc_rec = np.zeros((n, u))
        for t in range(steps - 1, -1, -1):
            x_t, h_prev, c_prev, i, f, g, o, c, a = cache[t]
            dh = dhs[:, t, :] + dh_rec
            do = dh * a
            dc = dc_rec + dh * o * (c > 0)
            di = dc * g
            df = dc * c_prev
            dg = dc * i
            dz = np.concatenate(
                [
                    di * i * (1 - i),
                    df * f * (1 - f),
                    dg * (g > 0),
                    do * o * (1 - o),
                ],
                axis=1,
            )
            dwx += x_t.T @ dz
            duh += h_prev.T @ dz
            db += dz.sum(axis=0)
            dxs[:, t, :] = dz @ self.wx.T
            dh_rec = dz @ self.uh.T
            dc_rec = dc * f
        return dxs, [dwx, duh, db]


class NumpyLSTMAutoencoder:
    """The reference's op-30 LSTM autoencoder architecture
    (``autoencoders.py:110-133``: LSTM(u0, relu, seq) → LSTM(u1,
    relu, last) → RepeatVector(W) → LSTM(u1, relu, seq) → LSTM(u0,
    relu, seq) → TimeDistributed(Dense(1))) trained with Adam on MSE
    — from scratch in numpy, full BPTT, deterministic end to end
    (seeded init + epoch shuffles, fixed epochs, no early stop) so
    the driver-gate oracle can replay training bit-for-bit outside
    Spark and verify the distributed scoring path in SQL.

    Same plug-in interface as ``NumpyDenseAutoencoder``:
    ``fit(windows (n, w))`` / ``reconstruct(windows) -> (n, w)``."""

    def __init__(
        self,
        window_size: int,
        units: tuple[int, int] = (32, 16),
        lr: float = 1e-3,
        epochs: int = 50,
        batch_size: int = 32,
        seed: int = 42,
    ) -> None:
        self.w = int(window_size)
        self.units = (int(units[0]), int(units[1]))
        self.lr = float(lr)
        self.epochs = int(epochs)
        self.batch_size = int(batch_size)
        self.seed = int(seed)
        self.layers: list[_LSTMLayer] = []
        self.wd: np.ndarray | None = None
        self.bd: np.ndarray | None = None

    def _init_params(self, rng: np.random.Generator) -> None:
        u0, u1 = self.units
        self.layers = [
            _LSTMLayer(1, u0, rng),
            _LSTMLayer(u0, u1, rng),
            _LSTMLayer(u1, u1, rng),
            _LSTMLayer(u1, u0, rng),
        ]
        lim = np.sqrt(6.0 / (u0 + 1))
        self.wd = rng.uniform(-lim, lim, (u0, 1))
        self.bd = np.zeros(1)

    def _params(self) -> list[np.ndarray]:
        ps: list[np.ndarray] = []
        for layer in self.layers:
            ps.extend(layer.params())
        ps.extend([self.wd, self.bd])
        return ps

    def _forward(self, xb: np.ndarray) -> tuple[np.ndarray, tuple]:
        n, w = xb.shape
        u1 = self.units[1]
        h1, c1 = self.layers[0].forward(xb[:, :, None])
        h2, c2 = self.layers[1].forward(h1)
        latent = h2[:, -1, :]
        rep = np.repeat(latent[:, None, :], w, axis=1)
        h3, c3 = self.layers[2].forward(rep)
        h4, c4 = self.layers[3].forward(h3)
        out = (h4 @ self.wd + self.bd)[:, :, 0]
        return out, (c1, c2, c3, c4, h4, n, w, u1)

    def _backward(self, dout: np.ndarray, ctx: tuple) -> list[np.ndarray]:
        c1, c2, c3, c4, h4, n, w, u1 = ctx
        dwd = np.einsum("nwu,nw->u", h4, dout)[:, None]
        dbd = np.array([dout.sum()])
        dh4 = dout[:, :, None] * self.wd[None, None, :, 0]
        dh3, g4 = self.layers[3].backward(dh4, c4)
        drep, g3 = self.layers[2].backward(dh3, c3)
        dlatent = drep.sum(axis=1)
        dh2 = np.zeros((n, w, u1))
        dh2[:, -1, :] = dlatent
        dh1, g2 = self.layers[1].backward(dh2, c2)
        _, g1 = self.layers[0].backward(dh1, c1)
        return g1 + g2 + g3 + g4 + [dwd, dbd]

    def fit(self, x: np.ndarray) -> "NumpyLSTMAutoencoder":
        rng = np.random.default_rng(self.seed)
        self._init_params(rng)
        params = self._params()
        m = [np.zeros_like(p) for p in params]
        v = [np.zeros_like(p) for p in params]
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = 0
        n = len(x)
        for _ in range(self.epochs):
            perm = rng.permutation(n)
            for s in range(0, n, self.batch_size):
                xb = x[perm[s : s + self.batch_size]]
                out, ctx = self._forward(xb)
                dout = 2.0 * (out - xb) / out.size
                grads = self._backward(dout, ctx)
                t += 1
                for p, gr, mm, vv in zip(params, grads, m, v):
                    mm *= b1
                    mm += (1 - b1) * gr
                    vv *= b2
                    vv += (1 - b2) * gr * gr
                    p -= (
                        self.lr
                        * (mm / (1 - b1**t))
                        / (np.sqrt(vv / (1 - b2**t)) + eps)
                    )
        return self

    def reconstruct(self, x: np.ndarray) -> np.ndarray:
        out, _ = self._forward(np.asarray(x, dtype=np.float64))
        return out


def sample_training_windows(
    per_series_scaled: list[np.ndarray],
    window_size: int,
    max_fit_windows: int,
) -> np.ndarray:
    """Training windows from scaled series: per-series sliding
    windows, middle 80% kept (edge-effect trim, reference
    ``autoencoders.py:383-385``), concatenated, then deterministic
    stride subsampling down to ``max_fit_windows``."""
    parts = []
    for xs in per_series_scaled:
        wins = make_windows(xs, window_size)
        n = len(wins)
        if n == 0:
            continue
        lo, hi = int(0.1 * n), int(0.9 * n)
        parts.append(wins[lo:hi] if hi > lo else wins)
    if not parts:
        return np.empty((0, window_size))
    allw = np.concatenate(parts)
    if len(allw) > max_fit_windows:
        stride = int(np.ceil(len(allw) / max_fit_windows))
        allw = allw[::stride]
    return allw


def _scaled_sample_windows(
    pdf: pd.DataFrame,
    scale: dict[str, tuple[float, float]],
    window_size: int,
    max_fit_windows: int,
) -> np.ndarray:
    """Shared sample → scaled → windowed → trimmed path of both
    ``train_from_sample`` and ``train_lstm_from_sample``."""
    scaled = []
    for sid, grp in pdf.groupby("sid", sort=True):
        x = grp["val"].to_numpy(dtype=np.float64)
        mn, mx = scale.get(str(sid), (float(x.min()), float(x.max())))
        rng = mx - mn
        xs = (x - mn) / rng if rng != 0.0 else np.zeros_like(x)
        scaled.append(xs)
    wins = sample_training_windows(scaled, window_size, max_fit_windows)
    if len(wins) == 0:
        raise ValueError(
            f"no training windows: every sampled series is shorter than "
            f"window_size={window_size}"
        )
    return wins


def train_lstm_from_sample(
    pdf: pd.DataFrame,
    scale: dict[str, tuple[float, float]],
    window_size: int,
    units: tuple[int, int],
    lr: float,
    epochs: int,
    batch_size: int,
    seed: int,
    max_fit_windows: int,
) -> NumpyLSTMAutoencoder:
    """LSTM twin of ``train_from_sample`` — same deterministic
    collected-sample contract, shared verbatim by ``fit_lstm`` and
    the driver-gate oracle."""
    wins = _scaled_sample_windows(pdf, scale, window_size, max_fit_windows)
    return NumpyLSTMAutoencoder(
        window_size,
        units=units,
        lr=lr,
        epochs=epochs,
        batch_size=batch_size,
        seed=seed,
    ).fit(wins)


def train_from_sample(
    pdf: pd.DataFrame,
    scale: dict[str, tuple[float, float]],
    window_size: int,
    hidden_dims: tuple[int, ...],
    lr: float,
    epochs: int,
    batch_size: int,
    seed: int,
    max_fit_windows: int,
) -> NumpyDenseAutoencoder:
    """Deterministic training from a collected (sid, val) sample in
    sampled order — shared verbatim by ``fit_dense`` (Spark collect)
    and the driver-gate oracle (DuckDB read), so both sides train the
    IDENTICAL model. Series are grouped in lexicographic sid order
    (order within each series preserved), scaled with the supplied
    per-series (min, max), windowed, middle-80%-trimmed, stride-cut,
    then fed to the seeded Adam loop."""
    wins = _scaled_sample_windows(pdf, scale, window_size, max_fit_windows)
    return NumpyDenseAutoencoder(
        window_size,
        hidden_dims=hidden_dims,
        lr=lr,
        epochs=epochs,
        batch_size=batch_size,
        seed=seed,
    ).fit(wins)


class WindowedAutoencoderDetector:
    """Distributed fit/score/predict around a pluggable
    reconstruction model (see module docstring for the contract)."""

    def __init__(
        self,
        model_factory: ModelFactory = identity_model_factory,
        window_size: int = 20,
        threshold_std: float = 3.0,
    ) -> None:
        self.model_factory = model_factory
        self.window_size = int(window_size)
        self.threshold_std = float(threshold_std)
        # per-series MinMax state, fitted by fit(): {series: (min, max)}
        self.scale_: dict[str, tuple[float, float]] = {}
        self.is_fitted = False

    def fit(
        self, df: DataFrame, series_col: str, value_col: str
    ) -> "WindowedAutoencoderDetector":
        """Fit the MinMax scaler per series — ONE aggregation job
        collecting a tiny (series → min/max) record to the driver,
        re-broadcast as literals, the fitted-state pattern every
        detector here uses (``base.py`` module docstring). The neural
        net itself trains outside this engine (the plug-in boundary);
        what the reference's ``fit`` contributes to later scoring is
        exactly the scaler + the trained weights (``:152-180``).

        Scale note: the collected state is one (min, max) pair per
        series. Above ~10^6 series skip ``fit`` entirely — the
        transform kernel falls back to a per-group min/max computed
        inside the same Arrow batch, keeping the driver out of the
        loop (train-set vs score-set scaling then coincide, which is
        the common same-table case)."""
        from pyspark.sql import functions as F

        rows = (
            df.groupBy(series_col)
            .agg(
                F.min(F.col(value_col).cast("double")).alias("mn"),
                F.max(F.col(value_col).cast("double")).alias("mx"),
            )
            .collect()
        )
        self.scale_ = {str(r[series_col]): (float(r["mn"]), float(r["mx"])) for r in rows}
        self.is_fitted = True
        return self

    def fit_dense(
        self,
        df: DataFrame,
        series_col: str,
        order_col: str,
        value_col: str,
        hidden_dims: tuple[int, ...] = (64, 16, 4),
        lr: float = 1e-3,
        epochs: int = 40,
        batch_size: int = 64,
        seed: int = 42,
        max_fit_rows: int = 1_000_000,
        max_fit_windows: int = 20_000,
    ) -> "WindowedAutoencoderDetector":
        """Fit scalers AND train a real ``NumpyDenseAutoencoder`` on a
        bounded driver-side window sample, then install it as the
        reconstruction model (ops 30-31 closed without a framework).

        The sample is the first ``max_fit_rows`` rows ordered by
        (60-bit md5 of the seed-salted SERIES key, ``order_col``) —
        series are taken in engine-stable hash-priority order, each as
        an order-contiguous prefix, with the value itself as the final
        sort key — duplicate ``order_col`` values within a series
        (the tie hazard CLAUDE.md warns about) then leave only
        value-identical rows tied, so the collected matrix (content
        AND order) is layout-independent and reproducible outside
        Spark (the driver-gate oracle replays the identical training
        from a DuckDB read; same trick as the iForest literal-tree
        oracle). Training windows: per-series middle 80%, stride-cut
        to ``max_fit_windows`` (reference trims edges the same way,
        ``autoencoders.py:383-385``). Training itself is the
        reference's PyTorch loop in numpy: Adam on MSE, seeded
        shuffles, fixed epochs. The trained weights (a few KB) ride
        to executors in the factory closure."""
        self.fit(df, series_col, value_col)
        pdf = self._collect_sample_pdf(
            df, series_col, order_col, value_col, seed, max_fit_rows
        )
        ae = train_from_sample(
            pdf,
            self.scale_,
            self.window_size,
            hidden_dims,
            lr,
            epochs,
            batch_size,
            seed,
            max_fit_windows,
        )
        self.ae_ = ae
        self.model_factory = lambda: ae.reconstruct
        return self

    def fit_lstm(
        self,
        df: DataFrame,
        series_col: str,
        order_col: str,
        value_col: str,
        units: tuple[int, int] = (32, 16),
        lr: float = 1e-3,
        epochs: int = 50,
        batch_size: int = 32,
        seed: int = 42,
        max_fit_rows: int = 1_000_000,
        max_fit_windows: int = 20_000,
    ) -> "WindowedAutoencoderDetector":
        """Fit scalers AND train the reference's actual op-30
        architecture — ``NumpyLSTMAutoencoder`` (stacked LSTM
        encoder/decoder, relu cells, Adam/MSE; reference defaults
        ``autoencoders.py:66-92``: units (32,16), epochs 50, batch
        32) — on the same engine-stable driver-side sample as
        ``fit_dense``. Training cost is driver-side and bounded by
        ``max_fit_windows``; scoring ships the few-KB weights in the
        factory closure and runs Arrow-batched per series."""
        self.fit(df, series_col, value_col)
        pdf = self._collect_sample_pdf(
            df, series_col, order_col, value_col, seed, max_fit_rows
        )
        ae = train_lstm_from_sample(
            pdf,
            self.scale_,
            self.window_size,
            units,
            lr,
            epochs,
            batch_size,
            seed,
            max_fit_windows,
        )
        self.ae_ = ae
        self.model_factory = lambda: ae.reconstruct
        return self

    @staticmethod
    def _collect_sample_pdf(
        df: DataFrame,
        series_col: str,
        order_col: str,
        value_col: str,
        seed: int,
        max_fit_rows: int,
    ) -> pd.DataFrame:
        """The engine-stable training sample both trainers share (see
        ``fit_dense`` docstring for the ordering contract)."""
        from pyspark.sql import functions as F

        prio = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ",", F.lit(str(seed)), F.col(series_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return (
            df.select(
                F.col(series_col).cast("string").alias("sid"),
                F.col(value_col).cast("double").alias("val"),
                prio.alias("_p"),
                F.col(order_col).alias("_o"),
            )
            .orderBy("_p", "_o", "val")
            .limit(max_fit_rows)
            .toPandas()
        )

    def _scale(self, sid: str, x: np.ndarray) -> np.ndarray:
        mn, mx = self.scale_.get(sid, (float(np.min(x)), float(np.max(x))))
        rng = mx - mn
        if rng == 0.0:
            return np.zeros_like(x)
        return (x - mn) / rng

    def transform(
        self, df: DataFrame, series_col: str, order_col: str, value_col: str
    ) -> DataFrame:
        """(series, order, value, score, verdict) — score is the
        reconstruction error of the window ENDING at the row (reference
        aligns window i with sample i+w−1 via its padding, ``:204-208``),
        verdict per the predict-time mean+k·std threshold."""
        if not self.is_fitted:
            raise ValueError("fit() first")
        w = self.window_size
        k = self.threshold_std
        factory = self.model_factory
        scale = self.scale_
        schema = (
            f"{series_col} string, {order_col} double, value double, "
            "score double, verdict int"
        )

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            # cached worker-side: once per Python worker for importable
            # factories, once per task for closures — never per group
            reconstruct = _cached_model(factory)
            pdf = pdf.sort_values(order_col)
            sid = str(pdf[series_col].iloc[0])
            x = pdf[value_col].to_numpy(dtype=np.float64)
            mn, mx = scale.get(sid, (float(x.min()), float(x.max())))
            rng = mx - mn
            xs = (x - mn) / rng if rng != 0.0 else np.zeros_like(x)
            scores = score_windows(xs, w, reconstruct)
            verd = predict_from_scores(scores, len(x), k)
            pad = len(x) - len(scores)
            full_scores = np.concatenate([np.zeros(pad), scores]) if pad > 0 else scores
            return pd.DataFrame(
                {
                    series_col: pdf[series_col].astype(str),
                    order_col: pdf[order_col].astype(float),
                    "value": x,
                    "score": full_scores,
                    "verdict": verd,
                }
            )

        return df.groupBy(series_col).applyInPandas(kernel, schema=schema)
