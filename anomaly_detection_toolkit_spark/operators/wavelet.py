"""Wavelet denoiser + detector over per-series groups.

Re-expression of ``/root/reference/src/anomaly_detection_toolkit/
wavelet.py`` WITHOUT PyWavelets (absent from the target env, SURVEY
§7.0): the DWT is implemented here in pure numpy as an orthonormal
filter bank (db4 / haar) with **periodized** boundary handling —
perfect reconstruction is exact (tested to 1e-10) and detail lengths
are exactly ``ceil(n/2^level)``. The reference uses pywt's symmetric
extension; pass ``mode="symmetric"`` for exact pywt boundary parity
(half-sample symmetric extension, ``floor((n+F-1)/2)`` coefficient
lengths, pywt's ``dec_hi`` sign convention). The default stays
``mode="periodization"``, whose orthonormal-perfect-reconstruction
plan the DuckDB oracles pin. The *operator semantics* are preserved
verbatim in both modes:

- denoise: universal threshold σ·√(2·ln n) with σ = MAD of the
  finest detail / 0.6745, soft/hard thresholding of detail levels
  only (``wavelet.py:47-57``);
- detect: per detail level, robust fence median+factor·MAD/0.6745
  over |coeffs| (``wavelet.py:168-172``), flagged coefficients map
  back to time spans of length ``n // len(detail)`` and their |coeff|
  values are SUMMED into the per-sample score (``wavelet.py:180-192``);
- predict: threshold = 95th percentile of the positive scores
  (``wavelet.py:126-129``), verdict -1 iff score > threshold.

Spark integration: one series = one group; ``applyInPandas``
(grouped-map Arrow UDF) runs the numpy kernel per group — whole-series
transforms can't be windowed, so the group is the parallelism unit
(10^6 series × 10^4 points parallelizes perfectly; one 10^12-point
series does not, and is documented as out of scope, matching the
reference's univariate in-memory constraint at ``wavelet.py:102-111``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# public Daubechies filter coefficients (Daubechies 1988; same tables
# pywt ships): decomposition low-pass, lowest-index-first
DEC_LO = {
    "haar": np.array([0.7071067811865476, 0.7071067811865476]),
    "db4": np.array(
        [
            -0.010597401784997278,
            0.032883011666982945,
            0.030841381835986965,
            -0.18703481171888114,
            -0.02798376941698385,
            0.6308807679295904,
            0.7148465705525415,
            0.23037781330885523,
        ]
    ),
}


def _filters(wavelet: str) -> tuple[np.ndarray, np.ndarray]:
    if wavelet not in DEC_LO:
        raise ValueError(f"unsupported wavelet {wavelet!r}; available: {sorted(DEC_LO)}")
    lo = DEC_LO[wavelet]
    # quadrature mirror: hi[j] = (-1)^j · lo[L-1-j]
    hi = ((-1.0) ** np.arange(len(lo))) * lo[::-1]
    return lo, hi


def _dwt_step(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One periodized analysis step: a[k] = Σ_j lo[j]·x[(2k+j) mod n]."""
    n = len(x)
    if n % 2:  # periodize odd lengths by wrapping one sample
        x = np.concatenate([x, x[:1]])
        n += 1
    k = np.arange(n // 2)[:, None]
    j = np.arange(len(lo))[None, :]
    idx = (2 * k + j) % n
    xs = x[idx]
    return xs @ lo, xs @ hi


def _idwt_step(a: np.ndarray, d: np.ndarray, lo: np.ndarray, hi: np.ndarray, n_out: int) -> np.ndarray:
    """Inverse periodized step via scatter-add (exact PR for
    orthonormal filters)."""
    n = 2 * len(a)
    out = np.zeros(n)
    for j in range(len(lo)):
        idx = (2 * np.arange(len(a)) + j) % n
        np.add.at(out, idx, a * lo[j] + d * hi[j])
    return out[:n_out]


# ---------------------------------------------------------------------------
# pywt-parity symmetric-extension mode
# ---------------------------------------------------------------------------


def _pywt_filters(wavelet: str) -> tuple[np.ndarray, np.ndarray]:
    """pywt's (dec_lo, dec_hi): dec_hi[k] = (-1)^(k+1) · dec_lo[F-1-k]
    — the opposite sign of this module's periodized QMF convention,
    so symmetric-mode detail coefficients match pywt literally."""
    if wavelet not in DEC_LO:
        raise ValueError(f"unsupported wavelet {wavelet!r}; available: {sorted(DEC_LO)}")
    lo = DEC_LO[wavelet]
    k = np.arange(len(lo))
    hi = ((-1.0) ** (k + 1)) * lo[::-1]
    return lo, hi


def _sym_index(m: np.ndarray, n: int) -> np.ndarray:
    """Half-sample symmetric extension index map (pywt 'symmetric'):
    … x1 x0 | x0 x1 … xn-1 | xn-1 xn-2 …, period 2n."""
    p = np.mod(m, 2 * n)
    return np.where(p < n, p, 2 * n - 1 - p)


def _dwt_step_sym(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One pywt-convention analysis step with symmetric extension:
    a[o] = Σ_j x_ext[2o+1-j] · lo[j], out_len = floor((n+F-1)/2)."""
    n, f = len(x), len(lo)
    out_len = (n + f - 1) // 2
    m = 2 * np.arange(out_len)[:, None] + 1 - np.arange(f)[None, :]
    xs = x[_sym_index(m, n)]
    return xs @ lo, xs @ hi


def _idwt_step_sym(a: np.ndarray, d: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """pywt idwt: upsample-by-2, full convolution with the reversed
    (reconstruction) filters, sum, trim F-2 each side →
    rec_len = 2·len(a) - F + 2."""
    f = len(lo)
    rec_lo, rec_hi = lo[::-1], hi[::-1]
    up_a = np.zeros(2 * len(a))
    up_a[::2] = a
    up_d = np.zeros(2 * len(d))
    up_d[::2] = d
    full = np.convolve(up_a, rec_lo) + np.convolve(up_d, rec_hi)
    rec_len = 2 * len(a) - f + 2
    return full[f - 2 : f - 2 + rec_len]


def wavedec(
    x: np.ndarray, wavelet: str = "db4", level: int = 5, mode: str = "periodization"
) -> tuple[list[np.ndarray], list[int]]:
    """([approx, detail_level, ..., detail_1], input lengths per
    step) — coefficient ordering like pywt.wavedec (coarsest detail
    first, finest last); the lengths drive exact inverse trimming.

    ``mode="periodization"`` (default): this module's orthonormal
    periodized bank. ``mode="symmetric"``: pywt-parity half-sample
    symmetric extension (``/root/reference/src/
    anomaly_detection_toolkit/wavelet.py:31-58`` uses pywt defaults,
    whose default mode is symmetric)."""
    if mode == "symmetric":
        lo, hi = _pywt_filters(wavelet)
        step = _dwt_step_sym
    elif mode == "periodization":
        lo, hi = _filters(wavelet)
        step = _dwt_step
    else:
        raise ValueError(f"mode must be periodization/symmetric, got {mode!r}")
    x = np.asarray(x, dtype=np.float64)
    details: list[np.ndarray] = []
    a = x
    lengths = []
    for _ in range(level):
        if len(a) < 2:
            break
        lengths.append(len(a))
        a, d = step(a, lo, hi)
        details.append(d)
    return [a] + details[::-1], lengths


def waverec(coeffs_and_lengths, wavelet: str = "db4", mode: str = "periodization") -> np.ndarray:
    coeffs, lengths = coeffs_and_lengths
    a = coeffs[0]
    details = coeffs[1:]
    if mode == "symmetric":
        lo, hi = _pywt_filters(wavelet)
        for d, n_out in zip(details, lengths[::-1]):
            if len(a) > len(d):  # pywt waverec length-mismatch trim
                a = a[: len(d)]
            a = _idwt_step_sym(a, d, lo, hi)
            if len(a) > n_out:
                a = a[:n_out]
        return a
    lo, hi = _filters(wavelet)
    for d, n_out in zip(details, lengths[::-1]):
        a = _idwt_step(a, d, lo, hi, n_out)
    return a


def soft_hard_threshold(c: np.ndarray, t: float, mode: str) -> np.ndarray:
    if mode == "soft":
        return np.sign(c) * np.maximum(np.abs(c) - t, 0.0)
    if mode == "hard":
        return np.where(np.abs(c) > t, c, 0.0)
    raise ValueError(f"threshold mode must be soft/hard, got {mode!r}")


def denoise_series(
    x: np.ndarray,
    wavelet: str = "db4",
    level: int = 5,
    mode: str = "soft",
    ext_mode: str = "periodization",
) -> np.ndarray:
    """Universal-threshold wavelet denoising (``wavelet.py:31-58``)."""
    coeffs, lengths = wavedec(x, wavelet, level, mode=ext_mode)
    finest = coeffs[-1]
    sigma = np.median(np.abs(finest)) / 0.6745 if len(finest) else 0.0
    t = sigma * np.sqrt(2.0 * np.log(max(len(x), 2)))
    thresh = [coeffs[0]] + [soft_hard_threshold(c, t, mode) for c in coeffs[1:]]
    return waverec((thresh, lengths), wavelet, mode=ext_mode)[: len(x)]


def score_series(
    x: np.ndarray,
    wavelet: str = "db4",
    level: int = 5,
    threshold_factor: float = 3.0,
    ext_mode: str = "periodization",
) -> np.ndarray:
    """Per-sample anomaly scores (``wavelet.py:133-195``)."""
    coeffs, _ = wavedec(x, wavelet, level, mode=ext_mode)
    scores = np.zeros(len(x))
    for detail in coeffs[1:]:
        if len(detail) == 0:
            continue
        da = np.abs(detail)
        med = np.median(da)
        mad = np.median(np.abs(da - med))
        fence = med + threshold_factor * (mad / 0.6745)
        mask = da > fence
        if not mask.any():
            continue
        scale = max(len(x) // len(detail), 1)
        for i in np.where(mask)[0]:
            lo_i = i * scale
            hi_i = min((i + 1) * scale, len(x))
            scores[lo_i:hi_i] += da[i]
    return scores


def predict_series(scores: np.ndarray) -> tuple[np.ndarray, float]:
    """Verdicts from scores: threshold = p95 of positive scores
    (``wavelet.py:126-129``)."""
    pos = scores[scores > 0]
    thr = float(np.percentile(pos, 95)) if len(pos) else 0.0
    return np.where(scores > thr, -1, 1).astype(np.int32), thr


def cwt_morlet(x: np.ndarray, scales: Sequence[int] | None = None) -> np.ndarray:
    """Continuous wavelet transform with the real Morlet wavelet
    ψ(t) = exp(-t²/2)·cos(5t) (``wavelet.py:223-258``); returns
    (n_scales × n) coefficients."""
    x = np.asarray(x, dtype=np.float64)
    if scales is None:
        scales = np.arange(1, 65)
    out = np.empty((len(scales), len(x)))
    n = len(x)
    for si, s in enumerate(scales):
        t = np.arange(-4 * s, 4 * s + 1) / s
        psi = np.exp(-0.5 * t**2) * np.cos(5.0 * t)
        psi /= np.sqrt(s)
        full = np.convolve(x, psi[::-1], mode="full")
        start = (len(full) - n) // 2  # center-crop to n even when the
        out[si] = full[start : start + n]  # kernel is longer than x
    return out


# ---------------------------------------------------------------------------
# Spark grouped-map operators
# ---------------------------------------------------------------------------


def denoise(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    wavelet: str = "db4",
    level: int = 5,
    mode: str = "soft",
    ext_mode: str = "periodization",
) -> DataFrame:
    """Per-series denoising via grouped-map applyInPandas.

    Output: (series_col, order_col, value, denoised)."""
    schema = f"{series_col} string, {order_col} double, value double, denoised double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        den = denoise_series(x, wavelet, level, mode, ext_mode)
        return pd.DataFrame(
            {
                series_col: pdf[series_col].astype(str),
                order_col: pdf[order_col].astype(float),
                "value": x,
                "denoised": den,
            }
        )

    return df.groupBy(series_col).applyInPandas(kernel, schema=schema)


def detect(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    wavelet: str = "db4",
    level: int = 5,
    threshold_factor: float = 3.0,
    ext_mode: str = "periodization",
) -> DataFrame:
    """Per-series wavelet anomaly detection via applyInPandas.

    Output: (series_col, order_col, value, score, verdict)."""
    schema = (
        f"{series_col} string, {order_col} double, value double, "
        "score double, verdict int"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        scores = score_series(x, wavelet, level, threshold_factor, ext_mode)
        verdicts, _ = predict_series(scores)
        return pd.DataFrame(
            {
                series_col: pdf[series_col].astype(str),
                order_col: pdf[order_col].astype(float),
                "value": x,
                "score": scores,
                "verdict": verdicts,
            }
        )

    return df.groupBy(series_col).applyInPandas(kernel, schema=schema)


def coefficients(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    wavelet: str = "db4",
    level: int = 5,
    ext_mode: str = "periodization",
) -> DataFrame:
    """op-28 (``wavelet.py:197-221``): expose the DWT decomposition
    per series as rows (series, kind, lvl, idx, coeff) — 'approx' plus
    'detail' levels 1..L (1 = finest), long-format so downstream SQL
    can aggregate coefficients without nested arrays."""
    schema = (
        f"{series_col} string, kind string, lvl int, idx int, coeff double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        coeffs, _ = wavedec(x, wavelet, level, mode=ext_mode)
        sid = str(pdf[series_col].iloc[0])
        rows = []
        for i, c in enumerate(coeffs[0]):
            rows.append((sid, "approx", 0, i, float(c)))
        n_details = len(coeffs) - 1
        for li, d in enumerate(coeffs[1:]):
            lvl = n_details - li  # pywt ordering: coarsest first
            for i, c in enumerate(d):
                rows.append((sid, "detail", lvl, i, float(c)))
        return pd.DataFrame(
            rows, columns=[series_col, "kind", "lvl", "idx", "coeff"]
        )

    return df.groupBy(series_col).applyInPandas(kernel, schema=schema)


def cwt(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    scales: Sequence[int] | None = None,
) -> DataFrame:
    """op-28 CWT (``wavelet.py:223-258``): Morlet coefficients per
    series as (series, scale, idx, coeff) rows."""
    scales = list(scales or range(1, 65))
    schema = f"{series_col} string, scale int, idx int, coeff double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        c = cwt_morlet(x, scales)
        sid = str(pdf[series_col].iloc[0])
        out = []
        for si, s in enumerate(scales):
            for i, v in enumerate(c[si]):
                out.append((sid, int(s), i, float(v)))
        return pd.DataFrame(out, columns=[series_col, "scale", "idx", "coeff"])

    return df.groupBy(series_col).applyInPandas(kernel, schema=schema)
