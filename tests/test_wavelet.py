"""Wavelet operator tests: numpy kernel properties (perfect
reconstruction, denoising, spike detection) + Spark grouped-map
parity with the local kernel. The reference has NO wavelet tests
(SURVEY §5 coverage gap), so invariants follow its documented
semantics (universal threshold, MAD fences, span mapping)."""

from __future__ import annotations

import numpy as np
import pytest

from anomaly_detection_toolkit_spark.operators import wavelet as wv


def _noisy_signal(n=512, seed=3):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 8 * np.pi, n)
    clean = np.sin(t)
    return clean, clean + 0.35 * rng.standard_normal(n)


def test_perfect_reconstruction_all_wavelets():
    rng = np.random.default_rng(1)
    for w in ("haar", "db4"):
        for n in (37, 64, 100, 1001):
            x = rng.standard_normal(n)
            coeffs = wv.wavedec(x, w, 5)
            np.testing.assert_allclose(wv.waverec(coeffs, w)[:n], x, atol=1e-9)


def test_filters_orthonormal():
    for w in ("haar", "db4"):
        lo, hi = wv._filters(w)
        assert np.isclose((lo**2).sum(), 1.0, atol=1e-10)
        assert np.isclose((hi**2).sum(), 1.0, atol=1e-10)
        assert np.isclose(lo @ hi, 0.0, atol=1e-10)


def test_denoise_reduces_noise():
    clean, noisy = _noisy_signal()
    den = wv.denoise_series(noisy, "db4", level=5, mode="soft")
    assert len(den) == len(noisy)
    mse_before = float(np.mean((noisy - clean) ** 2))
    mse_after = float(np.mean((den - clean) ** 2))
    assert mse_after < 0.6 * mse_before


def test_hard_vs_soft_threshold():
    c = np.array([-3.0, -0.5, 0.0, 0.5, 3.0])
    np.testing.assert_allclose(
        wv.soft_hard_threshold(c, 1.0, "soft"), [-2.0, 0.0, 0.0, 0.0, 2.0]
    )
    np.testing.assert_allclose(
        wv.soft_hard_threshold(c, 1.0, "hard"), [-3.0, 0.0, 0.0, 0.0, 3.0]
    )
    with pytest.raises(ValueError):
        wv.soft_hard_threshold(c, 1.0, "nope")


def test_detector_flags_spike():
    _, noisy = _noisy_signal()
    x = noisy.copy()
    x[200:203] += 6.0  # injected transient
    scores = wv.score_series(x, "db4", level=5, threshold_factor=3.0)
    assert (scores >= 0).all() and len(scores) == len(x)
    verdicts, thr = wv.predict_series(scores)
    assert set(verdicts) <= {-1, 1}
    flagged = np.where(verdicts == -1)[0]
    # flagged spans must cover the injected transient region
    assert any(195 <= i <= 210 for i in flagged)


def test_predict_no_positive_scores():
    verdicts, thr = wv.predict_series(np.zeros(16))
    assert thr == 0.0 and (verdicts == 1).all()


def test_cwt_shape():
    _, noisy = _noisy_signal(128)
    c = wv.cwt_morlet(noisy, scales=range(1, 17))
    assert c.shape == (16, 128)


def test_unsupported_wavelet():
    with pytest.raises(ValueError):
        wv.wavedec(np.zeros(8), "bior2.2", 2)


def test_spark_detect_matches_kernel(spark):
    _, noisy = _noisy_signal(256)
    x = noisy.copy()
    x[100:103] += 6.0
    rows = [("s1", float(i), float(v)) for i, v in enumerate(x)]
    # second series: pure noise, interleaved to prove grouping
    rng = np.random.default_rng(9)
    y = rng.standard_normal(200)
    rows += [("s2", float(i), float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "series string, t double, value double")
    out = wv.detect(df, "series", "t", "value").filter("series = 's1'").orderBy("t")
    got = np.array([r.score for r in out.collect()])
    want = wv.score_series(x, "db4", 5, 3.0)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_spark_denoise_matches_kernel(spark):
    _, noisy = _noisy_signal(256)
    rows = [("a", float(i), float(v)) for i, v in enumerate(noisy)]
    df = spark.createDataFrame(rows, "series string, t double, value double")
    got_rows = wv.denoise(df, "series", "t", "value").orderBy("t").collect()
    got = np.array([r.denoised for r in got_rows])
    want = wv.denoise_series(noisy, "db4", 5, "soft")
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_spark_coefficients_long_format(spark):
    _, noisy = _noisy_signal(128)
    rows = [("s", float(i), float(v)) for i, v in enumerate(noisy)]
    df = spark.createDataFrame(rows, "series string, t double, value double")
    out = wv.coefficients(df, "series", "t", "value", level=3).collect()
    coeffs, _ = wv.wavedec(noisy, "db4", 3)
    by_kind = {}
    for r in out:
        by_kind.setdefault((r.kind, r.lvl), []).append((r.idx, r.coeff))
    approx = [c for _, c in sorted(by_kind[("approx", 0)])]
    np.testing.assert_allclose(approx, coeffs[0], atol=1e-9)
    # finest detail = lvl 1, matches the LAST wavedec entry
    finest = [c for _, c in sorted(by_kind[("detail", 1)])]
    np.testing.assert_allclose(finest, coeffs[-1], atol=1e-9)


def test_spark_cwt_rows(spark):
    _, noisy = _noisy_signal(64)
    rows = [("s", float(i), float(v)) for i, v in enumerate(noisy)]
    df = spark.createDataFrame(rows, "series string, t double, value double")
    out = wv.cwt(df, "series", "t", "value", scales=range(1, 5)).collect()
    assert len(out) == 4 * 64
    want = wv.cwt_morlet(noisy, range(1, 5))
    got_s1 = sorted(((r.idx, r.coeff) for r in out if r.scale == 1))
    np.testing.assert_allclose([c for _, c in got_s1], want[0], atol=1e-9)
