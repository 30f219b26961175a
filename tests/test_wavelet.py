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


# ---------------------------------------------------------------------------
# pywt-parity symmetric-extension mode (VERDICT r1 item 8)
# ---------------------------------------------------------------------------


class TestSymmetricMode:
    def test_haar_matches_pywt_goldens(self):
        """Literal pywt.dwt outputs (mode='symmetric', the pywt
        default): cA=(x0+x1)/sqrt2 pairs, odd tail mirrored."""
        c, _ = wv.wavedec(np.array([1.0, 2, 3, 4]), "haar", level=1, mode="symmetric")
        np.testing.assert_allclose(c[0], [2.12132034, 4.94974747], atol=1e-8)
        np.testing.assert_allclose(c[1], [-0.70710678, -0.70710678], atol=1e-8)
        c, _ = wv.wavedec(np.array([1.0, 2, 3, 4, 5]), "haar", level=1, mode="symmetric")
        np.testing.assert_allclose(c[0], [2.12132034, 4.94974747, 7.07106781], atol=1e-8)
        np.testing.assert_allclose(c[1], [-0.70710678, -0.70710678, 0.0], atol=1e-8)
        c, _ = wv.wavedec(np.array([1.0, 2, 3]), "haar", level=1, mode="symmetric")
        np.testing.assert_allclose(c[0], [2.12132034, 4.24264069], atol=1e-8)
        np.testing.assert_allclose(c[1], [-0.70710678, 0.0], atol=1e-8)

    def test_coeff_lengths_match_pywt_formula(self):
        """pywt dwt_coeff_len = floor((n + F - 1) / 2) per level."""
        for n in (16, 17, 37, 100, 101):
            x = np.arange(n, dtype=float)
            c, lengths = wv.wavedec(x, "db4", level=3, mode="symmetric")
            m = n
            for li in range(3):
                want = (m + 8 - 1) // 2
                assert len(c[-(li + 1)]) == want, (n, li)
                m = want
            assert len(c[0]) == m

    @pytest.mark.parametrize("wavelet", ["haar", "db4"])
    @pytest.mark.parametrize("n", [16, 17, 37, 100, 101])
    def test_perfect_reconstruction(self, wavelet, n):
        rng = np.random.default_rng(n)
        x = rng.normal(size=n)
        c = wv.wavedec(x, wavelet, level=3, mode="symmetric")
        r = wv.waverec(c, wavelet, mode="symmetric")
        np.testing.assert_allclose(r[:n], x, atol=1e-9)

    def test_constant_signal_boundaries_exact(self):
        """Symmetric extension of a constant IS constant, so details
        are exactly 0 and cA = c * sqrt(2)^level EVERYWHERE including
        boundaries — this is where periodization and symmetric agree
        and any extension bug shows up as boundary leakage."""
        x = np.full(40, 3.25)
        c, _ = wv.wavedec(x, "db4", level=3, mode="symmetric")
        for d in c[1:]:
            np.testing.assert_allclose(d, 0.0, atol=1e-10)
        np.testing.assert_allclose(c[0], 3.25 * 2 ** (3 / 2), atol=1e-10)

    def test_db4_annihilates_cubics_interior_not_boundary(self):
        """db4 has 4 vanishing moments: interior detail coeffs of a
        cubic are 0, but symmetric reflection breaks the polynomial at
        the edges, so boundary coefficients are NONZERO — exactly the
        pywt boundary behaviour the periodized mode lacks."""
        t = np.arange(64, dtype=float)
        x = 0.01 * t**3 - 0.3 * t**2 + t
        c, _ = wv.wavedec(x, "db4", level=1, mode="symmetric")
        d = c[1]
        assert np.abs(d[4:-4]).max() < 1e-8
        assert np.abs(d[:3]).max() > 1e-3 or np.abs(d[-3:]).max() > 1e-3

    def test_detail_sign_convention_is_pywts(self):
        """pywt dec_hi[0] = -dec_lo[F-1]: a rising step yields
        NEGATIVE finest-detail at the jump (haar: (x0-x1)/sqrt2)."""
        x = np.array([0.0, 0, 0, 0, 1, 1, 1, 1])
        c, _ = wv.wavedec(x, "haar", level=1, mode="symmetric")
        assert c[1].sum() == pytest.approx(0.0)  # aligned pairs: no jump inside a pair
        x = np.array([0.0, 0, 0, 1, 1, 1])
        c, _ = wv.wavedec(x, "haar", level=1, mode="symmetric")
        assert c[1][1] == pytest.approx(-0.70710678, abs=1e-8)

    def test_denoise_and_detect_run_in_symmetric_mode(self, spark):
        import pandas as pd

        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "sid": ["s"] * 128,
                "o": np.arange(128, dtype=float),
                "v": np.sin(np.arange(128) * 0.3) + rng.normal(0, 0.1, 128),
            }
        )
        pdf.loc[60, "v"] += 5.0
        df = spark.createDataFrame(pdf)
        den = wv.denoise(df, "sid", "o", "v", ext_mode="symmetric").toPandas()
        assert len(den) == 128 and den["denoised"].notna().all()
        det = wv.detect(df, "sid", "o", "v", ext_mode="symmetric").toPandas()
        det = det.sort_values("o").reset_index(drop=True)
        # Reference parity quirk, preserved on purpose: with pywt's
        # symmetric lengths len(detail_1) = (n+7)//2 ≈ n/2+3, the
        # reference's span mapping scale = n // len(detail)
        # (wavelet.py:180-192) collapses to 1, so the spike at sample
        # 60 is flagged at coefficient index ~30 — exactly what the
        # reference does under pywt defaults.
        flagged = det.index[det["verdict"] == -1].tolist()
        assert flagged == [30]
        # numpy-level parity: the Spark plan is the numpy kernel
        want = wv.denoise_series(
            pdf["v"].to_numpy(), "db4", 5, "soft", ext_mode="symmetric"
        )
        np.testing.assert_allclose(
            den.sort_values("o")["denoised"].to_numpy(), want, atol=1e-9
        )

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError):
            wv.wavedec(np.arange(8.0), "haar", mode="zero")
