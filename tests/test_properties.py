"""Property-based tests (hypothesis) for operators with mathematical
contracts — the invariants hold for ARBITRARY inputs, not just the
fixtures. Numpy kernels are exercised directly (fast, no Spark round
trip per example); Spark parity for the same kernels lives in the
per-operator test files."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_toolkit_spark.operators import wavelet as wv
from anomaly_detection_toolkit_spark.operators.dedup import MERSENNE31, _perm_params
from anomaly_detection_toolkit_spark.operators.text import _winnow_doc

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=30, deadline=None)
@given(st.lists(finite, min_size=4, max_size=300), st.sampled_from(["haar", "db4"]))
def test_dwt_perfect_reconstruction_property(xs, wname):
    x = np.asarray(xs)
    coeffs = wv.wavedec(x, wname, 5)
    xr = wv.waverec(coeffs, wname)[: len(x)]
    np.testing.assert_allclose(xr, x, atol=1e-6 * max(1.0, np.abs(x).max()))


@settings(max_examples=30, deadline=None)
@given(st.lists(finite, min_size=8, max_size=200))
def test_denoise_preserves_length_and_finiteness(xs):
    x = np.asarray(xs)
    den = wv.denoise_series(x, "db4", 3)
    assert len(den) == len(x)
    assert np.isfinite(den).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(finite, min_size=4, max_size=200))
def test_scores_nonnegative_verdicts_valid(xs):
    x = np.asarray(xs)
    scores = wv.score_series(x, "haar", 3)
    assert (scores >= 0).all()
    verdicts, thr = wv.predict_series(scores)
    assert set(np.unique(verdicts)) <= {-1, 1}
    assert thr >= 0


def _minhash_py(shingle_hashes: set[int], num_perm: int) -> list[int]:
    """Plain-python MinHash mirror of the Spark/SQL formula."""
    sig = []
    for a, b in _perm_params(num_perm):
        best = MERSENNE31
        for h in shingle_hashes:
            v = (a * (h % (1 << 30)) + b) % MERSENNE31
            best = min(best, v)
        sig.append(best)
    return sig


@settings(max_examples=25, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=5, max_size=80),
    st.sets(st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=5, max_size=80),
)
def test_minhash_estimates_jaccard(sa, sb):
    """Identity and containment properties of the exact formula; the
    statistical accuracy (E[agreement] = J) is checked at a fixed
    overlap below to avoid flaky random bounds."""
    num_perm = 32
    sig_a = _minhash_py(sa, num_perm)
    assert _minhash_py(sa, num_perm) == sig_a  # deterministic
    if sa == sb:
        assert sig_a == _minhash_py(sb, num_perm)
    union_sig = _minhash_py(sa | sb, num_perm)
    # min over a union = elementwise min of the parts' signatures
    both = [min(x, y) for x, y in zip(sig_a, _minhash_py(sb, num_perm))]
    assert union_sig == both


def test_minhash_agreement_tracks_jaccard():
    rng = np.random.default_rng(0)
    base = set(int(x) for x in rng.integers(0, 1 << 60, 200))
    half = set(list(base)[:100]) | set(int(x) for x in rng.integers(0, 1 << 60, 100))
    j = len(base & half) / len(base | half)
    sa, sb = _minhash_py(base, 128), _minhash_py(half, 128)
    est = sum(x == y for x, y in zip(sa, sb)) / 128
    assert abs(est - j) < 0.12  # 128 perms → se ≈ 0.044


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="abcdefgh ", min_size=30, max_size=300), st.text(alphabet="xyz ", min_size=0, max_size=20))
def test_winnowing_shift_invariance(body, prefix):
    """Winnowing fingerprint VALUES of a document survive prepending
    arbitrary text (positions shift; the guarantee is about values)."""
    f_base = {h for _, h in _winnow_doc(body, 6, 3)}
    f_shift = {h for _, h in _winnow_doc(prefix + " " + body, 6, 3)}
    if len(f_base) >= 4:
        overlap = len(f_base & f_shift) / len(f_base)
        assert overlap > 0.5


@settings(max_examples=40, deadline=None)
@given(st.lists(finite, min_size=2, max_size=100))
def test_zscore_affine_invariance_formula(xs):
    """|z| is invariant under x → a·x + b (a>0) — checked on the
    closed-form the detector bakes into its expression."""
    x = np.asarray(xs)
    sd = x.std()
    if sd < 1e-9:
        return
    z1 = np.abs((x - x.mean()) / sd)
    y = 3.7 * x + 11.0
    z2 = np.abs((y - y.mean()) / y.std())
    np.testing.assert_allclose(z1, z2, atol=1e-6)


# --- round-2 additions: png / wav / symmetric DWT -------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_any_size(w, h, seed):
    from anomaly_detection_toolkit_spark.functions import codecs

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode(codecs.encode(img, "png"), "png"), img)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=500,
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_quantization_bound(xs, rate):
    from anomaly_detection_toolkit_spark.operators import multimodal as mm

    x = np.asarray(xs)
    dec, r = mm.decode_wav(mm.encode_wav(x, rate=rate))
    assert r == rate and len(dec) == len(x)
    np.testing.assert_allclose(dec, x, atol=1.5 / 32767)


@settings(max_examples=40, deadline=None)
@given(st.lists(finite, min_size=8, max_size=300), st.sampled_from(["haar", "db4"]))
def test_symmetric_dwt_perfect_reconstruction_property(xs, wname):
    from anomaly_detection_toolkit_spark.operators import wavelet as wv

    x = np.asarray(xs)
    c = wv.wavedec(x, wname, level=3, mode="symmetric")
    r = wv.waverec(c, wname, mode="symmetric")
    np.testing.assert_allclose(r[: len(x)], x, atol=1e-7 * max(1.0, np.abs(x).max()))


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from([0.0, 1.0, 2.0, 3.0]),
        st.integers(min_value=0, max_value=50),
        min_size=1,
    )
)
def test_drift_stats_properties(hist):
    """KS in [0,1]; identical distributions score 0; n sums counts."""
    from anomaly_detection_toolkit_spark.streaming.drift import drift_stats

    n_total = sum(hist.values())
    baseline = (
        {b: c / n_total for b, c in hist.items()} if n_total else {0.0: 1.0}
    )
    n, ks, psi = drift_stats(hist, baseline)
    assert n == n_total
    assert 0.0 <= ks <= 1.0 + 1e-12
    if n_total:
        assert ks == pytest.approx(0.0, abs=1e-12)
        assert psi == pytest.approx(0.0, abs=1e-9)
