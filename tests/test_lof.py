"""Approximate-LOF tests: golden parity with an exact numpy LOF on a
single-bucket fixture (where approx == exact), outlier detection on
a clustered fixture, and the isolated-vector policy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.lof import approx_lof


def exact_lof(x: np.ndarray, k: int) -> np.ndarray:
    """Textbook LOF (Breunig et al. 2000) in numpy for parity."""
    n = len(x)
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1, kind="stable")[:, :k]
    kdist = np.take_along_axis(d, nn, axis=1)[:, -1]
    reach = np.maximum(kdist[nn], np.take_along_axis(d, nn, axis=1))
    lrd = 1.0 / reach.mean(axis=1)
    return lrd[nn].mean(axis=1) / lrd


def _df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_matches_exact_lof_in_single_bucket(spark):
    """With n_planes=0 every point shares one bucket → the
    approximation IS exact LOF (float32 storage gives ~1e-3 agreement)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((60, 4))
    x[0] += 8.0  # one clear outlier
    out = approx_lof(_df(spark, x), k=5, n_planes=0, dim=4).orderBy("id").collect()
    want = exact_lof(x.astype(np.float32).astype(np.float64), 5)
    got = np.array([r.lof for r in out])
    np.testing.assert_allclose(got, want, rtol=1e-3)
    assert out[0].verdict == -1 and out[0].lof > 1.5


def test_inliers_near_one(spark):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((200, 8))
    out = approx_lof(_df(spark, x), k=10, n_planes=2, dim=8).collect()
    lofs = [r.lof for r in out if r.lof is not None]
    assert np.median(lofs) == pytest.approx(1.0, abs=0.15)


def test_isolated_vector_policy(spark):
    # two tight clusters + one far point that lands alone in a bucket
    # is flagged with NULL lof
    x = np.zeros((11, 4))
    x[:5] += [1, 1, 1, 1]
    x[5:10] += [-1, -1, -1, -1]
    x[10] = [50, -50, 50, -50]
    out = {r.id: r for r in approx_lof(_df(spark, x), k=3, n_planes=2, dim=4).collect()}
    far = out[10]
    assert far.verdict == -1  # no neighborhood evidence OR high LOF


def test_lof_multiprobe_widens_neighborhoods(spark):
    """n_probes>1 must (a) keep one row per vector, (b) strictly not
    lose any scored vector vs single-probe, (c) reduce or keep the
    isolated (NULL-lof) count — probing across the nearest hyperplane
    can only ADD bucket neighbors."""
    from pyspark.sql import functions as F

    from anomaly_detection_toolkit_spark.operators.lof import approx_lof

    frac = lambda c: c - F.floor(c)  # noqa: E731
    cols = [
        (frac(F.sin(F.col("id") * (12.9898 + 7.77 * d)) * 43758.5453) * 2 - 1)
        .cast("double")
        for d in range(8)
    ]
    df = spark.range(400).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )
    base = approx_lof(df, k=5, n_planes=6, dim=8)
    probed = approx_lof(df, k=5, n_planes=6, dim=8, n_probes=3)
    assert probed.count() == 400
    assert probed.select("id").distinct().count() == 400
    iso_base = base.filter(F.col("lof").isNull()).count()
    iso_probed = probed.filter(F.col("lof").isNull()).count()
    assert iso_probed <= iso_base
