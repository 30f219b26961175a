"""Driver-contract queries for the PCA detector (SURVEY §2 ops
15-21). All three rows are under the driver's HARD hash gate: the 2-D
and full-rank-8-D scores have closed forms, and the partial-rank 8-D
row's eigendecomposition runs INSIDE DuckDB via unrolled cyclic
Jacobi rotations (``_jacobi_ctes``) — quadratic convergence makes 6
sweeps (168 rotations) exact to well below the round(.,4) grid, and
convergence speed is eigen-gap-independent (unlike power iteration).
Exact numerical parity vs the reference math is additionally covered
by ``tests/test_pca.py`` golden tests against numpy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.entry_queries import r4, register, register_extra
from anomaly_detection_toolkit_spark.operators.pca import PCADetector
from anomaly_detection_toolkit_spark.sources.testdata import load_table

_PCA_DIMS = 8  # leading embedding dims as feature columns


def _embedding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "embeddings", sf_dir)
    return df.select(
        "vec_id",
        *[F.col("embedding")[i].cast("double").alias(f"f{i}") for i in range(_PCA_DIMS)],
    )


# --- partial-rank 8-D oracle: eigh IN DuckDB via unrolled Jacobi ---
#
# Cyclic Jacobi diagonalization of the 8x8 correlation matrix: per
# rotation (p,q) a `rot` CTE derives (c, s) from the classic
# tau = cot(2θ) = (aqq-app)/(2·apq) smaller-root formula, an `a` CTE
# applies the full two-sided similarity update (A' = GᵀAG, A'[p,q]
# set to exactly 0), and a `v` CTE accumulates the eigenvector basis
# (V' = VG). 6 sweeps × 28 pivots = 168 rotations; Jacobi's
# quadratic convergence puts the off-diagonal mass near 1e-16 —
# orders below the round(.,4) grid — and is INDEPENDENT of the
# eigenvalue gaps (the sf0.01 spectrum's smallest gap is 0.0086, so
# the top-k pick is also stable across engines). Downstream the SQL
# replays PCADetector exactly: variance-ratio pick
# k = searchsorted_right(cum_ratio, 0.8)+1 for reconstruction,
# fixed k=4 with λ·n/(n-1) (np.cov ddof) weights for Mahalanobis,
# and quantile_cont(0.95) thresholds.


def _jacobi_ctes(d: int, sweeps: int) -> tuple[str, str, str]:
    ctes = []
    a_prev, v_prev = "a0", "v0"
    t = 0
    for _ in range(sweeps):
        for p in range(d):
            for q in range(p + 1, d):
                t += 1
                rot, a_cur, v_cur = f"rot{t}", f"a{t}", f"v{t}"
                ctes.append(f"""
    {rot} AS MATERIALIZED (
      SELECT app, aqq, apq, c, s FROM (
        SELECT app, aqq, apq,
               CASE WHEN apq = 0 THEN 1.0
                    ELSE 1.0 / sqrt(1.0 + tt * tt) END AS c,
               CASE WHEN apq = 0 THEN 0.0
                    ELSE tt / sqrt(1.0 + tt * tt) END AS s
        FROM (
          SELECT app, aqq, apq,
                 CASE WHEN apq = 0 THEN 0.0
                      WHEN tau >= 0 THEN 1.0 / (tau + sqrt(1.0 + tau * tau))
                      ELSE 1.0 / (tau - sqrt(1.0 + tau * tau)) END AS tt
          FROM (
            SELECT
              (SELECT v FROM {a_prev} WHERE i = {p} AND j = {p}) AS app,
              (SELECT v FROM {a_prev} WHERE i = {q} AND j = {q}) AS aqq,
              (SELECT v FROM {a_prev} WHERE i = {p} AND j = {q}) AS apq,
              CASE WHEN (SELECT v FROM {a_prev} WHERE i = {p} AND j = {q}) = 0
                   THEN 0.0
                   ELSE ((SELECT v FROM {a_prev} WHERE i = {q} AND j = {q})
                       - (SELECT v FROM {a_prev} WHERE i = {p} AND j = {p}))
                      / (2.0 * (SELECT v FROM {a_prev}
                                WHERE i = {p} AND j = {q}))
              END AS tau
          )
        )
      )
    ),
    {a_cur} AS MATERIALIZED (
      SELECT m.i, m.j,
        CASE
          WHEN m.i = {p} AND m.j = {p}
            THEN r.c * r.c * r.app - 2.0 * r.c * r.s * r.apq + r.s * r.s * r.aqq
          WHEN m.i = {q} AND m.j = {q}
            THEN r.s * r.s * r.app + 2.0 * r.c * r.s * r.apq + r.c * r.c * r.aqq
          WHEN (m.i = {p} AND m.j = {q}) OR (m.i = {q} AND m.j = {p}) THEN 0.0
          WHEN m.j = {p} THEN r.c * m.v - r.s * cq.v
          WHEN m.j = {q} THEN r.s * cp.v + r.c * m.v
          WHEN m.i = {p} THEN r.c * m.v - r.s * rq.v
          WHEN m.i = {q} THEN r.s * rp.v + r.c * m.v
          ELSE m.v END AS v
      FROM {a_prev} m
      CROSS JOIN {rot} r
      LEFT JOIN {a_prev} cp ON cp.i = m.i AND cp.j = {p}
      LEFT JOIN {a_prev} cq ON cq.i = m.i AND cq.j = {q}
      LEFT JOIN {a_prev} rp ON rp.j = m.j AND rp.i = {p}
      LEFT JOIN {a_prev} rq ON rq.j = m.j AND rq.i = {q}
    ),
    {v_cur} AS MATERIALIZED (
      SELECT m.i, m.j,
        CASE WHEN m.j = {p} THEN r.c * m.v - r.s * cq.v
             WHEN m.j = {q} THEN r.s * cp.v + r.c * m.v
             ELSE m.v END AS v
      FROM {v_prev} m
      CROSS JOIN {rot} r
      LEFT JOIN {v_prev} cp ON cp.i = m.i AND cp.j = {p}
      LEFT JOIN {v_prev} cq ON cq.i = m.i AND cq.j = {q}
    )""")
                a_prev, v_prev = a_cur, v_cur
    return ",".join(ctes), a_prev, v_prev


def _pca_partialrank_sql(d: int = _PCA_DIMS, sweeps: int = 6) -> str:
    feats = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(d)
    )
    stats = ", ".join(
        f"avg(x{i}) AS m{i}, stddev_pop(x{i}) AS s{i}" for i in range(d)
    )
    zcols = ", ".join(
        f"(x{i} - m{i}) / (CASE WHEN s{i} = 0 THEN 1.0 ELSE s{i} END) AS z{i}"
        for i in range(d)
    )
    corr_rows = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, avg(z{i} * z{j}) AS v FROM z"
        for i in range(d)
        for j in range(d)
    )
    ident = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, CAST({1 if i == j else 0} AS DOUBLE) AS v"
        for i in range(d)
        for j in range(d)
    )
    zu = " UNION ALL ".join(
        f"SELECT id, {i} AS k, z{i} AS z FROM z" for i in range(d)
    )
    jac, a_last, v_last = _jacobi_ctes(d, sweeps)
    return f"""
    WITH f AS MATERIALIZED (SELECT vec_id AS id, {feats} FROM embeddings),
    s AS MATERIALIZED (SELECT count(*) AS n, {stats} FROM f),
    z AS MATERIALIZED (SELECT id, n, {zcols} FROM f, s),
    corr AS MATERIALIZED ({corr_rows}),
    a0 AS MATERIALIZED (SELECT * FROM corr),
    v0 AS MATERIALIZED ({ident}),{jac},
    eig AS MATERIALIZED (
      SELECT j AS comp, v AS lam,
             row_number() OVER (ORDER BY v DESC, j) AS rk
      FROM {a_last} WHERE i = j
    ),
    ksel AS (
      SELECT least(CAST(count(*) AS INTEGER) + 1, {d}) AS k FROM (
        SELECT rk, sum(lam) OVER (ORDER BY rk) / (SELECT sum(lam) FROM eig)
          AS cum
        FROM eig
      ) WHERE cum <= 0.8
    ),
    zu AS MATERIALIZED ({zu}),
    proj AS MATERIALIZED (
      SELECT zu.id, e.rk, e.lam, sum(zu.z * vf.v) AS p
      FROM zu
      JOIN {v_last} vf ON vf.i = zu.k
      JOIN eig e ON e.comp = vf.j
      GROUP BY zu.id, e.rk, e.lam
    ),
    zz AS (SELECT id, sum(z * z) AS zz FROM zu GROUP BY id),
    sc AS (
      SELECT zz.id,
             greatest(zz.zz - (SELECT sum(p.p * p.p) FROM proj p
                               WHERE p.id = zz.id
                                 AND p.rk <= (SELECT k FROM ksel)), 0.0)
               AS score_recon,
             sqrt(greatest((SELECT sum(p.p * p.p / (p.lam * s.n / (s.n - 1.0)))
                            FROM proj p, s WHERE p.id = zz.id AND p.rk <= 4),
                           0.0)) AS score_maha
      FROM zz
    ),
    thr AS (
      SELECT quantile_cont(score_recon, 0.95) AS tr,
             quantile_cont(score_maha, 0.95) AS tm
      FROM sc
    )
    SELECT id AS vec_id,
           round(score_recon, 4) AS score_recon,
           CAST(CASE WHEN score_recon > tr THEN -1 ELSE 1 END AS INTEGER)
             AS verdict_recon,
           round(score_maha, 4) AS score_maha,
           CAST(CASE WHEN score_maha > tm THEN -1 ELSE 1 END AS INTEGER)
             AS verdict_maha
    FROM sc, thr
    """


@register("pca_partialrank_embeddings", _pca_partialrank_sql())
def pca_partialrank_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both partial-rank score paths (variance-ratio component pick +
    reconstruction error; fixed k=4 + Mahalanobis) in one row set,
    hash-checked against the Jacobi-in-DuckDB eigendecomposition
    oracle above; numerical parity vs numpy additionally lives in
    tests/test_pca.py golden tests."""
    feats = _embedding_features(spark, sf_dir)
    cols = [f"f{i}" for i in range(_PCA_DIMS)]
    recon = PCADetector(n_components=0.8, score_method="reconstruction").fit(
        feats, cols
    )
    maha = PCADetector(n_components=4, score_method="mahalanobis").fit(feats, cols)
    r = recon.transform(feats).select(
        "vec_id",
        r4(F.col("score")).alias("score_recon"),
        F.col("verdict").alias("verdict_recon"),
    )
    m = maha.transform(feats).select(
        "vec_id",
        r4(F.col("score")).alias("score_maha"),
        F.col("verdict").alias("verdict_maha"),
    )
    return r.join(m, "vec_id")


# --- EXACT PCA oracles (2-D): the eigendecomposition drops out.
# Full-rank Mahalanobis is eigenbasis-invariant:
#   score = sqrt((n-1)/n * z'C^-1 z),  C = [[1, r], [r, 1]]
#   => (z1^2 - 2 r z1 z2 + z2^2) / (1 - r^2),
# and for k=1 of d=2 the correlation matrix's eigenvectors are FIXED
# ([1,1]/sqrt2, [1,-1]/sqrt2 — only the order depends on sign(r)), so
# the reconstruction error is the discarded coordinate squared:
#   (z1 -/+ z2)^2 / 2  for r >/< 0.
# Both close over the same percentile(0.95) threshold the detector
# fits, putting ops 15-21's scoring + threshold + verdict behind the
# hard gate (the 8-D queries above stay rows-only for eigh itself). ---

_PCA2_BASE = """
    WITH f AS (
      SELECT vec_id AS id, CAST(embedding[1] AS DOUBLE) AS x1,
             CAST(embedding[2] AS DOUBLE) AS x2
      FROM embeddings
    ),
    s AS (
      SELECT count(*) AS n, avg(x1) AS m1, avg(x2) AS m2,
             stddev_pop(x1) AS s1, stddev_pop(x2) AS s2,
             corr(x1, x2) AS r
      FROM f
    ),
    z AS (
      SELECT id,
             (x1 - m1) / (CASE WHEN s1 = 0 THEN 1.0 ELSE s1 END) AS z1,
             (x2 - m2) / (CASE WHEN s2 = 0 THEN 1.0 ELSE s2 END) AS z2,
             n, r
      FROM f, s
    ),
    sc AS (
      SELECT id,
             sqrt(((n - 1.0) / n) * (z1*z1 - 2*r*z1*z2 + z2*z2) / (1.0 - r*r))
               AS score_maha,
             CASE WHEN r > 0 THEN (z1 - z2)*(z1 - z2) / 2.0
                  ELSE (z1 + z2)*(z1 + z2) / 2.0 END AS score_recon
      FROM z
    ),
    t AS (
      SELECT quantile_cont(score_maha, 0.95) AS thr_m,
             quantile_cont(score_recon, 0.95) AS thr_r
      FROM sc
    )
    SELECT id,
           round(score_maha, 4) AS score_maha,
           CAST(CASE WHEN score_maha > thr_m THEN -1 ELSE 1 END AS INTEGER)
             AS verdict_maha,
           round(score_recon, 4) AS score_recon,
           CAST(CASE WHEN score_recon > thr_r THEN -1 ELSE 1 END AS INTEGER)
             AS verdict_recon
    FROM sc, t
"""


def _embedding_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, "embeddings", sf_dir)
    return df.select(
        F.col("vec_id").alias("id"),
        F.col("embedding")[0].cast("double").alias("x1"),
        F.col("embedding")[1].cast("double").alias("x2"),
    )


# Retired from the 50-slot driver gate in round 3 (slot freed for
# dedup_clusters_documents): every path it gated — suff-stats fit,
# Mahalanobis + reconstruction scoring, quantile threshold, verdict —
# is hash-gated through the REAL eigh/pinv code by
# pca_maha8d_full_embeddings and pca_partialrank_embeddings above.
# Kept locally verifiable via register_extra (tools/parity.py merges
# EXTRA_PAIRS) so the closed-form cross-check remains one command.
@register_extra("pca_2d_embeddings", _PCA2_BASE)
def pca_2d_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both closed-form 2-D score paths (full-rank Mahalanobis; k=1
    reconstruction error) through the real detector, one row set."""
    feats = _embedding_2d(spark, sf_dir)
    maha = PCADetector(n_components=2, score_method="mahalanobis").fit(
        feats, ["x1", "x2"]
    )
    recon = PCADetector(n_components=1, score_method="reconstruction").fit(
        feats, ["x1", "x2"]
    )
    m = maha.transform(feats).select(
        "id",
        r4(F.col("score")).alias("score_maha"),
        F.col("verdict").alias("verdict_maha"),
    )
    r = recon.transform(feats).select(
        "id",
        r4(F.col("score")).alias("score_recon"),
        F.col("verdict").alias("verdict_recon"),
    )
    return m.join(r, "id")


# --- 8-D full-rank Mahalanobis, EXACT oracle: the correlation
# matrix's inverse is computed INSIDE DuckDB by 8 Gauss-Jordan
# elimination steps over the augmented (i, j, v) row form (C | I) —
# no pivoting needed for a full-rank correlation matrix — then
# score = sqrt((n-1)/n * z' C^-1 z) via an unpivoted z x M x z join.
# Full rank k=d makes the score eigenbasis-invariant, so Spark's
# eigh-based detector and the elimination-based oracle must agree. ---


def _gauss_jordan_ctes(d: int, prefix: str = "m") -> tuple[str, str]:
    """CTE chain inverting a d×d matrix given as augmented (i, j, v)
    rows in ``{prefix}0`` (left block = matrix, right block = I).
    ``prefix`` lets several independent inversions coexist in one
    query (the MCD C-step oracle runs one per unrolled iteration)."""
    steps = []
    prev = f"{prefix}0"
    for k in range(d):
        cur = f"{prefix}{k + 1}"
        steps.append(f"""
    {cur} AS MATERIALIZED (
      SELECT m.i, m.j,
             CASE WHEN m.i = {k} THEN m.v / p.piv
                  ELSE m.v - ik.v * (kj.v / p.piv) END AS v
      FROM {prev} m
      JOIN (SELECT v AS piv FROM {prev} WHERE i = {k} AND j = {k}) p ON TRUE
      JOIN (SELECT i, v FROM {prev} WHERE j = {k}) ik ON ik.i = m.i
      JOIN (SELECT j, v FROM {prev} WHERE i = {k}) kj ON kj.j = m.j
    )""")
        prev = cur
    return ",".join(steps), prev


def _pca8_sql(d: int = 8) -> str:
    feats = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(d)
    )
    stats = ", ".join(
        f"avg(x{i}) AS m{i}, stddev_pop(x{i}) AS s{i}" for i in range(d)
    )
    zcols = ", ".join(
        f"(x{i} - m{i}) / (CASE WHEN s{i} = 0 THEN 1.0 ELSE s{i} END) AS z{i}"
        for i in range(d)
    )
    # population correlation entries of the standardized features
    corr_rows = " UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, avg(z{i} * z{j}) AS v FROM z"
        for i in range(d)
        for j in range(d)
    )
    ident = " UNION ALL ".join(
        f"SELECT {i} AS i, {j + d} AS j, CAST({1 if i == j else 0} AS DOUBLE) AS v"
        for i in range(d)
        for j in range(d)
    )
    zu = " UNION ALL ".join(
        f"SELECT id, {i} AS k, z{i} AS z FROM z" for i in range(d)
    )
    gj, last = _gauss_jordan_ctes(d)
    return f"""
    WITH f AS MATERIALIZED (SELECT vec_id AS id, {feats} FROM embeddings),
    s AS MATERIALIZED (SELECT count(*) AS n, {stats} FROM f),
    z AS MATERIALIZED (SELECT id, n, {zcols} FROM f, s),
    corr AS MATERIALIZED ({corr_rows}),
    m0 AS MATERIALIZED (SELECT * FROM corr UNION ALL {ident}),{gj},
    inv AS MATERIALIZED (SELECT i, j - {d} AS j, v FROM {last} WHERE j >= {d}),
    zu AS MATERIALIZED ({zu}),
    q AS (
      SELECT a.id, sum(a.z * inv.v * b.z) AS quad
      FROM zu a
      JOIN inv ON inv.i = a.k
      JOIN zu b ON b.id = a.id AND b.k = inv.j
      GROUP BY a.id
    ),
    sc AS (
      SELECT q.id,
             sqrt(greatest(((s.n - 1.0) / s.n) * q.quad, 0.0)) AS score
      FROM q, s
    ),
    t AS (SELECT quantile_cont(score, 0.95) AS thr FROM sc)
    SELECT id, round(score, 4) AS score,
           CAST(CASE WHEN score > thr THEN -1 ELSE 1 END AS INTEGER) AS verdict
    FROM sc, t
    """


# round 4: retired to register_extra — pca_partialrank_embeddings
# gates the same scaler/eigh/Mahalanobis path through the harder
# in-DuckDB Jacobi oracle, so this Gauss-Jordan replay is redundant
# in-window coverage
@register_extra("pca_maha8d_full_embeddings", _pca8_sql(8))
def pca_maha8d_full_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _embedding_features(spark, sf_dir).withColumnRenamed("vec_id", "id")
    det = PCADetector(n_components=_PCA_DIMS, score_method="mahalanobis").fit(
        feats, [f"f{i}" for i in range(_PCA_DIMS)]
    )
    return det.transform(feats).select(
        "id", r4(F.col("score")).alias("score"), "verdict"
    )
