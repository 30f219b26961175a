"""Ensemble detectors: voting + score combination.

Re-expression of ``/root/reference/src/anomaly_detection_toolkit/
ensemble.py`` as pure column arithmetic: member detectors contribute
``score_i`` / ``verdict_i`` columns in ONE projection over the fact
table, and every combination below is another projection on top — no
shuffle anywhere in the ensemble itself (the only jobs are the
members' own fit aggregations, plus one percentile pass when the
score-threshold predict mode is used).

Semantics parity:
- vote: verdict -1 iff ≥ ``voting_threshold`` members vote -1
  (``ensemble.py:63-70``);
- combined score mean/max/min/median over member scores
  (``ensemble.py:196-225``); median of n values matches
  ``np.median`` (mean of the two middle order statistics for even n);
- score-threshold predict: -1 iff combined score > 95th percentile of
  the combined scores (``ensemble.py:188-193``) — a genuinely
  two-pass operator (percentile agg job, then projection), the
  pattern documented in SURVEY §4.2.1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.base import (
    SCORE_COL,
    VERDICT_COL,
    Detector,
)


def vote_count(verdict_cols: Sequence[Column | str]) -> Column:
    """Number of member detectors voting -1 (``ensemble.py:94-111``)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in verdict_cols]
    out = (cols[0] == -1).cast("int")
    for c in cols[1:]:
        out = out + (c == -1).cast("int")
    return out


def vote_verdict(verdict_cols: Sequence[Column | str], voting_threshold: int = 2) -> Column:
    """-1 iff ≥ threshold members flagged (``ensemble.py:63-70``)."""
    return (
        F.when(vote_count(verdict_cols) >= voting_threshold, F.lit(-1))
        .otherwise(F.lit(1))
        .cast("int")
    )


def combine_scores(score_cols: Sequence[Column | str], method: str = "mean") -> Column:
    """Combine member scores (``ensemble.py:196-225``)."""
    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("double") for c in score_cols
    ]
    n = len(cols)
    if method == "mean":
        total = cols[0]
        for c in cols[1:]:
            total = total + c
        return total / F.lit(float(n))
    if method == "max":
        return cols[0] if n == 1 else F.greatest(*cols)
    if method == "min":
        return cols[0] if n == 1 else F.least(*cols)
    if method == "median":
        # np.median: mean of middle order statistics; sort the row's
        # scores as an array and index — still a pure projection
        arr = F.array_sort(F.array(*cols))
        if n % 2 == 1:
            return arr[n // 2]
        return (arr[n // 2 - 1] + arr[n // 2]) / F.lit(2.0)
    raise ValueError(f"unknown combination method {method!r}; use mean/max/min/median")


class VotingEnsemble(Detector):
    """Voting ensemble over member detectors (``ensemble.py:11-111``).

    ``transform`` appends per-member ``score_<i>``/``verdict_<i>``
    columns plus the ensemble ``score`` (mean of member scores) and
    ``verdict`` (vote) — one projection, everything codegen'd.
    """

    def __init__(self, detectors: Sequence[Detector], voting_threshold: int = 2) -> None:
        super().__init__()
        self.detectors = list(detectors)
        self.voting_threshold = voting_threshold

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "VotingEnsemble":
        for d in self.detectors:
            d.fit(df, cols)
        self.feature_cols = list(cols)
        self.is_fitted = True
        return self

    def member_columns(self) -> tuple[list[Column], list[Column]]:
        scores, verdicts = [], []
        for i, d in enumerate(self.detectors):
            s = d.score_expr()
            scores.append(s.alias(f"score_{i}"))
            verdicts.append(d.verdict_from_score(s).alias(f"verdict_{i}"))
        return scores, verdicts

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_fitted()
        scores, verdicts = self.member_columns()
        out = df.select("*", *scores, *verdicts)
        score_names = [f"score_{i}" for i in range(len(self.detectors))]
        verdict_names = [f"verdict_{i}" for i in range(len(self.detectors))]
        return out.withColumn(SCORE_COL, combine_scores(score_names, "mean")).withColumn(
            VERDICT_COL, vote_verdict(verdict_names, self.voting_threshold)
        )


class EnsembleDetector(Detector):
    """Score-combining ensemble (``ensemble.py:114-225``).

    ``predict`` semantics: voting when ``voting_threshold`` is set;
    otherwise combined-score > its 95th percentile — the latter runs
    one extra aggregation job over the scored frame (two-pass; the
    scored intermediate should be cached by the caller when the input
    scan is expensive).
    """

    def __init__(
        self,
        detectors: Sequence[Detector],
        combination_method: str = "mean",
        voting_threshold: int | None = None,
        percentile: float = 0.95,
        exact_percentile: bool = True,
    ) -> None:
        super().__init__()
        self.detectors = list(detectors)
        self.combination_method = combination_method
        self.voting_threshold = voting_threshold
        self.percentile = percentile
        self.exact_percentile = exact_percentile

    def fit(self, df: DataFrame, cols: Sequence[str]) -> "EnsembleDetector":
        for d in self.detectors:
            d.fit(df, cols)
        self.feature_cols = list(cols)
        self.is_fitted = True
        return self

    def score_expr(self) -> Column:
        self._check_fitted()
        return combine_scores(
            [d.score_expr() for d in self.detectors], self.combination_method
        )

    def transform(self, df: DataFrame) -> DataFrame:
        """score + verdict; the percentile mode triggers one extra
        aggregation job to learn the threshold (``ensemble.py:191``)."""
        self._check_fitted()
        scored = df.withColumn(SCORE_COL, self.score_expr())
        if self.voting_threshold is not None:
            verdicts = [
                d.verdict_from_score(d.score_expr()) for d in self.detectors
            ]
            return scored.withColumn(
                VERDICT_COL, vote_verdict(verdicts, self.voting_threshold)
            )
        q = F.col(SCORE_COL).cast("double")
        if self.exact_percentile:
            thr_expr = F.percentile(q, F.lit(self.percentile))
        else:
            thr_expr = F.percentile_approx(q, F.lit(self.percentile), F.lit(10000))
        thr = scored.agg(thr_expr.alias("thr")).first()["thr"]
        return scored.withColumn(
            VERDICT_COL,
            F.when(F.col(SCORE_COL) > F.lit(float(thr)), F.lit(-1))
            .otherwise(F.lit(1))
            .cast("int"),
        )
