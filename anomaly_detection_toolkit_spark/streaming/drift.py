"""Streaming distribution-drift monitor: the DriftCheck semantics
(``plans/checks.py`` — per-histogram KS max-CDF-gap + PSI vs a
baseline) applied to a STREAM with event-time windows.

Shape: finalize-on-watermark-expiry. One stateful operator keyed by
event-time window start:

- state = the window's bucket histogram (two parallel arrays);
- each micro-batch folds the group's rows into the histogram and
  (re)arms an EventTimeTimeout at ``window_end + delay``;
- when the watermark passes that point the window can no longer
  change (Spark late-filters rows at/behind the watermark under
  EventTimeTimeout), so the timeout callback computes KS/PSI against
  the broadcast baseline, emits ONE row per window, and removes the
  state — emission and eviction are the same event, state is bounded
  by the number of open windows.

The baseline histogram is a driver-side dict of bucket → proportion
(the broadcast-fitted-state pattern: tiny, closed over by the kernel),
typically the trailing batch histogram from ``DriftCheck`` /
``column_stats`` over yesterday's data.

Scale: the only shuffle is groupBy(window_start); per-group state is
one small histogram; watermark + timeout bound both state size and
result latency. Chained windowed-agg → second stateful op is NOT used
(multiple stateful operators have planner restrictions); the single
applyInPandasWithState covers accumulate + finalize.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "window_start double, n long, ks double, psi double, verdict int"
)
STATE_SCHEMA = "buckets array<double>, counts array<long>"

_EPS = 1e-6


def drift_stats(
    hist: dict[float, int], baseline: dict[float, float]
) -> tuple[int, float, float]:
    """(n, ks, psi) of a window histogram vs baseline proportions —
    the same max-CDF-gap / Σ(p-q)·ln(p/q) math as DriftCheck, over
    the union bucket domain in bucket order."""
    n = sum(hist.values())
    domain = sorted(set(hist) | set(baseline))
    cdf_p = cdf_q = 0.0
    ks = 0.0
    psi = 0.0
    for b in domain:
        p = (hist.get(b, 0) / n) if n else 0.0
        q = baseline.get(b, 0.0)
        cdf_p += p
        cdf_q += q
        ks = max(ks, abs(cdf_p - cdf_q))
        psi += (p - q) * math.log(max(p, _EPS) / max(q, _EPS))
    return n, ks, psi


def _drift_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    baseline: dict[float, float],
    window_s: float,
    delay_s: float,
    ks_threshold: float,
) -> Iterator[pd.DataFrame]:
    (window_start,) = key
    if state.hasTimedOut:
        buckets, counts = state.get
        hist = dict(zip(buckets, counts))
        state.remove()  # finalize == evict
        n, ks, psi = drift_stats(hist, baseline)
        yield pd.DataFrame(
            {
                "window_start": [float(window_start)],
                "n": [n],
                "ks": [ks],
                "psi": [psi],
                "verdict": [-1 if ks > ks_threshold else 1],
            }
        )
        return
    if state.exists:
        buckets, counts = state.get
        hist = dict(zip(buckets, counts))
    else:
        hist = {}
    for pdf in pdfs:
        for b, c in pdf["bucket"].value_counts().items():
            hist[float(b)] = hist.get(float(b), 0) + int(c)
    state.update((list(hist.keys()), list(hist.values())))
    wm = state.getCurrentWatermarkMs()
    timeout_ms = max(int((window_start + window_s + delay_s) * 1000), wm + 1)
    state.setTimeoutTimestamp(timeout_ms)
    yield pd.DataFrame(
        {c: [] for c in ("window_start", "n", "ks", "psi", "verdict")}
    )


def streaming_drift_scores(
    stream_df: DataFrame,
    baseline: dict[float, float],
    window_s: float = 3600.0,
    watermark_delay: str = "10 minutes",
    ks_threshold: float = 0.15,
    ts_col: str = "ts",
    bucket_col: str = "bucket",
) -> DataFrame:
    """(window_start, n, ks, psi, verdict) — one row per FINALIZED
    event-time window; a window emits when the watermark passes its
    end + delay, then its state is dropped."""
    from anomaly_detection_toolkit_spark.streaming import parse_duration_s

    delay_s = parse_duration_s(watermark_delay)
    src = (
        stream_df.select(
            (
                F.floor(F.col(ts_col).cast("double") / F.lit(window_s))
                * F.lit(window_s)
            ).alias("window_start"),
            F.col(bucket_col).cast("double").alias("bucket"),
            F.col(ts_col).cast("double").cast("timestamp").alias("_event_time"),
        )
        .withWatermark("_event_time", watermark_delay)
    )

    def fn(key, pdfs, state):
        return _drift_group(
            key, pdfs, state, baseline, window_s, delay_s, ks_threshold
        )

    return src.groupBy("window_start").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
