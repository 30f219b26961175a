"""Structured Streaming re-expression of the reference's real-time
ingestion (``/root/reference/src/anomaly_detection_toolkit/
predictive_maintenance.py:1090-1246``).

The reference holds a per-asset ``deque(maxlen=window_size)`` and
processes the window once full (``:1153-1184``). Here that state
machine is ``groupBy(asset).applyInPandasWithState``:

- state = the last ``window_size`` (ts, value) points per asset —
  exactly the deque, persisted in Spark's state store (RocksDB/HDFS
  on a cluster) so it survives executor loss, which the reference's
  in-process dict cannot;
- each micro-batch appends the group's new rows in timestamp order
  and emits one row per input point: ``status='buffering'`` with the
  fill level while the buffer is short (``:1181-1184``), else
  ``status='processed'`` plus the window statistics and a rolling
  z-score verdict on the newest point (the detector step of
  ``process_window``, ``:1186-1222``);
- late/duplicate data policy (the reference has none — its deque
  just appends): rows are folded in ts order per batch; callers add
  ``withWatermark`` upstream to bound true disorder. Documented, not
  hidden.

The kernel is pandas/numpy over whole groups per batch — Arrow
transfer, no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "asset_id string, ts double, status string, buffer_size int, "
    "win_mean double, win_std double, score double, verdict int"
)
STATE_SCHEMA = "tss array<double>, vals array<double>, max_ts double"


def _process_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    window_size: int,
    threshold: float,
    late_delay_s: float | None = None,
    ttl_s: float | None = None,
) -> Iterator[pd.DataFrame]:
    (asset_id,) = key
    if state.hasTimedOut:
        # idle-key eviction: the watermark has passed this asset's
        # (max_ts + TTL) timeout — drop the buffer so the state store
        # stays bounded under asset churn. A later point for this
        # asset starts a fresh buffer ('buffering' from size 1).
        state.remove()
        yield pd.DataFrame(
            {k: [] for k in (
                "asset_id", "ts", "status", "buffer_size",
                "win_mean", "win_std", "score", "verdict",
            )}
        )
        return
    if state.exists:
        tss, vals, max_ts = state.get
        tss, vals = list(tss), list(vals)
    else:
        tss, vals, max_ts = [], [], float("-inf")
    out: dict[str, list] = {k: [] for k in (
        "asset_id", "ts", "status", "buffer_size", "win_mean", "win_std", "score", "verdict"
    )}
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    for ts, val in zip(rows["ts"].astype(float), rows["value"].astype(float)):
        max_ts = max(max_ts, ts)
        # late-data policy: rows older than the per-asset high-water
        # mark minus the allowed delay are dropped, not folded in
        # (Spark's watermark does NOT auto-filter input rows for
        # applyInPandasWithState — it only drives state timeouts — so
        # the policy is enforced here, in state)
        if late_delay_s is not None and ts < max_ts - late_delay_s:
            continue
        tss.append(ts)
        vals.append(val)
        if len(vals) > window_size:  # deque(maxlen=w) drop-oldest
            tss, vals = tss[-window_size:], vals[-window_size:]
        out["asset_id"].append(asset_id)
        out["ts"].append(ts)
        out["buffer_size"].append(len(vals))
        if len(vals) < window_size:
            out["status"].append("buffering")
            out["win_mean"].append(None)
            out["win_std"].append(None)
            out["score"].append(None)
            out["verdict"].append(None)
        else:
            w = np.asarray(vals)
            mu = float(w.mean())
            sd = float(w.std())  # population std (ZScoreDetector parity)
            sd_g = 1.0 if sd == 0.0 else sd
            score = abs((val - mu) / sd_g)
            out["status"].append("processed")
            out["win_mean"].append(mu)
            out["win_std"].append(sd)
            out["score"].append(score)
            out["verdict"].append(-1 if score > threshold else 1)
    state.update((tss, vals, max_ts))
    if ttl_s is not None:
        # EventTimeTimeout: evict this asset's buffer once the global
        # watermark passes (its newest point + TTL). Clamped above the
        # current watermark — Spark rejects timeouts at/behind it.
        wm_ms = state.getCurrentWatermarkMs()
        timeout_ms = max(int((max_ts + ttl_s) * 1000), wm_ms + 1)
        state.setTimeoutTimestamp(timeout_ms)
    yield pd.DataFrame(out)


def sliding_buffer_scores(
    stream_df: DataFrame,
    window_size: int = 10,
    threshold: float = 3.0,
    asset_col: str = "asset_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str | None = None,
    ttl_eviction: bool = False,
) -> DataFrame:
    """Stateful sliding-window scoring over a streaming DataFrame.

    Input stream schema: (asset_col string, ts_col double-castable,
    value_col double-castable). Returns the OUTPUT_SCHEMA stream.

    Late-data policy: with ``watermark_delay`` (e.g. ``"10 seconds"``)
    rows older than the PER-ASSET event-time high-water mark minus the
    delay are DROPPED before they reach the buffer — the documented
    upgrade over the reference's deque, which appends arbitrarily late
    points in arrival order (``predictive_maintenance.py:1153-1184``).
    The drop is enforced inside the state function, so it is purely
    per-asset: a slow-but-in-order asset is never affected by faster
    assets. Without a delay the operator reproduces the reference's
    fold-in-arrival-order behaviour exactly.

    State eviction is OPT-IN via ``ttl_eviction=True`` (requires
    ``watermark_delay``): the operator then runs with
    ``EventTimeTimeout``, evicting an asset's buffer once the GLOBAL
    watermark passes (its newest point + delay) — bounding the state
    store under asset churn. CAVEAT (the reason this is opt-in):
    under EventTimeTimeout Spark ALSO late-filters input rows
    at/behind the global watermark before the state fn, coupling
    assets — a slow-but-in-order asset's rows are silently discarded
    once faster assets advance the watermark. ``watermark_delay``
    alone keeps the decoupled per-asset policy (NoTimeout,
    no eviction, no global-watermark input filtering).
    """
    from pyspark.sql import functions as F

    src = stream_df.select(
        F.col(asset_col).cast("string").alias("asset_id"),
        F.col(ts_col).cast("double").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    )
    from anomaly_detection_toolkit_spark.streaming import parse_duration_s

    if ttl_eviction and watermark_delay is None:
        raise ValueError("ttl_eviction=True requires watermark_delay")

    late_delay_s: float | None = None
    if watermark_delay is not None:
        late_delay_s = parse_duration_s(watermark_delay)
        src = src.withColumn(
            "_event_time", F.col("ts").cast("timestamp")
        ).withWatermark("_event_time", watermark_delay)

    # the state fn only arms setTimeoutTimestamp when eviction is on
    # (calling it under NoTimeout raises)
    ttl_s = late_delay_s if ttl_eviction else None

    def fn(key, pdfs, state):
        return _process_group(
            key, pdfs, state, window_size, threshold, late_delay_s, ttl_s
        )

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_eviction
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("asset_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def reference_replay(
    points: Iterable[tuple[str, float, float]], window_size: int = 10, threshold: float = 3.0
) -> list[dict]:
    """The reference's single-process deque loop (``:1153-1222``),
    reused by tests as the golden model for the streaming operator."""
    from collections import defaultdict, deque

    buffers: dict[str, deque] = defaultdict(lambda: deque(maxlen=window_size))
    results = []
    for asset, ts, val in points:
        buf = buffers[asset]
        buf.append(val)
        if len(buf) < window_size:
            results.append(
                {"asset_id": asset, "ts": ts, "status": "buffering", "buffer_size": len(buf)}
            )
        else:
            w = np.asarray(buf)
            mu, sd = float(w.mean()), float(w.std())
            sd_g = 1.0 if sd == 0.0 else sd
            score = abs((val - mu) / sd_g)
            results.append(
                {
                    "asset_id": asset,
                    "ts": ts,
                    "status": "processed",
                    "buffer_size": len(buf),
                    "win_mean": mu,
                    "win_std": sd,
                    "score": score,
                    "verdict": -1 if score > threshold else 1,
                }
            )
    return results
