"""Streaming alert escalation: the running-count-in-state variant of
``AlertSystem._apply_escalation`` (``/root/reference/src/
anomaly_detection_toolkit/predictive_maintenance.py:577-596``).

The reference keeps ``self.alert_counts[key]`` alive for the lifetime
of the AlertSystem object and, per ``check_thresholds`` call,
increments it for every alert then escalates each alert against the
END-of-call count (``:560-561`` increments inside the loop,
``:577-596`` reads the final dict). Here that long-lived dict is
Spark state:

- the stateless stage (unpivot → level → message) is
  ``operators.alerts.alert_rows`` — no window/agg, so it runs
  unchanged on a streaming DataFrame;
- the per-(asset, feature) running count lives in
  ``applyInPandasWithState`` state, surviving micro-batches and (on a
  cluster) executor loss — the property the reference's in-process
  dict lacks;
- every alert in a micro-batch is escalated against the
  end-of-batch cumulative count, exactly the reference's semantics
  (so a single-batch stream reproduces the batch
  ``check_thresholds`` output bit-for-bit);
- optional processing-time TTL evicts idle keys so the state store
  stays bounded under asset churn.

Scale: state is one int64 per (asset, feature) ever alerted — tiny —
and the only shuffle is the groupBy on the (sparse) alert rows.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.alerts import _ESCALATE_NEXT, alert_rows

OUTPUT_SCHEMA = (
    "asset_id string, feature string, value double, raw_level string, "
    "level string, threshold double, key_count long, message string"
)
STATE_SCHEMA = "count long"


def _escalate_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    escalation: dict[str, dict[str, int]],
    ttl_ms: int | None,
) -> Iterator[pd.DataFrame]:
    asset_id, feature = key
    if state.hasTimedOut:
        state.remove()  # idle key: running count evicted
        yield pd.DataFrame(
            {c.split()[0]: [] for c in OUTPUT_SCHEMA.split(", ")}
        )
        return
    (count,) = state.get if state.exists else (0,)
    rows = pd.concat(list(pdfs), ignore_index=True)
    count += len(rows)  # all increments land before any escalation
    state.update((count,))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)

    def bump(raw: str) -> str:
        rules = escalation.get(raw)
        if rules and "min_count" in rules and count >= rules["min_count"]:
            return _ESCALATE_NEXT.get(raw, raw)
        return raw

    yield pd.DataFrame(
        {
            "asset_id": asset_id,
            "feature": feature,
            "value": rows["value"].astype(float),
            "raw_level": rows["raw_level"],
            "level": rows["raw_level"].map(bump),
            "threshold": rows["threshold"].astype(float),
            "key_count": count,
            "message": rows["message"],
        }
    )


def streaming_check_thresholds(
    stream_df: DataFrame,
    thresholds: dict[str, dict[str, float]],
    asset_col: str,
    escalation: dict[str, dict[str, int]] | None = None,
    state_ttl: str | None = None,
) -> DataFrame:
    """Streaming ``AlertSystem.check_thresholds`` with stateful
    escalation. Input: a streaming DataFrame carrying ``asset_col``
    plus the watched feature columns. Output stream: one alert row
    per breach with the escalated ``level`` and the cumulative
    ``key_count`` (reference ``alert_counts``) at end of batch.

    ``state_ttl`` (e.g. ``"1 hour"``): processing-time TTL after
    which an idle (asset, feature) key's running count is evicted.
    """
    from anomaly_detection_toolkit_spark.streaming import parse_duration_s

    alerts = alert_rows(stream_df, thresholds, asset_col)
    ttl_ms: int | None = None
    if state_ttl is not None:
        ttl_ms = int(parse_duration_s(state_ttl) * 1000)

    def fn(key, pdfs, state):
        return _escalate_group(key, pdfs, state, escalation or {}, ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl is not None
        else GroupStateTimeout.NoTimeout
    )
    return alerts.groupBy("asset_id", "feature").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
