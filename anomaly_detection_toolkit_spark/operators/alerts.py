"""Alert system: threshold checks, escalation, recent top-k.

Re-expression of ``/root/reference/src/anomaly_detection_toolkit/
predictive_maintenance.py:452-623`` (AlertSystem) without the
per-value Python loop (``:532-561``):

- **unpivot** the watched feature columns with ``stack`` (1 row per
  (entity, feature) — a codegen'd generator, no shuffle);
- **level determination**: per-feature CASE chain checked high→low
  (failure ≥ critical ≥ warning ≥ info, breach = ``value >=
  threshold``, ``:571-575``) — thresholds are driver-side literals
  baked into the expression, the broadcast-fitted-state pattern;
- **message**: ``format_string`` replica of the reference's f-string
  (``:541-544``), built from the PRE-escalation level (the reference
  formats the message before escalating, then mutates only the
  level);
- **escalation** (``:577-596``): count alerts per (asset, feature)
  key — a window count over the alert rows, matching the reference's
  end-of-batch counts — and bump warning→critical→failure when the
  key's count ≥ ``min_count``;
- **recent top-k** (``:598-623``): ``row_number`` over
  (partition, order desc) ≤ n — Catalyst plans the global variant as
  ``TakeOrderedAndProject``.

Scale: the only shuffle is the window partition on (asset, feature)
over the (sparse) alert rows, not the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LEVELS_DESC = ("failure", "critical", "warning", "info")
_ESCALATE_NEXT = {"warning": "critical", "critical": "failure"}


def _level_case(feature: str, thresholds: dict[str, dict[str, float]]) -> Column:
    """Highest breached level for one feature, checked high→low."""
    conf = thresholds.get(feature, {})
    expr: Column = F.lit(None).cast("string")
    for level in reversed(LEVELS_DESC):  # build chain so failure wins
        if level in conf:
            expr = F.when(
                (F.col("feature") == feature) & (F.col("value") >= F.lit(conf[level])),
                F.lit(level),
            ).otherwise(expr)
    return expr


def _threshold_case(feature: str, thresholds: dict[str, dict[str, float]]) -> Column:
    conf = thresholds.get(feature, {})
    expr: Column = F.lit(None).cast("double")
    for level in reversed(LEVELS_DESC):
        if level in conf:
            expr = F.when(
                (F.col("feature") == feature) & (F.col("value") >= F.lit(conf[level])),
                F.lit(float(conf[level])),
            ).otherwise(expr)
    return expr


def alert_rows(
    df: DataFrame,
    thresholds: dict[str, dict[str, float]],
    asset_col: str,
    entity_cols: list[str] | None = None,
) -> DataFrame:
    """Stateless alert-row stage: unpivot + level + message, no
    counts. Works on batch AND streaming DataFrames (no window/agg) —
    the streaming escalation operator builds on this.

    Output: (asset_id, *entity_cols, feature, value, raw_level,
    threshold, message)."""
    entity_cols = entity_cols or []
    features = list(thresholds)
    stack_args = ", ".join(f"'{f}', CAST({f} AS DOUBLE)" for f in features)
    un = df.selectExpr(
        f"{asset_col} AS asset_id",
        *entity_cols,
        f"stack({len(features)}, {stack_args}) AS (feature, value)",
    ).filter(F.col("value").isNotNull())

    level_expr: Column = F.lit(None).cast("string")
    thr_expr: Column = F.lit(None).cast("double")
    for f_name in features:
        level_expr = F.coalesce(_level_case(f_name, thresholds), level_expr)
        thr_expr = F.coalesce(_threshold_case(f_name, thresholds), thr_expr)

    return (
        un.withColumn("raw_level", level_expr)
        .withColumn("threshold", thr_expr)
        .filter(F.col("raw_level").isNotNull())
        .withColumn(
            "message",
            F.format_string(
                "%s = %.2f exceeds %s threshold (%.2f)",
                F.col("feature"),
                F.col("value"),
                F.col("raw_level"),
                F.col("threshold"),
            ),
        )
    )


def escalated_level(escalation: dict[str, dict[str, int]] | None) -> Column:
    """Post-escalation level from (raw_level, key_count) — shared by
    the batch window path and the streaming running-count path."""
    level_out: Column = F.col("raw_level")
    for lvl, rules in (escalation or {}).items():
        if "min_count" in rules and lvl in _ESCALATE_NEXT:
            level_out = F.when(
                (F.col("raw_level") == lvl)
                & (F.col("key_count") >= rules["min_count"]),
                F.lit(_ESCALATE_NEXT[lvl]),
            ).otherwise(level_out)
    return level_out


def check_thresholds(
    df: DataFrame,
    thresholds: dict[str, dict[str, float]],
    asset_col: str,
    entity_cols: list[str] | None = None,
    escalation: dict[str, dict[str, int]] | None = None,
) -> DataFrame:
    """Alert rows for every threshold breach.

    Output: (asset_id, *entity_cols, feature, value, raw_level,
    level, threshold, key_count, message). ``raw_level`` is the
    breached level before escalation; ``level`` after.
    """
    entity_cols = entity_cols or []
    alerts = alert_rows(df, thresholds, asset_col, entity_cols)
    key_w = Window.partitionBy("asset_id", "feature")
    alerts = alerts.withColumn("key_count", F.count(F.lit(1)).over(key_w))
    return alerts.withColumn("level", escalated_level(escalation)).select(
        "asset_id",
        *entity_cols,
        "feature",
        "value",
        "raw_level",
        "level",
        "threshold",
        F.col("key_count").cast("long").alias("key_count"),
        "message",
    )


def recent_top_k(
    df: DataFrame,
    n: int,
    order_by: list[Column | str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Last-n rows per partition (``get_recent_alerts`` /
    ``get_latest_results``, ``:598-623, 1224-1246``). Global variant
    (no partition) plans as TakeOrderedAndProject."""
    cols = [F.col(c).desc() if isinstance(c, str) else c for c in order_by]
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*cols)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .drop("_rn")
        )
    return df.orderBy(*cols).limit(n)
