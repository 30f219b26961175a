"""Predictive-maintenance feature extraction as window functions.

Re-expression of the reference's pandas feature dataflow
(``/root/reference/src/anomaly_detection_toolkit/predictive_maintenance.py``)
over Spark window frames. Semantics parity:

- rolling stats (``:115-148``): ``rolling(window=w, min_periods=1)``
  ≡ ``rowsBetween(-(w-1), 0)`` (frames shorter than w at the head are
  computed over available rows — exactly min_periods=1); pandas
  rolling ``.std()`` is ddof=1 → ``stddev_samp`` (single-row frame →
  NULL, matching pandas NaN); rolling median/quantile uses linear
  interpolation → exact ``percentile`` over the frame;
- diff/pct_change (``:150-171``): ``x - lag(x)`` etc., NULL head rows
  ≡ pandas NaN;
- RUL (``:768-806``): unbounded window max per asset minus cycle,
  clipped ≥ 0;
- RUL labels (``:808-855``): chained ``when`` in np.select order with
  'unknown' default; binary/multiclass label encodings preserved;
- FFT features (``:173-199``): per-series constants via
  ``applyInPandas`` (numpy rfft inside Arrow batches) broadcast-joined
  back onto the rows;
- feature fill (``:204``): backward-fill = ``first(ignorenulls) over
  (FOLLOWING)``, then 0.0.

Scale: one shuffle per (partition_by) key set, shared by every window
column over the same spec (Catalyst reuses the sort); FFT groups are
whole-series (the reference's own model) — callers partition series
into bounded-length segments at 10^12 scale.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROLLING_STATS = ("mean", "std", "min", "max", "median")


def _ordered_window(partition_by: Sequence[str], order_by: Sequence[str]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def rolling_stats(
    df: DataFrame,
    cols: Sequence[str],
    windows: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    stats: Sequence[str] = ("mean", "std", "min", "max"),
    quantiles: bool = False,
) -> DataFrame:
    """ops 37/38/45: grouped rolling statistics, reference naming
    ``{col}_rolling_{stat}_{window}``."""
    base = _ordered_window(partition_by, order_by)
    out = df
    for w in windows:
        frame = base.rowsBetween(-(w - 1), Window.currentRow)
        for c in cols:
            col = F.col(c).cast("double")
            exprs: dict[str, Column] = {}
            if "mean" in stats:
                exprs[f"{c}_rolling_mean_{w}"] = F.avg(col).over(frame)
            if "std" in stats:
                exprs[f"{c}_rolling_std_{w}"] = F.stddev_samp(col).over(frame)
            if "min" in stats:
                exprs[f"{c}_rolling_min_{w}"] = F.min(col).over(frame)
            if "max" in stats:
                exprs[f"{c}_rolling_max_{w}"] = F.max(col).over(frame)
            if "median" in stats:
                exprs[f"{c}_rolling_median_{w}"] = F.percentile(col, F.lit(0.5)).over(frame)
            if quantiles:
                q25 = F.percentile(col, F.lit(0.25)).over(frame)
                q75 = F.percentile(col, F.lit(0.75)).over(frame)
                exprs[f"{c}_rolling_q25_{w}"] = q25
                exprs[f"{c}_rolling_q75_{w}"] = q75
                exprs[f"{c}_rolling_iqr_{w}"] = q75 - q25
            out = out.withColumns(exprs)
    return out


def change_features(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """op-39: diff / diff2 / abs / pct_change (NULL head rows ≡ NaN)."""
    w = _ordered_window(partition_by, order_by)
    out = df
    for c in cols:
        col = F.col(c).cast("double")
        d1 = col - F.lag(col, 1).over(w)
        out = out.withColumn(f"{c}_diff", d1)
        d2 = F.col(f"{c}_diff") - F.lag(F.col(f"{c}_diff"), 1).over(w)
        # try_divide: a zero previous value yields NULL (ANSI-safe at
        # scale — one bad row must never abort a 10^12-row job).
        # pandas would yield ±inf here; engine policy is SQL NULL.
        out = out.withColumns(
            {
                f"{c}_diff2": d2,
                f"{c}_diff_abs": F.abs(F.col(f"{c}_diff")),
                f"{c}_pct_change": F.try_divide(
                    col - F.lag(col, 1).over(w), F.lag(col, 1).over(w)
                ),
            }
        )
        out = out.withColumn(f"{c}_diff2_abs", F.abs(F.col(f"{c}_diff2")))
    return out


def rate_of_change(
    df: DataFrame,
    cols: Sequence[str],
    periods: Sequence[int],
    partition_by: Sequence[str],
    order_by: Sequence[str],
    name_template: str = "{col}_roc_{p}",
) -> DataFrame:
    """ops 40/46: pct_change over multiple periods. The degradation-rate
    variant uses ``name_template='{col}_degradation_rate_{p}'``
    (reference ``add_degradation_rates`` naming at ``:953``)."""
    w = _ordered_window(partition_by, order_by)
    out = df
    for c in cols:
        col = F.col(c).cast("double")
        for p in periods:
            lagged = F.lag(col, p).over(w)
            out = out.withColumn(
                name_template.format(col=c, p=p), F.try_divide(col - lagged, lagged)
            )
    return out


def add_degradation_rates(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str] = ("asset_id",),
    order_by: Sequence[str] = ("cycle",),
    periods: Sequence[int] = (1, 3, 5),
) -> DataFrame:
    return rate_of_change(
        df, cols, periods, partition_by, order_by, "{col}_degradation_rate_{p}"
    )


def calculate_rul(
    df: DataFrame,
    asset_id_col: str = "asset_id",
    cycle_col: str = "cycle",
    failure_cycle_col: str | None = None,
    out_col: str = "RUL",
) -> DataFrame:
    """op-43: RUL = clip(max(cycle) over asset - cycle, 0)."""
    w = Window.partitionBy(asset_id_col)
    src = failure_cycle_col if failure_cycle_col else cycle_col
    rul = F.max(F.col(src)).over(w) - F.col(cycle_col)
    return df.withColumn(out_col, F.greatest(F.lit(0), rul))


def create_rul_labels(
    df: DataFrame,
    rul_col: str = "RUL",
    warning_threshold: int = 30,
    critical_threshold: int = 15,
) -> DataFrame:
    """op-44: health_status / binary_label / multi_class_label."""
    rul = F.col(rul_col)
    health = (
        F.when(rul > warning_threshold, "healthy")
        .when((rul > critical_threshold) & (rul <= warning_threshold), "warning")
        .when((rul > 0) & (rul <= critical_threshold), "critical")
        .when(rul == 0, "failed")
        .otherwise("unknown")
    )
    label_map = {"healthy": 0, "warning": 1, "critical": 2, "failed": 3}
    multi = F.col("health_status")
    multi_expr = F.lit(-1)
    for k, v in label_map.items():
        multi_expr = F.when(multi == k, v).otherwise(multi_expr)
    return (
        df.withColumn("health_status", health)
        .withColumn(
            "binary_label", (F.col("health_status") != "healthy").cast("int")
        )
        .withColumn("multi_class_label", multi_expr.cast("int"))
    )


def backfill_then_zero(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """op-42 fill semantics: ``bfill().fillna(0)``. Backward fill =
    nearest following non-null, computed as LAST non-null over
    [UNBOUNDED PRECEDING, CURRENT ROW] with the sort REVERSED.

    Plan note: Spark's WindowExec evaluates growing
    [UNBOUNDED PRECEDING, CURRENT] frames incrementally (O(n) per
    partition), but shrinking [CURRENT, UNBOUNDED FOLLOWING] frames
    re-aggregate the remaining frame per row (O(n²)) — the direct
    ``first() over (current→following)`` encoding of bfill took 39s
    where this one takes ~1s at sf0.1 (BENCH r2)."""
    rev = Window.partitionBy(*[F.col(c) for c in partition_by]).orderBy(
        *[F.col(c).desc() for c in order_by]
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumns(
        {
            c: F.coalesce(F.last(F.col(c), ignorenulls=True).over(rev), F.lit(0.0))
            for c in cols
        }
    )


def fft_features(
    df: DataFrame,
    value_col: str,
    series_col: str,
    order_by: Sequence[str],
) -> DataFrame:
    """op-41: per-series spectral constants (dominant freq / centroid /
    85% rolloff) via grouped-map Arrow UDF, broadcast-joined back.

    Output adds ``{value_col}_dominant_freq``, ``_spectral_centroid``,
    ``_spectral_rolloff`` (constant per series, matching the
    reference's np.full at ``:188-199``).
    """
    order_cols = list(order_by)
    schema = (
        f"{series_col} string, {value_col}_dominant_freq double, "
        f"{value_col}_spectral_centroid double, {value_col}_spectral_rolloff double"
    )

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[series_col].iloc[0]
        vals = pdf.sort_values(order_cols)[value_col].dropna().to_numpy(dtype=float)
        if len(vals) <= 10:
            return pd.DataFrame(
                [[key, 0.0, 0.0, 0.0]],
                columns=[
                    series_col,
                    f"{value_col}_dominant_freq",
                    f"{value_col}_spectral_centroid",
                    f"{value_col}_spectral_rolloff",
                ],
            )
        fft_vals = np.fft.rfft(vals)
        power = np.abs(fft_vals) ** 2
        freqs = np.fft.rfftfreq(len(vals))
        dom_idx = int(np.argmax(power[1:]) + 1)  # skip DC (reference :181)
        dominant = float(freqs[dom_idx]) if dom_idx < len(freqs) else 0.0
        centroid = float(np.sum(freqs * power) / (np.sum(power) + 1e-10))
        cum = np.cumsum(power)
        total = cum[-1]
        if total == 0:
            rolloff = 0.0
        else:
            idx = np.where(cum >= total * 0.85)[0]
            rolloff = float(freqs[idx[0]]) if len(idx) else float(freqs[-1])
        return pd.DataFrame(
            [[key, dominant, centroid, rolloff]],
            columns=[
                series_col,
                f"{value_col}_dominant_freq",
                f"{value_col}_spectral_centroid",
                f"{value_col}_spectral_rolloff",
            ],
        )

    consts = df.select(series_col, value_col, *order_cols).groupBy(series_col).applyInPandas(
        per_series, schema=schema
    )
    return df.join(F.broadcast(consts), series_col, "left")


def prepare_pm_features(
    df: DataFrame,
    asset_id_col: str = "asset_id",
    cycle_col: str = "cycle",
    feature_cols: Sequence[str] | None = None,
    calculate_rul_flag: bool = True,
    add_labels: bool = True,
    add_rolling_stats: bool = True,
    add_degradation: bool = False,
    rolling_window: int = 5,
    warning_threshold: int = 30,
    critical_threshold: int = 15,
    failure_cycle_col: str | None = None,
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """op-47 (``predictive_maintenance.py:986-1087``): the composed
    feature pipeline — RUL, health labels, rolling stats, degradation
    rates — with the reference's column auto-detection (numeric
    columns minus the id/label exclusion list at ``:1045-1054``).

    All stages share the SAME (asset, cycle) window partitioning, so
    Catalyst plans a single sort+shuffle reused by every rolling and
    lag expression — the whole pipeline is one exchange.

    ``order_cols`` (default ``[cycle_col]``) must be a DETERMINISTIC
    total order within each asset; pass extra tie-break columns when
    the cycle key has duplicates (SURVEY §7.3 row-order trap).
    """
    order_cols = list(order_cols or [cycle_col])
    if feature_cols is None:
        exclude = {
            asset_id_col,
            cycle_col,
            "RUL",
            "health_status",
            "binary_label",
            "multi_class_label",
            "max_cycle",
        }
        numeric = (
            "double",
            "float",
            "int",
            "bigint",
            "smallint",
            "tinyint",
        )
        feature_cols = [
            f.name
            for f in df.schema.fields
            if f.name not in exclude and f.dataType.simpleString() in numeric
        ]
    out = df
    if calculate_rul_flag:
        out = calculate_rul(
            out,
            asset_id_col=asset_id_col,
            cycle_col=cycle_col,
            failure_cycle_col=failure_cycle_col,
        )
    if add_labels and "RUL" in out.columns:
        out = create_rul_labels(
            out,
            rul_col="RUL",
            warning_threshold=warning_threshold,
            critical_threshold=critical_threshold,
        )
    if add_rolling_stats and feature_cols:
        out = rolling_stats(
            out,
            feature_cols,
            [rolling_window],
            partition_by=[asset_id_col],
            order_by=order_cols,
            stats=("mean", "std", "min", "max"),
        )
    if add_degradation and feature_cols:
        out = add_degradation_rates(
            out, feature_cols, [asset_id_col], order_cols
        )
    return out
