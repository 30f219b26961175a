"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Conventions used by every pair here:
- every computed column is aliased identically in Spark and SQL;
- continuous (float) outputs are ``round(x, 4)`` on BOTH sides so
  cross-engine 1e-13 float noise can't break the value hash;
- verdicts use the reference's -1 = anomaly / +1 = normal encoding,
  cast to INT on both sides;
- sums of integers are cast to BIGINT/DOUBLE explicitly (DuckDB would
  otherwise widen to HUGEINT).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from anomaly_detection_toolkit_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the north-star validation suite end to end —
    deterministic defect-injected image+caption table → schema/stats/
    uniqueness/referential/drift/payload checks → per-partition
    (part, check) verdict grid with the -1/+1 encoding."""
    return entry_queries.QUERIES["northstar_suite_verdicts"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names)."""
    return entry_queries.resolved_oracles()
