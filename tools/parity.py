"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` from ``__spark_entry__`` at sf0.01 on
Spark AND its ``oracle_sql()[name]`` on DuckDB (with the testdata
parquet tables registered as views), then compares:
row count, schema (column-name set), and order-insensitive values
(columns sorted by name, rows sorted by all columns).

Usage: python tools/parity.py [name ...]
Exit code 0 iff all checked pairs match.
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sa = pd.to_numeric(sv, errors="coerce").to_numpy(dtype=float)
            da = pd.to_numeric(dv, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(sa) & np.isnan(da)
            # EXACT bitwise equality — the driver's value hash is
            # exact, and isclose(rtol=1e-9) on epoch-magnitude floats
            # tolerated ±1.7 absolute (it passed the round-2
            # streaming_sliding_buffer pair the driver failed).
            # isclose stays as a secondary diagnostic so near-misses
            # are labelled differently from gross mismatches.
            exact = (sa == da) | both_nan
            if not exact.all():
                idx = int(np.argmin(exact))
                close = np.isclose(sa, da, rtol=1e-9, atol=1e-9) | both_nan
                kind = "near-miss (isclose OK)" if close.all() else "gross"
                problems.append(
                    f"col {c}: {int((~exact).sum())} exact mismatches ({kind}); "
                    f"first at sorted row "
                    f"{idx}: spark={sa[idx]!r} duck={da[idx]!r}"
                )
        else:
            eq = sv.astype(str).to_numpy() == dv.astype(str).to_numpy()
            if not eq.all():
                idx = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches; first at sorted row "
                    f"{idx}: spark={sv.iloc[idx]!r} duck={dv.iloc[idx]!r}"
                )
    return problems


def main(argv: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from anomaly_detection_toolkit_spark.session import get_spark

    from anomaly_detection_toolkit_spark.entry_queries import EXTRA_PAIRS

    spark = get_spark("parity", cpus=8, shuffle_partitions=8)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # retired-but-still-verified pairs (not exposed to the driver)
    for name, (fn, oracle) in EXTRA_PAIRS.items():
        qs.setdefault(name, fn)
        oracles.setdefault(name, oracle() if callable(oracle) else oracle)
    names = argv or sorted(qs)
    con = duck_connection()
    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"[SKIP] {name}: not in queries()")
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark side raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: rows={len(spark_pdf)} (no oracle)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"[FAIL] {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"       {p}")
        else:
            print(f"[OK]   {name}: rows={len(spark_pdf)} cols={sorted(spark_pdf.columns)}")
    print(f"\n{len(names) - n_fail}/{len(names)} pairs OK")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
