"""Per-stage timing of the validation suite (BASELINE.md protocol
item 3: "Report per run: ... per-stage times (column-stats agg,
uniqueness shuffle, referential anti-join, drift, payload decode)").

Runs each check of ``default_suite`` in ISOLATION over the persisted
bench image table (same methodology as bench.py — input persisted so
the measurement captures engine work, not this sandbox's virtio
re-read throttling), then the full fused suite, and prints a JSON
map. The isolated sum exceeds the fused wall because ``run_suite``
shares one narrow projection across the non-payload checks and
overlaps independent jobs' stages.

Usage: python tools/stage_profile.py [n_images] [runs]
(default 100000, best-of-2). Writes BENCH/stage_profile.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from bench import _noop_write, ensure_image_table
    from anomaly_detection_toolkit_spark.plans.checks import default_suite
    from anomaly_detection_toolkit_spark.plans.runner import run_suite
    from anomaly_detection_toolkit_spark.session import get_spark

    spark = get_spark("stage-profile", cpus=32)
    path = ensure_image_table(spark, n_images, 32)
    df = spark.read.parquet(path).persist()
    df.count()

    # warm Python workers once (bench.py rationale)
    _noop_write(
        spark.range(0, 256, 1, 32).mapInPandas(
            lambda bs: (pdf for pdf in bs), schema="id long"
        )
    )

    stage_sec: dict[str, float] = {}
    for check in default_suite():
        label = check.name
        if label in stage_sec:  # two UniquenessChecks
            label = f"{label}_2"
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            out = check.run(df)
            _noop_write(out.violations)
            _noop_write(out.metrics)
            best = min(best, time.perf_counter() - t0)
            for d in out.cached:
                d.unpersist()
        stage_sec[label] = round(best, 3)

    fused_best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        result = run_suite(df, default_suite())
        _noop_write(result.violations)
        _noop_write(result.verdicts)
        _noop_write(result.metrics)
        fused_best = min(fused_best, time.perf_counter() - t0)
        result.unpersist()

    report = {
        "n_images": n_images,
        "runs": runs,
        "stages_isolated_sec": stage_sec,
        "isolated_sum_sec": round(sum(stage_sec.values()), 3),
        "fused_suite_sec": round(fused_best, 3),
    }
    (REPO / "BENCH" / "stage_profile.json").write_text(json.dumps(report, indent=1))
    spark.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
