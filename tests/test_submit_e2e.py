"""End-to-end delivery-path test: the north rule ships the engine as
``spark-submit --py-files dist/engine.zip validate.py``. This drives
that exact artifact in a fresh JVM from a SCRATCH directory (so only
the zip provides the package), then exercises the resume ledger:
second run over an unchanged snapshot is a no-op; appending a file
(new snapshot) re-validates."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _build_zip() -> Path:
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_dist.py")],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    return REPO / "dist" / "engine.zip"


def _submit(workdir: Path, zip_path: Path, *args: str, script: str = "validate.py") -> str:
    """Run a driver script via spark-submit from a scratch cwd — the
    package must come from the --py-files zip, not the repo."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.driver.extraJavaOptions=-XX:UseAVX=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(workdir / script),
            *args,
        ],
        capture_output=True,
        text=True,
        cwd=str(workdir),
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    return proc.stdout


@pytest.mark.slow
def test_spark_submit_validate_and_resume(spark, tmp_path):
    from anomaly_detection_toolkit_spark.sources import images

    inp = str(tmp_path / "imgs")
    images.write_images(spark, inp, 300, n_parts=3)
    outdir = str(tmp_path / "results")

    zip_path = _build_zip()
    work = tmp_path / "scratch"
    work.mkdir()
    # only the driver script and the zip exist in the scratch dir
    shutil.copy(REPO / "validate.py", work / "validate.py")

    out1 = _submit(work, zip_path, "--input", inp, "--output", outdir)
    assert "validated parts=[0, 1, 2]" in out1
    assert "FAIL" in out1  # defect-injected table must fail cells

    verdicts = spark.read.parquet(os.path.join(outdir, "verdicts"))
    assert verdicts.count() == 3 * 7  # parts x default checks
    assert {r["check"] for r in verdicts.select("check").distinct().collect()} >= {
        "schema", "column_stats", "uniqueness_image_id", "uniqueness_phash",
        "referential_caption", "drift", "payload",
    }
    assert spark.read.parquet(os.path.join(outdir, "violations")).count() > 0
    assert os.path.exists(os.path.join(outdir, "_ledger", "ledger.json"))

    # unchanged snapshot -> no-op resume
    out2 = _submit(work, zip_path, "--input", inp, "--output", outdir)
    assert "nothing to do" in out2


@pytest.mark.slow
def test_spark_submit_curate_pipeline(spark, tmp_path):
    """The curation half ships the same way: spark-submit + zip, from
    a scratch dir. Drives dedup -> quality -> mixture -> pack and
    checks the written outputs are consistent."""
    import json

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    docs.write.parquet(inp)
    outdir = str(tmp_path / "curated")

    zip_path = _build_zip()
    work = tmp_path / "scratch"
    work.mkdir()
    shutil.copy(REPO / "curate.py", work / "curate.py")

    out = _submit(
        work, zip_path,
        "--input", inp, "--output", outdir,
        "--budget", "128", "--near-dup", "--langs", "en=0.7",
        "--default-rate", "0.5", "--salt", "t",
        script="curate.py",
    )
    assert "curated input=" in out
    stats = json.load(open(os.path.join(outdir, "stats.json")))
    assert stats["after_dedup"] <= stats["input"]
    assert stats["curated"] <= stats["after_quality"]
    packed = spark.read.parquet(os.path.join(outdir, "packed"))
    chunks = spark.read.parquet(os.path.join(outdir, "chunks"))
    assert packed.count() == stats["curated"]
    # chunk slices re-assemble to exactly the packed token count
    got = chunks.groupBy().sum("tok_len").first()[0] or 0
    assert got == stats["tokens"]
