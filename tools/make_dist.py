"""Build dist/engine.zip for ``spark-submit --py-files`` deployment.

The zip contains the ``anomaly_detection_toolkit_spark`` package only
(no tests/tools); executors unpack it onto their PYTHONPATH, the
driver script is ``validate.py``:

    python tools/make_dist.py
    spark-submit --master <cluster> --py-files dist/engine.zip \
        validate.py --input <table> --output <dir>
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "anomaly_detection_toolkit_spark"


def main() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / PKG).rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size / 1024:.0f} KiB)")
    return out


if __name__ == "__main__":
    main()
