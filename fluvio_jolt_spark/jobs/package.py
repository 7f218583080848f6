"""Build the --py-files zip for spark-submit:

  python fluvio_jolt_spark/jobs/package.py [out.zip]
  spark-submit --py-files fluvio_jolt_spark.zip fluvio_jolt_spark/jobs/run_features.py ...
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path


def build_zip(out: str = "fluvio_jolt_spark.zip") -> str:
    root = Path(__file__).resolve().parents[2]
    pkg = root / "fluvio_jolt_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(root))
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "fluvio_jolt_spark.zip"))
