"""Package the engine for spark-submit --py-files.

    python scripts/build_dist.py   # writes dist/hocr_de_noising_spark.zip

The zip contains only the package sources (no tests/fixtures cache),
importable on executors via --py-files.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "hocr_de_noising_spark")
OUT = os.path.join(REPO, "dist", "hocr_de_noising_spark.zip")


def build(out_path: str = OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
