"""Build the --py-files artifact: zip the engine package for spark-submit.

    python scripts/package.py [dist/tei_chunker_spark.zip]
    spark-submit --py-files dist/tei_chunker_spark.zip \
        $(python -c 'import tei_chunker_spark.job as j; print(j.__file__)') \
        --input ... --output ... --manifest ...
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, "tei_chunker_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "tei_chunker_spark.zip")
    print(build(target))
