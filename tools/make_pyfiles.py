"""Package the engine for cluster submission: dist/lucene_spark.zip.

Usage:
    python tools/make_pyfiles.py
    spark-submit --py-files dist/lucene_spark.zip jobs/build_index.py \
        --input /path/transcripts --index /path/index --segments 4096
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "lucene_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "lucene_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)


if __name__ == "__main__":
    main()
