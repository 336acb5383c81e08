"""The committed cluster artifact dist/lucene_spark.zip must match the
source tree byte-for-byte — a stale zip ships different code to
spark-submit --py-files than the repo tests verified."""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dist_zip_matches_source():
    zp = os.path.join(REPO, "dist", "lucene_spark.zip")
    assert os.path.exists(zp), "dist/lucene_spark.zip missing — run tools/make_pyfiles.py"
    with zipfile.ZipFile(zp) as z:
        zipped = {n: z.read(n) for n in z.namelist() if n.endswith(".py")}
    src = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, "lucene_spark")):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    src[os.path.relpath(p, REPO)] = fh.read()
    assert set(zipped) == set(src), (
        f"zip/source file sets differ: only-zip={sorted(set(zipped)-set(src))} "
        f"only-src={sorted(set(src)-set(zipped))} — run tools/make_pyfiles.py")
    stale = [n for n in src if zipped[n] != src[n]]
    assert not stale, f"stale zip entries {stale} — run tools/make_pyfiles.py"
