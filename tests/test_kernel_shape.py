"""Static kernel-shape guards (VERDICT r4 next-#2/#3 done-criteria).

The round-3/4 performance regressions were all the same anti-pattern: an
interpreted Python loop over posting BLOCKS inside a per-segment kernel
(O(n_blocks) per query per segment — thousands of iterations on a hot term).
These tests pin the fix structurally: no kernel-path module may contain a
``for ... in range(n_blocks)`` / ``range(len(pdf))`` block-decode loop; all
multi-block decodes must route through the batched decoders.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# modules whose applyInPandas kernels sit on query / maintenance hot paths
KERNEL_MODULES = [
    "lucene_spark/search/wand.py",
    "lucene_spark/search/multiterm.py",
    "lucene_spark/search/searcher.py",
    "lucene_spark/indexing/maintenance.py",
]

# per-block interpreted loops over the kernel's input frame: explicit
# range loops AND pandas row iteration over `pdf` (the kernel-arg naming
# convention) — driver-side iteration over small frames keeps other names
_BLOCK_LOOP = re.compile(
    r"for\s+\w+\s+in\s+range\((?:n_blocks|len\(pdf\))\)"
    r"|for\s+[\w,\s]+\s+in\s+pdf\.iterrows\(\)")


def test_no_per_block_python_loops_on_kernel_paths():
    offenders = []
    for mod in KERNEL_MODULES:
        src = open(os.path.join(REPO, mod)).read()
        for m in _BLOCK_LOOP.finditer(src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{mod}:{line}")
    assert not offenders, (
        "per-block Python loop on a kernel path (use decode_doc_ids_batch /"
        f" decode_blocks_batch): {offenders}")


def test_batched_decoders_are_used_where_loops_were():
    # the three r4-flagged sites now import/route through the batch decoders
    wand = open(os.path.join(REPO, "lucene_spark/search/wand.py")).read()
    assert "decode_doc_ids_batch" in wand
    mt = open(os.path.join(REPO, "lucene_spark/search/multiterm.py")).read()
    assert mt.count("decode_blocks_batch") >= 2  # synonym + dismax kernels


def test_decode_blocks_batch_roundtrip():
    import numpy as np

    from lucene_spark.indexing.blocks import (
        decode_block, decode_blocks_batch, encode_term_blocks)

    rng = np.random.default_rng(7)
    docs = np.unique(rng.integers(0, 5000, size=700))
    tfs = rng.integers(1, 30, size=docs.size)
    norms = rng.integers(1, 255, size=docs.size)
    rows = list(encode_term_blocks(docs, tfs, norms))
    d, tf, nm, starts = decode_blocks_batch(
        [r["first_doc"] for r in rows], [r["last_doc"] for r in rows],
        [r["count"] for r in rows], [r["doc_gaps"] for r in rows],
        [r["tfs"] for r in rows], [r["norms"] for r in rows])
    np.testing.assert_array_equal(d, docs)
    np.testing.assert_array_equal(tf, tfs)
    np.testing.assert_array_equal(nm, norms)
    # starts align with the per-block decode
    for i, r in enumerate(rows):
        d1, t1, n1 = decode_block(r["first_doc"], r["count"], r["doc_gaps"],
                                  r["tfs"], r["norms"])
        s = starts[i]
        np.testing.assert_array_equal(d[s:s + r["count"]], d1)
        np.testing.assert_array_equal(tf[s:s + r["count"]], t1)
        np.testing.assert_array_equal(nm[s:s + r["count"]], n1)
