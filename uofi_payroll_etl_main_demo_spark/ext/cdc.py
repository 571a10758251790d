"""Content-defined chunking (CDC) — shift-robust chunk-level dedup.

Fixed-width chunking (``chunk_documents``, ``chunk_dedup_rewrite``)
breaks under INSERTION: one added sentence shifts every later chunk
boundary, so no downstream hash matches again. Content-defined
chunking places boundaries where a rolling hash of the LOCAL window
satisfies a divisor condition (the LBFS/Rabin scheme; FastCDC is the
gear-hash descendant), so boundaries re-synchronize right after an
edit and every later chunk hashes identically — the property backup
systems, artifact stores and near-dup corpus pipelines rely on.

This implementation deliberately uses the WINDOWED form (hash of the
last ``window`` codepoints only, no running-from-boundary state):
boundary decisions depend on nothing but local content, which makes
the operator embarrassingly parallel (numpy over Arrow batches, no
sequential scan per corpus) AND gives it an exact SQL oracle via
``lag``/window functions — no recursion, no state machine.

Law (shared by numpy, the Spark mapInPandas path, and the DuckDB
oracle; all-integer, engine-exact):

    H(t)   = sum_{k=0..W-1} codepoint(t-k) * P^k  (mod M)
    bound  at t  iff  t >= W-1 and H(t) % D == 0
    chunks = maximal runs between boundaries (boundary char is the
             LAST char of its chunk; the final partial chunk is kept)

with P = 1000003, M = 2^31 - 1, W = 8, D = 64 (expected chunk ~64
chars). No min/max chunk bounds: bounds would couple a boundary to
the previous one and re-serialize the scan — the trade is documented,
not hidden (pathological inputs can yield 1-char chunks; they stay
deterministic and oracle-identical).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["CDC_P", "CDC_M", "cdc_chunks", "cdc_chunk_spans"]

CDC_P = 1000003
CDC_M = 2147483647  # 2^31 - 1

CDC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_idx", T.LongType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("chunk_len", T.LongType(), False),
        T.StructField("chunk_hash", T.StringType(), False),
    ]
)


def cdc_chunk_spans(text: str, window: int = 8, divisor: int = 64):
    """(start, length) spans of one document's content-defined chunks
    — the scalar law, vectorized over positions with numpy. Shared by
    the Spark batch path and the tests so the two cannot drift."""
    import numpy as np

    n = len(text)
    if n == 0:
        return []
    pows = [pow(CDC_P, k, CDC_M) for k in range(window)]
    bounds = []
    if n >= window:
        codes = np.frombuffer(
            text.encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        h = np.zeros(n - window + 1, dtype=np.int64)
        for k in range(window):
            h = (h + codes[window - 1 - k : n - k] * pows[k]) % CDC_M
        bounds = np.nonzero(h % divisor == 0)[0] + (window - 1)
    spans, start = [], 0
    for b in bounds:
        spans.append((start, int(b) - start + 1))
        start = int(b) + 1
    if start < n:
        spans.append((start, n - start))
    return spans


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """One row per content-defined chunk: ``(doc_id, chunk_idx, start,
    chunk_len, chunk_hash)`` with ``chunk_hash = md5(utf8(chunk))``.

    ``mapInPandas`` over Arrow batches: each document is chunked
    independently (boundaries are window-local), so the operator
    scales with ``rows / executors`` and shuffles NOTHING — the output
    partitioning is the input's. Downstream dedup
    (``groupBy(chunk_hash)``) shuffles only (hash, id) pairs, never
    text. Null texts are skipped (no spans), matching the oracle's
    inner explode."""
    if window < 2:
        raise ValueError(f"window must be >= 2: {window}")
    if divisor < 2:
        raise ValueError(f"divisor must be >= 2: {divisor}")

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "chunk_idx", "start", "chunk_len", "chunk_hash")}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for i, (s, ln) in enumerate(
                    cdc_chunk_spans(text, window, divisor)
                ):
                    out["doc_id"].append(did)
                    out["chunk_idx"].append(i)
                    out["start"].append(s)
                    out["chunk_len"].append(ln)
                    out["chunk_hash"].append(
                        hashlib.md5(text[s : s + ln].encode()).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "chunk_idx": "int64",
                    "start": "int64",
                    "chunk_len": "int64",
                    "chunk_hash": "str",
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, CDC_SCHEMA)
