"""Python user-defined table functions (Spark 4 UDTF API).

The fourth and last Python-integration surface the engine exposes,
beside scalar pandas UDFs (similarity.brute_force_topk_arrow),
applyInPandas grouped-map (streaming EWMA), and mapInPandas
(multimodal decode). A UDTF turns ONE input row into MANY output rows
with imperative Python — the escape hatch for row-expanding logic no
builtin expresses.

It is also the SLOW path: row-at-a-time Python with pickled transfer,
not Arrow batches. `chunk_text_udtf` exists as the API demonstration
and parity witness for the production formulation — `q_doc_chunks`
does the identical chunking with pure JVM expressions
(sequence → explode → substr), and tests/test_text.py pins the two
row-for-row equal. When a builtin CAN express the expansion, the
expression wins at any scale; reach for a UDTF only past that point.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx bigint, chunk_len bigint, chunk_hash string")
class ChunkTextUdtf:
    """Overlapping character windows of one document: size 200, stride
    150 — the same contract as q_doc_chunks (1 + ceil(max(len-size,0)/
    stride) chunks, md5 content hash per chunk)."""

    SIZE = 200
    STRIDE = 150

    def eval(self, text: str):  # noqa: A002 - UDTF contract
        import hashlib
        import math

        if text is None:
            return
        n = len(text)
        n_chunks = 1 + math.ceil(max(n - self.SIZE, 0) / self.STRIDE)
        for i in range(n_chunks):
            chunk = text[i * self.STRIDE : i * self.STRIDE + self.SIZE]
            yield (
                i,
                len(chunk),
                hashlib.md5(chunk.encode("utf-8")).hexdigest(),
            )
