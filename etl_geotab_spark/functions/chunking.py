"""Document chunking UDTF (SURVEY.md §2.8 UDTF surface + X3).

Sliding-window token chunking — the canonical LLM-pipeline
preprocessing step (context-window packing with overlap). One input
row fans out into a variable number of chunk rows, which is exactly
the UDTF contract; the pure-expression alternative (sequence + slice +
posexplode) is possible but unreadable, so this doubles as the
engine's demonstration of the PySpark UDTF API.

Scale note: the UDTF runs Arrow-batched per partition; chunking is
O(tokens) per doc with no state across rows, so it pipelines inside
the scan stage — no shuffle, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
class ChunkDocument:
    """emit one row per sliding window of ``size`` whitespace tokens
    with stride ``stride`` (overlap = size - stride)."""

    def eval(self, text: str, size: int, stride: int):  # noqa: D102
        if text is None:
            return
        tokens = [t for t in text.split(" ") if t != ""]
        for idx, start in enumerate(range(0, len(tokens), stride)):
            chunk = tokens[start : start + size]
            yield idx, " ".join(chunk), len(chunk)


def register_chunk_udtf(spark) -> None:
    spark.udtf.register("chunk_document", ChunkDocument)
