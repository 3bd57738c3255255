"""Python UDTFs (table functions) — the one UDF shape the rest of the
engine doesn't exercise.

The reference's UDF surface is a single scalar UDF (SURVEY.md §2.10);
Spark 3.5+ adds Python UDTFs (one input row → many output rows with their
own schema). The example here is the LLM-pipeline document chunker:
overlapping character windows, the standard RAG/pre-training chunking step.

Note the cost model: a UDTF is a row-at-a-time Python path. For this
particular operator a pure-Catalyst equivalent exists
(:func:`chunk_expression` — substring over a sequence of offsets) and is
what production pipelines should use; the UDTF form demonstrates the API
for logic that genuinely can't be expressed as expressions (stateful
parsers, external-library tokenizers).
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol, functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string")
class ChunkDocument:
    """Split text into overlapping character chunks.

    One input row ``(text, chunk_size, overlap)`` → one output row per
    chunk. Final partial chunks are kept (never empty unless text is).
    """

    def eval(self, text: str, chunk_size: int = 512, overlap: int = 64):
        if text is None:
            return
        if chunk_size <= overlap:
            raise ValueError("chunk_size must exceed overlap")
        step = chunk_size - overlap
        idx = 0
        for start in range(0, max(len(text), 1), step):
            chunk = text[start : start + chunk_size]
            if not chunk:
                break
            yield idx, chunk
            if start + chunk_size >= len(text):
                break
            idx += 1


def chunk_expression(
    text, chunk_size: int = 512, overlap: int = 64
) -> SparkCol:
    """Pure-Catalyst equivalent of :class:`ChunkDocument` →
    ``array<struct<chunk_idx int, chunk string>>`` (explode to get rows).

    substring over a generated offset sequence — stays in codegen, no
    Python workers. This is the production form; the UDTF exists to
    demonstrate the API.
    """
    if chunk_size <= overlap:
        raise ValueError("chunk_size must exceed overlap")
    col = F.col(text) if isinstance(text, str) else text
    step = chunk_size - overlap
    n = F.length(col)
    # Offsets 1, 1+step, ... covering the document; ensure ≥1 chunk for
    # non-empty text and the last chunk starts within the text.
    last_start = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_size)).cast("double") / step) * step + 1).cast("int"),
    )
    offsets = F.when(n > 0, F.sequence(F.lit(1), last_start, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        offsets,
        lambda off, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.substring(col, off, chunk_size).alias("chunk"),
        ),
    )
