"""Document chunking — the context-window splitter a training-data pipeline
runs before tokenization: fixed-size token windows with overlap.

Implemented as a Python UDTF (Spark 3.5+): one input row → N chunk rows,
lateral-joined against the documents table.  The UDTF path is the right
shape here because chunk count is data-dependent (a Column `transform` over
`sequence` would work but recomputes the token split per chunk); rows are
Arrow-batched like any Python UDF.

At scale the chunker is a pure map op — no shuffle at all; chunk rows stay
on their document's partition for downstream per-chunk tokenize/embed
stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import lit, udtf


@udtf(returnType="chunk_id: int, n_chunk_tokens: int, chunk: string")
class TokenChunker:
    """Whitespace-token windows of ``size`` tokens advancing by
    ``size - overlap``; the final window is the first to reach the end
    (short tails are kept, not padded)."""

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        step = size - overlap
        if step <= 0:
            raise ValueError("overlap must be smaller than size")
        i, cid = 0, 0
        while i < len(toks):
            window = toks[i : i + size]
            yield cid, len(window), " ".join(window)
            if i + size >= len(toks):
                break
            i += step
            cid += 1


def chunk_documents(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 40,
    overlap: int = 10,
) -> DataFrame:
    """Lateral-join the chunker against a documents frame."""
    spark.udtf.register("token_chunker", TokenChunker)
    docs.createOrReplaceTempView("_chunk_input")
    return spark.sql(
        f"""
        SELECT {id_col}, c.chunk_id, c.n_chunk_tokens, c.chunk
        FROM _chunk_input, LATERAL token_chunker({text_col}, {size}, {overlap}) c
        """
    )
