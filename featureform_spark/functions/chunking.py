"""Document chunking: split token streams into fixed-size overlapping
chunks — the standard RAG / context-window preparation step.

Chunk layout (pure function of the token count, no state): chunks start
every ``stride = chunk_size - overlap`` tokens; the chunk count is
``max(1, ceil((n - overlap) / stride))`` so the final partial window is
kept and every document yields at least one chunk. All arithmetic is
integer (``(greatest(n - overlap, 1) + stride - 1) div stride``) so any
engine reproduces the layout bit-exactly — no float ceil.

Scale design (100 TB corpus):
- Zero shuffles: tokenize, ``posexplode`` of a per-row chunk-index
  sequence, and ``slice``/``array_join`` are all narrow, codegen-side
  expressions — the operator is embarrassingly parallel and inherits the
  scan's partitioning.
- Output rows ~= corpus_tokens / stride; downstream consumers repartition
  as needed (chunking itself imposes no ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureform_spark.functions.text import tokens_expr


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into ``[id_col, chunk_id, n_chunk_tokens,
    chunk_text]`` rows. ``chunk_id`` is 0-based within the document; the
    last chunk may be shorter than ``chunk_size`` (empty docs yield one
    empty chunk)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap} / {chunk_size}"
        )
    stride = chunk_size - overlap
    toks = df.select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    # integer ceil over a strictly positive operand: Spark `div` and
    # DuckDB `//` agree there (they differ on negatives)
    n_chunks = F.expr(
        f"(greatest(__n - {overlap}, 1) + {stride - 1}) div {stride}"
    )
    return (
        toks.withColumn("__nc", n_chunks)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_id", "__i"
            ),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(
                F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_size
            ).alias("__chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )
