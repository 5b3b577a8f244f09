"""Sequence packing: assign documents to fixed-token-budget training
sequences ("packs") so a trainer can concatenate each pack into one
context window with minimal padding.

Semantics: *streaming* packing — within a bucket, documents are laid out
in a deterministic order (ascending id) as one contiguous token stream,
and a document belongs to the pack in which its first token lands
(``pack = floor(exclusive_running_token_sum / budget)``). Documents
longer than the budget still get a pack (they start one); the trainer's
chunker handles the overflow. This is the packing recipe LLM data
pipelines use publicly (concatenate-then-chunk); exact bin-packing is
NP-hard and needs global state, so it is deliberately not the contract.

Scale design (100 TB corpus):
- A global running sum would be one giant sort — instead documents are
  hash-bucketed first (``pmod(hash(id), n_buckets)``) and the running
  sum runs *per bucket*: one shuffle, B independent window partitions,
  each sized ~corpus/B. Pack identity is the (bucket, local_pack) pair.
- Padding efficiency is unaffected by bucketing (each bucket wastes at
  most one partial tail pack), and bucket count scales with cluster
  width, not data volume.
- All expressions are built-in (hash/pmod/sum-over-window) — codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 8,
    bucket_expr: F.Column | None = None,
) -> DataFrame:
    """Returns ``df`` columns plus ``bucket``, ``pack_id`` (global pack
    identity = bucket * large_stride + local pack), and ``pack_offset``
    (token offset of this doc within its bucket's stream).

    One shuffle (the per-bucket window); no global ordering anywhere.
    ``bucket_expr`` overrides the default murmur3 bucketing — pass an
    md5-derived bucket when another engine must reproduce the layout.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.hash(F.col(id_col)), F.lit(n_buckets))
    ).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    out = df.withColumn("bucket", bucket).withColumn("pack_offset", start)
    local_pack = F.floor(F.col("pack_offset") / F.lit(budget))
    # stride packs by bucket so pack_id is globally unique without any
    # cross-bucket coordination; 2^40 tokens/bucket headroom
    stride = (1 << 40) // budget
    return out.withColumn(
        "pack_id", (F.col("bucket").cast("long") * stride + local_pack).cast("long")
    )


def packing_efficiency(
    packed: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-pack fill report: ``[pack_id, n_docs, n_tokens, fill_ratio]``.
    Straddling docs count toward the pack they start in, so fill_ratio
    can exceed 1.0 for packs whose last doc overflows the boundary."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("n_tokens"),
        (F.sum(token_col) / F.lit(budget)).cast("double").alias("fill_ratio"),
    )
