"""Persistent hyperplane-bucket store for continuous embedding
near-dup — the vector twin of :mod:`signature_store` (which covers
text MinHash banding).

A continuously-ingesting multimodal/embedding pipeline has the same
problem the text side solved in round 8: re-running corpus-wide
embedding near-dup per batch rescans the corpus. The store persists
``(vec_id, bucket, embedding, norm)`` rows — one row per accepted
vector (hyperplane bucketing needs no banding explosion) — so each
batch is:

- **flag**: bucket the batch inline (one Arrow-kernel projection),
  equi-join on ``bucket`` against the store pruned to the batch's
  buckets, verify candidates with the exact cosine (the store carries
  vectors + precomputed norms, so verification is a dot product per
  candidate — same fp operation order as ``embedding_near_dup_pairs``,
  bit-reproducible);
- **ingest**: append the clean vectors' rows, O(batch).

Unlike the MinHash store (bucket-only, candidate semantics), this
store keeps the vectors, so flags are EXACT at the configured
threshold — a bucket collision below the cosine threshold does not
flag. The price is state size: dim doubles + 8 bytes per vector
(~520 B/vector at dim 64) vs the text store's ~320 B/doc; both
bucket-partition cleanly.

Bucketing is pinned at construction and persisted as table properties
(like banding, bucket schemes cannot mix); ``.auto`` sizes a NEW
store's plane count for the corpus the deployment expects to
accumulate via :func:`lsh_autosize.auto_num_planes`.

No reference counterpart (featureform has no corpus ops); this backs
the beyond-reference dedup layer (SURVEY.md §8.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featureform_spark.functions.similarity import (
    _as_double,
    bucket_pandas,
    norm_pandas,
)
from featureform_spark.sources.deltalite import DeltaliteTable


class EmbeddingStore:
    """Hyperplane-bucket vector store with flag/ingest lifecycle."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        dim: int,
        num_planes: int = 8,
        cosine_threshold: float = 0.95,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.table = DeltaliteTable(spark, path)
        self.dim = int(dim)
        self.num_planes = int(num_planes)
        self.cosine_threshold = float(cosine_threshold)
        self.id_col = id_col
        self.vec_col = vec_col
        if self.table.exists():
            props = self.table.properties()
            for k, v in (
                ("dim", self.dim),
                ("num_planes", self.num_planes),
            ):
                stored = props.get(f"emb.{k}")
                if stored is not None and int(stored) != v:
                    raise ValueError(
                        f"store at {path} was built with {k}={stored}, "
                        f"got {k}={v} — bucket schemes cannot be mixed"
                    )

    @classmethod
    def auto(
        cls,
        spark: SparkSession,
        path: str,
        dim: int,
        expected_corpus_rows: int,
        cosine_threshold: float = 0.95,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "EmbeddingStore":
        """Open/create with auto-sized planes — destination-sized, like
        ``SignatureStore.auto``: a NEW store derives the plane count
        from the corpus the deployment expects to ACCUMULATE (bucketing
        is pinned for the store's lifetime); an existing store loads
        its pinned properties and ignores the expectation."""
        probe = DeltaliteTable(spark, path)
        if probe.exists():
            props = probe.properties()
            num_planes = int(props.get("emb.num_planes", 8))
            dim = int(props.get("emb.dim", dim))
        else:
            from featureform_spark.functions.lsh_autosize import (
                auto_num_planes,
            )

            num_planes = auto_num_planes(expected_corpus_rows)
        return cls(
            spark,
            path,
            dim=dim,
            num_planes=num_planes,
            cosine_threshold=cosine_threshold,
            id_col=id_col,
            vec_col=vec_col,
        )

    def _rows(self, batch: DataFrame) -> DataFrame:
        v = _as_double(F.col(self.vec_col))
        return batch.select(
            F.col(self.id_col),
            v.alias("_v"),
            norm_pandas()(v).alias("_n"),
            bucket_pandas(self.dim, self.num_planes)(v).alias("bucket"),
        )

    def stored_rows(self) -> DataFrame:
        if not self.table.exists():
            return self.spark.createDataFrame(
                [],
                f"{self.id_col} long, _v array<double>, _n double, "
                "bucket string",
            )
        return self.table.snapshot()

    def flag(self, batch: DataFrame) -> DataFrame:
        """[id_col, is_dup, dup_of] per batch vector: is_dup=1 iff an
        ACCEPTED vector in the same bucket clears the cosine
        threshold; dup_of is the smallest such accepted id (NULL when
        clean). Exact — bucket collisions below threshold don't flag.

        Scale shape: the store side is semi-pruned to the batch's
        bucket set BEFORE the candidate join (a batch touches few
        buckets; the store scan prunes on the join key), then one
        equi-join + dot-product verify per candidate."""
        from featureform_spark.functions.similarity import dot_pandas

        b = self._rows(batch)
        touched = b.select("bucket").distinct()
        stored = self.stored_rows().join(
            F.broadcast(touched), "bucket", "left_semi"
        )
        cand = b.alias("n").join(
            stored.select(
                F.col("bucket"),
                F.col(self.id_col).alias("_sid"),
                F.col("_v").alias("_sv"),
                F.col("_n").alias("_sn"),
            ),
            "bucket",
        )
        hits = (
            cand.where(
                dot_pandas()(F.col("_v"), F.col("_sv"))
                / (F.col("_n") * F.col("_sn"))
                >= F.lit(self.cosine_threshold)
            )
            .groupBy(self.id_col)
            .agg(F.min("_sid").alias("dup_of"))
        )
        return (
            batch.select(self.id_col)
            .join(hits, self.id_col, "left")
            .select(
                F.col(self.id_col),
                F.col("dup_of").isNotNull().cast("long").alias("is_dup"),
                "dup_of",
            )
        )

    def ingest(self, batch: DataFrame) -> DataFrame:
        """Flag, admit clean vectors' rows, return flags (materialized
        so the flag join saw the store BEFORE this batch landed).
        Batch-internal duplicates are the caller's in-batch problem,
        same contract as the text store."""
        flags = self.flag(batch).localCheckpoint()
        clean = batch.join(
            flags.filter("is_dup = 0").select(self.id_col), self.id_col
        )
        rows = self._rows(clean)
        if self.table.exists():
            self.table.append(rows)
        else:
            self.table.create(
                rows,
                properties={
                    "emb.dim": str(self.dim),
                    "emb.num_planes": str(self.num_planes),
                },
            )
        return flags
