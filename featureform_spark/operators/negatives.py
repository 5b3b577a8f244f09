"""Deterministic negative sampling for contrastive / recommender
training data.

Supervised retrieval and recsys training sets need, for every user
(anchor), K items the user did NOT interact with. The naive
formulations both fail at 100 TB: a per-user `rand()` sample is
irreproducible across retries (a shuffle re-run silently changes the
training set), and a cross join user × catalog is quadratic. The
standard scalable construction — used here — is hash-slot sampling:

1. the item catalog gets a DENSE index 0..n-1 (distributed
   ``with_row_index`` over the item id order — a range sort, never a
   single-partition window);
2. every user deterministically owns ``K × oversample`` slots;
   slot ``j`` maps to item index ``md5(user # seed # j) mod n`` — a
   pure codegen expression, reproducible anywhere (the md5
   convention every seeded operator in this repo shares);
3. candidates join the index (one equi-join), positives are removed
   with an anti-join, slot-collisions collapse to the lowest slot,
   and the first K survivors per user (by slot order) are kept.

Every stage is a bounded equi-join or a per-user window over
``≤ K × oversample`` rows; nothing is quadratic and nothing depends
on partition layout. A user who has interacted with nearly the whole
catalog can end up with fewer than K negatives (oversample controls
the headroom — each extra slot survives with probability
``1 - positives/n``); callers that need exactly K raise oversample.

No reference counterpart (featureform serves features; training-pair
construction is left to users); beyond-reference training-data
family, SURVEY.md §8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featureform_spark.operators.materialize import with_row_index

__all__ = ["sample_negatives"]


def sample_negatives(
    positives: DataFrame,
    items: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    seed: int = 42,
    oversample: int = 2,
) -> DataFrame:
    """(user, item, neg_rank 1..≤k) — K deterministic non-interacted
    items per user appearing in ``positives``.

    Assignment is a pure function of (user, seed, catalog order):
    stable under retries, repartitioning, and engine — the DuckDB
    oracle reproduces it exactly."""
    if k < 1:
        raise ValueError("sample_negatives: k must be >= 1")
    if oversample < 1:
        raise ValueError("sample_negatives: oversample must be >= 1")
    # NULL ids are excluded on BOTH sides: a NULL item would take
    # dense index 0 (Spark sorts nulls first) and — surviving every
    # anti-join, since NULL equals nothing — be emitted as a
    # "negative"; a NULL user cannot form a slot key (md5 of NULL
    # concat is NULL) and would silently get no negatives. Neither is
    # a meaningful training pair.
    catalog = (
        items.select(item_col)
        .where(F.col(item_col).isNotNull())
        .distinct()
    )
    # the persist (lazy — materialized inside the one final job) pins
    # a single evaluation of the index, so the per-partition offsets
    # and the candidate join can never disagree on range boundaries
    idx = with_row_index(
        catalog, order_cols=[item_col], index_col="_idx", start=0
    ).persist()
    # the catalog size rides in as a broadcast one-row frame (exactly
    # the oracle's `FROM slots, n` shape) instead of an eager
    # idx.count(): no blocking driver action before the main plan, and
    # the count's distinct subtree shares its exchange with the index
    n_row = catalog.agg(F.count(F.lit(1)).alias("_n"))
    users = (
        positives.select(user_col)
        .where(F.col(user_col).isNotNull())
        .distinct()
    )
    n_slots = k * oversample
    slots = users.select(
        user_col,
        F.explode(F.array(*[F.lit(j) for j in range(n_slots)])).alias(
            "_slot"
        ),
    )
    slot_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(user_col).cast("string"),
                    F.lit(f"#neg{seed}#"),
                    F.col("_slot").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    # % 0 would yield NULL slots and a silently-empty result; keep the
    # empty-catalog failure loud (now raised from the executor)
    slot_idx = F.when(
        F.col("_n") > 0, slot_hash % F.col("_n")
    ).otherwise(
        F.raise_error(
            F.lit("sample_negatives: empty item catalog")
        ).cast("long")
    )
    cand = (
        slots.crossJoin(F.broadcast(n_row))
        .withColumn("_idx", slot_idx)
        .join(idx, ["_idx"])
        .select(user_col, item_col, "_slot")
    )
    non_pos = cand.join(
        positives.select(user_col, item_col).distinct(),
        [user_col, item_col],
        "left_anti",
    )
    # slot collisions (two slots -> same item) collapse to the lowest
    # slot so the rank ordering is well-defined
    deduped = non_pos.groupBy(user_col, item_col).agg(
        F.min("_slot").alias("_slot")
    )
    w = Window.partitionBy(user_col).orderBy(
        F.col("_slot").asc(), F.col(item_col).asc()
    )
    return (
        deduped.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(user_col, item_col, "neg_rank")
    )
