"""Range (interval) join: match left rows whose timestamp falls in a
right-side [start, end) window, with an equi-bucketed physical plan.

The naive formulation — ``l JOIN r ON key AND l.ts >= r.start AND
l.ts < r.end`` — is a broadcast-nested-loop (or shuffle-sorted theta)
join: O(|l|·|r|) per key group, which collapses at 100 TB. The scale
path here quantizes time into fixed buckets: each interval explodes
into the buckets it spans, the probe side computes its single bucket,
and the join becomes a plain hash equi-join on (key, bucket) with the
exact range predicate applied as a post-filter. A left row's bucket
intersects a covering interval exactly once, so no dedup pass is
needed. This is the same trick Databricks' range-join hint and
Flink's interval join use; bucket width should be chosen near the
median interval length so the explode factor stays ~1-2.

No reference-parity citation: featureform generates no range joins
(SURVEY.md §2.3 — "No theta/range/interval joins"); this is part of
the beyond-reference pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` intervals containing their ts.

    ``on``: optional equality keys (e.g. entity id) joined alongside
    the containment predicate. ``end_col`` is exclusive. Interval and
    probe timestamps may be DATE or TIMESTAMP; both are compared at
    microsecond precision after an implicit cast.

    Only ``inner`` and ``left`` are supported: the right side is
    exploded one row per spanned bucket, so right/full outer shapes
    would surface each unmatched interval once per bucket as duplicate
    null-extended rows (same guard as ``salted_join``).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r}: the "
            "bucket-exploded right side would duplicate unmatched rows "
            "in right/full outer joins"
        )
    on = on or []
    lts = F.col(left_ts).cast("timestamp")
    start = F.col(start_col).cast("timestamp")
    end = F.col(end_col).cast("timestamp")

    bucketed_right = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(start.cast("double") / bucket_seconds).cast("long"),
                # end is exclusive: an interval ending exactly on a bucket
                # boundary does not reach into that bucket
                F.floor(
                    (end.cast("double") - F.lit(1e-6)) / bucket_seconds
                ).cast("long"),
            )
        ),
    )
    bucketed_left = left.withColumn(
        "__bucket", F.floor(lts.cast("double") / bucket_seconds).cast("long")
    )

    cond = [bucketed_left["__bucket"] == bucketed_right["__bucket"]]
    for k in on:
        cond.append(bucketed_left[k] == bucketed_right[k])
    range_pred = (bucketed_left[left_ts].cast("timestamp") >= bucketed_right[start_col].cast("timestamp")) & (
        bucketed_left[left_ts].cast("timestamp") < bucketed_right[end_col].cast("timestamp")
    )

    joined = bucketed_left.join(
        bucketed_right, on=[*cond, range_pred], how=how
    )
    keep = [bucketed_left[c] for c in left.columns] + [
        bucketed_right[c] for c in right.columns if c not in on
    ]
    return joined.select(*keep)
