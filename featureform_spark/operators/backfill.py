"""Incremental training-set backfill for late-arriving feature data.

At 100 TB the dominant cost of a training set is not building it once
— it is REBUILDING it every time a feature's upstream lands late
data (an unsealed Kafka partition, a corrected batch, a backdated
CDC row). The naive response (rebuild the world) rescans every
feature's full history for one straggler batch. The PIT join's
semantics make the minimal recomputation set exact and cheap to
derive:

- a feature row at time ``t`` (visible from ``t + lag``) can only
  change label rows of the SAME entity with ``label_ts >= t + lag``
  — the as-of join never looks forward;
- so the affected set is ``{(entity, label_ts) : label_ts >=
  min_visible_late_ts(entity)}``, driven by a PER-ENTITY MIN over
  just the late rows — an aggregate the size of the late batch's
  entity set, broadcast everywhere it's used.

``backfill_training_set`` recomputes exactly that slice (labels
filtered by the broadcast bounds; every feature history semi-joined
to the affected entities, so rebuild cost is proportional to the
affected entities' history, not the corpus), carries every other
prior row untouched, and returns prior ∪ rebuilt — proven equal to
a from-scratch rebuild on the merged inputs
(tests/test_backfill.py, and the driver row's oracle IS the full
rebuild). The reference has no incremental path: training sets are
re-materialized wholesale (provider/spark.go:105-248).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureform_spark.operators.training_set import (
    FeatureInput,
    lag_interval,
    point_in_time_join,
)

__all__ = ["backfill_training_set", "affected_label_bounds"]


def affected_label_bounds(
    features: list[FeatureInput], late: dict[str, DataFrame]
) -> DataFrame:
    """(entity, min_ts): per entity, the earliest label timestamp any
    late row can influence — ``min(late.ts + lag)`` across that
    entity's late rows over all late features. One partial-agg
    groupBy per late batch; output is the late batch's entity set
    (tiny — broadcast it)."""
    by_name = {f.name: f for f in features}
    unknown = sorted(set(late) - set(by_name))
    if unknown:
        raise ValueError(
            f"backfill: late data for unknown feature(s) {unknown}; "
            f"declared features: {sorted(by_name)}"
        )
    parts = []
    for name, batch in late.items():
        f = by_name[name]
        if f.ts_col is None:
            raise ValueError(
                f"backfill: feature {name!r} has no timestamp — a late "
                "row rewrites its single latest-value state, so every "
                "label row of that entity is affected; rebuild that "
                "feature's materialization instead of backfilling"
            )
        # NULL-ts late rows map to EPOCH0 in the PIT join (_ts_expr) —
        # visible to EVERY label of the entity, so the bound must be
        # EPOCH0, not a silently-dropped NULL
        from featureform_spark.operators.training_set import EPOCH0

        vis = F.coalesce(
            F.col(f.ts_col).cast("timestamp"),
            F.lit(EPOCH0).cast("timestamp"),
        )
        if f.lag_seconds:
            vis = vis + lag_interval(f.lag_seconds)
        parts.append(
            batch.select(
                F.col(f.entity_col).alias("entity"),
                vis.alias("_vis"),
            )
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy("entity").agg(F.min("_vis").alias("min_ts"))


def backfill_training_set(
    prior: DataFrame,
    label: DataFrame,
    features: list[FeatureInput],
    late: dict[str, DataFrame],
    label_entity_col: str = "entity",
    label_ts_col: str = "ts",
    out_entity: str = "entity",
    out_ts: str = "label_ts",
    **pit_kwargs,
) -> DataFrame:
    """Patch ``prior`` (the training set previously built by
    ``point_in_time_join(label, features, ...)`` with the SAME
    keyword arguments) with late feature rows, recomputing only the
    label rows the late data can influence.

    ``late`` maps feature name -> DataFrame of late rows (same schema
    as that feature's source). Returns a DataFrame equal to the full
    rebuild ``point_in_time_join(label, merged_features, ...)`` —
    the equivalence is the operator's contract and its test.

    Multi-entity caveat: features joined on a label column other than
    the primary entity (``label_entity_col``) are rejected — their
    affected set keys on a different column and would need its own
    bounds pass; rebuild wholesale for those.
    """
    if not late:
        return prior
    for f in features:
        if f.name in late and f.label_entity_col not in (
            None,
            label_entity_col,
        ):
            raise ValueError(
                f"backfill: feature {f.name!r} joins on label column "
                f"{f.label_entity_col!r}, not the primary entity — "
                "its affected set is not derivable from these bounds"
            )
    bounds = F.broadcast(affected_label_bounds(features, late))
    entity_set = F.broadcast(bounds.select("entity"))

    merged = []
    for f in features:
        df = f.df
        if f.name in late:
            df = df.unionByName(late[f.name])
        # rebuild only needs the affected entities' history — but the
        # pruning key is the PRIMARY entity, so only prune features
        # that join on it; a secondary-entity (J10) feature's ids live
        # in a different key domain and its full history must survive
        if f.label_entity_col in (None, label_entity_col):
            df = df.join(
                entity_set.withColumnRenamed("entity", f.entity_col),
                [f.entity_col],
                "left_semi",
            )
        merged.append(
            FeatureInput(
                name=f.name,
                df=df,
                entity_col=f.entity_col,
                value_col=f.value_col,
                ts_col=f.ts_col,
                lag_seconds=f.lag_seconds,
                order_col=f.order_col,
                label_entity_col=f.label_entity_col,
            )
        )

    # NULL-ts label rows evaluate at +infinity in the PIT join, so any
    # late row affects them — coalesce to the same MAX_TS sentinel
    from featureform_spark.operators.training_set import MAX_TS

    inf = F.lit(MAX_TS).cast("timestamp")
    if label_ts_col is None:
        affected_labels = label.join(
            entity_set.withColumnRenamed("entity", label_entity_col),
            [label_entity_col],
            "left_semi",
        )
    else:
        lts = F.coalesce(F.col(label_ts_col).cast("timestamp"), inf)
        affected_labels = (
            label.join(
                bounds.withColumnRenamed("entity", label_entity_col),
                [label_entity_col],
                "inner",
            )
            .filter(lts >= F.col("min_ts"))
            .drop("min_ts")
        )
    rebuilt = point_in_time_join(
        affected_labels,
        merged,
        label_entity_col=label_entity_col,
        label_ts_col=label_ts_col,
        out_entity=out_entity,
        out_ts=out_ts,
        **pit_kwargs,
    )

    # untouched prior rows: entity not in bounds, or label_ts before
    # the entity's earliest affected instant (NULL out_ts = +inf
    # labels are always rebuilt for affected entities)
    if label_ts_col is not None and out_ts not in prior.columns:
        raise ValueError(
            f"backfill: prior is missing the {out_ts!r} column the "
            "keep/rebuild split keys on — pass the training set as "
            "point_in_time_join produced it (or name out_ts)"
        )
    prior_ts = (
        F.coalesce(F.col(out_ts).cast("timestamp"), inf)
        if label_ts_col is not None
        else inf
    )
    keep = (
        prior.join(
            bounds.withColumnRenamed("entity", out_entity),
            [out_entity],
            "left",
        )
        .filter(F.col("min_ts").isNull() | (prior_ts < F.col("min_ts")))
        .drop("min_ts")
    )
    return keep.unionByName(rebuilt.select(*prior.columns))
