"""Point-in-time (as-of) training-set join — the engine's signature operator.

Semantics replicated from the reference (provider/spark.go:105-248,
provider/tsquery/tsquery.go:191-350, truth tables
provider/offline_test.go:1010-1240):

- for each label row, each feature contributes its latest value with
  ``feature.ts <= label.ts`` (ties at equal ts INCLUDE the feature; equal
  feature ts duplicates → last-written wins);
- feature with no timestamp → plain latest-per-entity equi join (J4);
- label with no timestamp → features evaluated at +infinity, i.e. overall
  latest per entity (J5);
- lag features: the join bound shifts to ``feature.ts + lag <= label.ts``
  (J6) — implemented by shifting feature timestamps before the join;
- multi-entity labels: each feature matches on its own label column (J10).

Spark-first design: the reference emits N left-outer inequality joins plus
a de-dup window — on Spark an inequality join is a broadcast-nested-loop
(or a row-exploding range join) and each feature adds a shuffle. We
instead UNION label and feature rows on (entity, ts) and run ONE window
pass with ``last(value_i, ignorenulls=True)`` over
``rowsBetween(unboundedPreceding, currentRow)``: every feature value is
carried forward to the label rows that follow it in (ts, is_label, ord)
order. N features against one label = ONE shuffle + sort, independent of
N (one pass per distinct entity join-key for multi-entity labels). This
is the standard scalable as-of join formulation (same shape Spark itself
uses for stream-stream interval joins).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# label-without-timestamp sentinel: evaluate features "as of +infinity"
MAX_TS = "9999-12-31 23:59:59"
EPOCH0 = "1970-01-01 00:00:00"


@dataclass
class FeatureInput:
    """One feature table entering the PIT join."""

    name: str                      # output column name
    df: DataFrame = None
    entity_col: str = "entity"
    value_col: str = "value"
    ts_col: str | None = None
    lag_seconds: float = 0.0       # J6: feature.ts + lag <= label.ts
    order_col: str | None = None   # ingestion index for last-write-wins
    label_entity_col: str | None = None  # J10: which label column to join on


def lag_interval(seconds: float) -> Column:
    """``INTERVAL <seconds> SECONDS`` as an expression. Spark's
    interval parser rejects exponent notation, so values whose repr
    uses one (1e-05, 5e+16) are rendered in plain decimal; ordinary
    values keep their exact repr. Shared by the batch join and the
    streaming PIT twin so both shift bounds identically."""
    s = repr(float(seconds))
    if "e" in s or "E" in s:
        s = format(float(seconds), ".9f")
    return F.expr(f"INTERVAL {s} SECONDS")


def _ts_expr(ts_col: str | None, default: str) -> Column:
    if ts_col is None:
        return F.lit(default).cast("timestamp")
    return F.coalesce(F.col(ts_col).cast("timestamp"), F.lit(default).cast("timestamp"))


def resolve_labels(
    df: DataFrame,
    entity_col: str = "entity",
    value_col: str = "value",
    ts_col: str | None = None,
    order_col: str | None = None,
    out_entity: str = "entity",
    out_value: str = "value",
    out_ts: str = "ts",
) -> DataFrame:
    """Reference label resolution (client/tests/serving_cases.py
    ``labels``, "WithSameTimestamp"): duplicate (entity, ts) label rows
    collapse LAST-WRITE-WINS — one label per (entity, timestamp), not
    per entity (unlike materialize). No-ts labels collapse per entity.
    One partial-aggregated groupBy; ``order_col`` is the ingestion
    index (falls back to partition layout with the usual warning)."""
    from featureform_spark.operators.materialize import _ord_or_warn

    ord_expr = _ord_or_warn(order_col, ts_col, "resolve_labels")
    keys = [F.col(entity_col).alias(out_entity)]
    if ts_col is not None:
        keys.append(F.col(ts_col).cast("timestamp").alias(out_ts))
    packed = df.select(
        *keys,
        F.struct(
            ord_expr.alias("ord"), F.col(value_col).alias("value")
        ).alias("_m"),
    )
    latest = packed.groupBy(
        *[out_entity] + ([out_ts] if ts_col is not None else [])
    ).agg(F.max("_m").alias("_m"))
    return latest.select(
        out_entity,
        *( [out_ts] if ts_col is not None else [] ),
        F.col("_m.value").alias(out_value),
    )


def point_in_time_join(
    label: DataFrame,
    features: list[FeatureInput],
    label_entity_col: str = "entity",
    label_value_col: str = "value",
    label_ts_col: str | None = None,
    label_cols: list[str] | None = None,
    out_entity: str = "entity",
    out_label: str = "label",
    out_ts: str = "label_ts",
    dedup: bool = False,
    sort_by_ts: bool = False,
    time_bucket: str | None = None,
    provenance: bool = False,
) -> DataFrame:
    """As-of join N feature tables against a label table.

    Returns (entity, <feature_1..N>, label[, label_ts][, extra label_cols]).
    ``dedup`` collapses duplicate (entity, label, label_ts) output rows like
    the reference's training-set window (provider/spark.go:233-246).

    ``provenance=True`` additionally emits one ``<name>__ts`` column
    per feature: the source timestamp of the feature row each value
    came from (the feature's OWN ts, not the lag-shifted effective
    time — provenance records where the value originated; the shift
    only moves visibility). NULL where no feature row had matched
    yet; epoch-0 for no-ts features (their sentinel). The columns
    ride the SAME window pass — zero extra shuffles — and feed
    ``operators.audit.freshness_report``. The reference keeps no
    row-level provenance (training sets are opaque DataFrames);
    beyond-reference trust tooling.

    ``time_bucket`` (e.g. ``"30 days"``, any ``date_trunc``-compatible
    unit via ``"unit:N"`` is not needed — pass a Spark interval string
    understood by ``window()``): enables the skew-resistant segmented
    formulation — rows partition by (entity, time-bucket) so one hot
    entity's history splits across buckets instead of one sort
    partition; carry-in values between buckets come from a second
    window over the per-bucket finals (rows ≈ entities × buckets — tiny
    relative to the input). Identical semantics, two narrow shuffles
    instead of one wide one; use when entity skew is the bottleneck.
    """
    extra = list(label_cols or [])

    # ---- label side: one row per output row -------------------------------
    label_ts = _ts_expr(label_ts_col, MAX_TS)
    out_ts_expr = (
        F.col(label_ts_col).cast("timestamp") if label_ts_col else F.lit(None).cast("timestamp")
    )
    current = label.select(
        F.col(label_entity_col).alias(out_entity),
        *[F.col(c) for c in extra],
        F.col(label_value_col).alias(out_label),
        out_ts_expr.alias(out_ts),
        label_ts.alias("_ts"),
        F.lit(1).alias("_is_label"),
        F.lit(None).cast("long").alias("_ord"),
        *[
            F.col(f.label_entity_col).alias(f"_join_{f.label_entity_col}")
            for f in features
            if f.label_entity_col and f.label_entity_col != label_entity_col
        ],
    )

    # group features by the label column they join on (J10); each group is
    # one union+window pass that carries previously-computed columns through
    groups: dict[str, list[FeatureInput]] = {}
    for f in features:
        key = f.label_entity_col or label_entity_col
        groups.setdefault(key, []).append(f)

    done_cols: list[str] = []
    for join_col, group in groups.items():
        part_key = (
            out_entity if join_col == label_entity_col else f"_join_{join_col}"
        )
        if (
            time_bucket is None
            and part_key != out_entity
            and all(f.ts_col is None for f in group)
        ):
            # ts-less SECONDARY-key group: the as-of window degenerates
            # to a static lookup, and a secondary join key would cost an
            # entire extra shuffle+sort of the accumulated label frame —
            # resolve it with per-feature aggregate + broadcast left
            # join instead (see _lookup_pass). Primary-key ts-less
            # groups stay on the window pass: measured A/B at sf0.1
            # (training_set_feature_no_ts 0.61s window vs 0.85s lookup)
            # shows the aggregate+broadcast fixed costs exceed the one
            # label shuffle they'd save at benched scale.
            current = _lookup_pass(current, group, part_key, provenance)
        else:
            current = _asof_pass(
                current, group, part_key, out_entity, out_label, out_ts,
                extra, done_cols, time_bucket, provenance,
            )
        done_cols.extend(f.name for f in group)

    result = current.select(
        out_entity,
        *extra,
        *[f.name for f in features],
        *([f"{f.name}__ts" for f in features] if provenance else []),
        out_label,
        *([out_ts] if label_ts_col else []),
    )
    if dedup:
        result = result.dropDuplicates()
    if sort_by_ts and label_ts_col:
        result = result.orderBy(out_ts)
    return result


def _lookup_pass(
    current: DataFrame,
    group: list[FeatureInput],
    part_key: str,
    provenance: bool = False,
) -> DataFrame:
    """Join-based equivalent of ``_asof_pass`` for an all-ts-less group.

    With no feature timestamps every feature row sits at the EPOCH0
    sentinel (+lag), so the as-of window's answer for every label is a
    CONSTANT per entity: the max-``_ord`` non-NULL-value row (the
    ``last(..., ignorenulls)`` winner — NULL-valued rows are no-writes),
    visible whenever ``label._ts >= EPOCH0 + lag``. That is a static
    lookup, not a time join — so resolve it as one small aggregate per
    feature table + a left join, and let the planner broadcast the
    aggregated side. The union+window formulation shuffles and sorts
    the label table once per group; this shuffles only the feature
    tables (label-side exchange appears only when a feature aggregate
    is too big to broadcast — the same key the window shuffled on).

    Tie handling matches ``resolve_labels``'s established convention:
    ``max(struct(ord, value))`` — identical to the window whenever
    ``order_col`` is unique per entity (duplicate (entity, ord) rows
    were already declared partition-layout-dependent there).
    """
    epoch0 = F.lit(EPOCH0).cast("timestamp")
    out = current
    for f in group:
        if f.order_col is not None:
            ord_expr = F.col(f.order_col).cast("long")
        else:
            import warnings

            warnings.warn(
                f"feature {f.name!r}: no order_col given; equal-timestamp "
                "duplicate rows tie-break by partition layout "
                "(monotonically_increasing_id) and may differ across "
                "retries — pass order_col for deterministic "
                "last-write-wins",
                stacklevel=2,
            )
            ord_expr = F.monotonically_increasing_id()
        latest = (
            f.df.filter(
                F.col(f.entity_col).isNotNull()
                & F.col(f.value_col).isNotNull()
            )
            .select(
                F.col(f.entity_col).alias(part_key),
                F.struct(
                    ord_expr.alias("ord"), F.col(f.value_col).alias("value")
                ).alias("_m"),
            )
            .groupBy(part_key)
            .agg(F.max("_m").alias(f"_m_{f.name}"))
        )
        visible = (
            F.col("_ts") >= epoch0 + lag_interval(f.lag_seconds)
            if f.lag_seconds
            else F.col("_ts") >= epoch0
        )
        val = F.when(visible, F.col(f"_m_{f.name}.value")).alias(f.name)
        prov_cols = []
        if provenance:
            # the winning row's own ts is the EPOCH0 sentinel whenever
            # a value resolved (pre-lag, same as _asof_pass's raw_ts)
            prov_cols = [
                F.when(visible & F.col(f"_m_{f.name}").isNotNull(), epoch0)
                .alias(f"{f.name}__ts")
            ]
        out = out.join(latest, part_key, "left").select(
            *[F.col(c) for c in out.columns], val, *prov_cols
        )
    return out


def _asof_pass(
    current: DataFrame,
    group: list[FeatureInput],
    part_key: str,
    out_entity: str,
    out_label: str,
    out_ts: str,
    extra: list[str],
    done_cols: list[str],
    time_bucket: str | None = None,
    provenance: bool = False,
) -> DataFrame:
    """One union+window pass computing the columns for ``group``."""
    carry = [c for c in current.columns if c not in {"_ts", "_is_label", "_ord"}]
    new_names = [f.name for f in group]
    prov_names = [f"{n}__ts" for n in new_names] if provenance else []

    label_part = current.select(
        *[F.col(c) for c in carry],
        F.col("_ts"),
        F.col("_is_label"),
        F.col("_ord"),
        *[F.lit(None).alias(n) for n in new_names],
        *[F.lit(None).cast("timestamp").alias(p) for p in prov_names],
    )

    parts = [label_part]
    for f in group:
        if f.order_col is not None:
            ord_expr = F.col(f.order_col).cast("long")
        else:
            # ids follow partition layout, so equal-ts duplicate feature
            # rows can resolve differently across retries/repartitions —
            # surface it instead of silently picking an order
            import warnings

            warnings.warn(
                f"feature {f.name!r}: no order_col given; equal-timestamp "
                "duplicate rows tie-break by partition layout "
                "(monotonically_increasing_id) and may differ across "
                "retries — pass order_col for deterministic "
                "last-write-wins",
                stacklevel=2,
            )
            ord_expr = F.monotonically_increasing_id()
        fts = _ts_expr(f.ts_col, EPOCH0)
        if f.lag_seconds:
            # shift the feature's effective time forward: it becomes
            # visible to labels only once label_ts >= ts + lag
            fts = fts + lag_interval(f.lag_seconds)
        # provenance records the feature's OWN timestamp (pre-lag):
        # the shift only moves visibility, not where the value came from
        raw_ts = _ts_expr(f.ts_col, EPOCH0)
        fpart = f.df.filter(F.col(f.entity_col).isNotNull()).select(
            F.col(f.entity_col).alias(part_key),
            *[F.lit(None).cast(current.schema[c].dataType).alias(c) for c in carry if c != part_key],
            fts.alias("_ts"),
            F.lit(0).alias("_is_label"),
            ord_expr.alias("_ord"),
            *[
                (F.col(f.value_col) if g is f else F.lit(None)).alias(g.name)
                for g in group
            ],
            *[
                (
                    # NULL-value feature rows are no-writes to last(...,
                    # ignorenulls) — their provenance must be NULL too,
                    # or the __ts column would resolve to a row the
                    # value column skipped
                    F.when(F.col(f.value_col).isNotNull(), raw_ts)
                    if g is f
                    else F.lit(None).cast("timestamp")
                ).alias(f"{g.name}__ts")
                for g in (group if provenance else [])
            ],
        )
        parts.append(fpart)

    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)

    # order: time asc; at equal ts features (0) before labels (1) → `<=`
    # inclusive; among equal-ts feature rows the highest ord wins last()
    order = (F.col("_ts").asc(), F.col("_is_label").asc(), F.col("_ord").asc())

    if time_bucket is None:
        w = (
            Window.partitionBy(part_key)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            *[F.col(c) for c in carry],
            "_ts",
            "_is_label",
            "_ord",
            *[F.last(n, ignorenulls=True).over(w).alias(n) for n in new_names],
            *[F.last(p, ignorenulls=True).over(w).alias(p) for p in prov_names],
        )
        return filled.filter(F.col("_is_label") == 1)

    # segmented (skew-resistant) formulation: partition by (entity,
    # time bucket) so a hot entity's history splits across buckets; the
    # value a label inherits from earlier buckets ("carry-in") comes from
    # a per-bucket finals table that is ~entities × buckets rows
    b = unioned.withColumn("_bkt", F.window(F.col("_ts"), time_bucket).getField("start"))
    w_in = (
        Window.partitionBy(part_key, "_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = b.select(
        *[F.col(c) for c in carry],
        "_ts",
        "_is_label",
        "_bkt",
        *[F.last(n, ignorenulls=True).over(w_in).alias(n) for n in new_names],
        *[F.last(p, ignorenulls=True).over(w_in).alias(p) for p in prov_names],
    ).filter(F.col("_is_label") == 1)

    # per-bucket final feature values: max(ts, ord) feature row per bucket
    # (struct also carries the provenance ts so carry-in resolves both
    # value and source timestamp from the SAME winning row)
    finals = b.groupBy(part_key, "_bkt").agg(
        *[
            F.max(
                F.when(
                    F.col(n).isNotNull(),
                    F.struct(
                        F.col("_ts").alias("t"),
                        F.col("_ord").alias("o"),
                        F.col(n).alias("v"),
                        *(
                            [F.col(f"{n}__ts").alias("pt")]
                            if provenance
                            else []
                        ),
                    ),
                )
            ).alias(f"_fin_{n}")
            for n in new_names
        ]
    )
    w_carry = (
        Window.partitionBy(part_key)
        .orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = finals.select(
        part_key,
        "_bkt",
        *[
            F.last(f"_fin_{n}", ignorenulls=True).over(w_carry).getField("v").alias(f"_carry_{n}")
            for n in new_names
        ],
        *[
            F.last(f"_fin_{n}", ignorenulls=True)
            .over(w_carry)
            .getField("pt")
            .alias(f"_carry_{n}__ts")
            for n in (new_names if provenance else [])
        ],
    )
    joined = within.join(carry_in, [part_key, "_bkt"], "left")
    return joined.select(
        *[F.col(c) for c in carry],
        "_ts",
        "_is_label",
        F.lit(None).cast("long").alias("_ord"),
        *[F.coalesce(F.col(n), F.col(f"_carry_{n}")).alias(n) for n in new_names],
        *[
            F.coalesce(F.col(p), F.col(f"_carry_{p}")).alias(p)
            for p in prov_names
        ],
    )
