"""Point-in-time leakage audit — trust tooling for the PIT join.

The costliest silent failure in a feature platform is TEMPORAL
LEAKAGE: a training set built with a time-unaware join serves each
label the feature's OVERALL latest value, including values written
after the label event — the model trains on the future and collapses
in production. The reference's PIT join prevents this by
construction (provider/tsquery/tsquery.go:191-350); this operator
AUDITS it: for every label row it reports the correct as-of value,
the value a naive latest-per-entity join would have served, whether
they differ (the leak), and how many future feature rows exist for
that entity.

Use it to (a) quantify the damage before migrating a legacy
pipeline's naive join to the PIT join, and (b) regression-guard a
built training set (join the audit back on (entity, label_ts): every
``pit_value`` must equal the training-set column).

Spark-first shape — the same single-shuffle union+window formulation
as the PIT join itself (operators/training_set.py): label and feature
rows union on (entity, ts); ONE window partition, sorted once, serves
all four outputs:

- ``pit_value``   — ``last(feature_value, ignorenulls)`` over
  rowsBetween(unboundedPreceding, currentRow); features sort before
  labels at equal ts (ties include, the PIT convention);
- ``naive_value`` — the same ``last`` over the UNBOUNDED frame (what
  a time-unaware latest-per-entity join serves);
- ``n_future``    — total features per entity minus the running count;
- ``leaked``      — null-safe inequality of the two values.

One shuffle + one sort for the whole audit, independent of frame
sizes; no inequality join, no cartesian anything.

Exactness: values are carried, never computed on — the only derived
columns are integer counts and a boolean — so the audit
hash-compares cross-engine whatever the value type. Duplicate
(entity, ts) FEATURE rows resolve max-value-wins, folded INTO the
window sort (``ts, is_label, value NULLS FIRST`` — the max value
sorts last, so ``last(value, ignorenulls)`` picks it) rather than a
pre-aggregation: a deterministic, order-free tiebreak both engines
share that costs zero extra shuffles (the PIT join proper uses the
ingestion order column instead — the audit must not depend on
partition layout to stay hash-reproducible). ``n_future`` counts raw
future feature ROWS (exposure), duplicates included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pit_leakage_audit", "freshness_report"]


def pit_leakage_audit(
    labels: DataFrame,
    features: DataFrame,
    label_entity_col: str = "entity",
    label_ts_col: str = "ts",
    feature_entity_col: str = "entity",
    feature_value_col: str = "value",
    feature_ts_col: str = "ts",
) -> DataFrame:
    """(entity, label_ts, pit_value, naive_value, leaked, n_future)
    for every label row.

    ``leaked = 1`` iff the naive latest-overall value differs
    (null-safely) from the as-of value — i.e. a time-unaware join
    would have trained this row on the future. ``n_future`` counts
    the feature rows written after the label (at strictly greater ts;
    equal-ts features are visible to the label per the PIT ties
    convention), giving leak EXPOSURE even where the latest value
    happens to coincide."""
    feat = features.select(
        F.col(feature_entity_col).alias("entity"),
        F.col(feature_ts_col).cast("timestamp").alias("ts"),
        F.col(feature_value_col).alias("_fval"),
        F.lit(0).alias("_is_label"),
        F.lit(None).cast("timestamp").alias("_lts"),
    )
    lab = labels.select(
        F.col(label_entity_col).alias("entity"),
        F.col(label_ts_col).cast("timestamp").alias("ts"),
        F.lit(None).cast(feat.schema["_fval"].dataType).alias("_fval"),
        F.lit(1).alias("_is_label"),
        F.col(label_ts_col).cast("timestamp").alias("_lts"),
    )
    un = feat.unionByName(lab)

    # one partition spec, sorted once: features before labels at equal
    # ts so the as-of frame includes them (ties-include convention);
    # value NULLS FIRST so equal-ts duplicate features resolve
    # max-wins via last() — Spark's ASC default, but DuckDB's is
    # NULLS LAST, so the oracle spells it explicitly
    order = [
        F.col("ts").asc(),
        F.col("_is_label").asc(),
        F.col("_fval").asc_nulls_first(),
    ]
    w_past = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    audited = un.select(
        "entity",
        F.col("_lts").alias("label_ts"),
        F.col("_is_label"),
        F.last("_fval", ignorenulls=True).over(w_past).alias("pit_value"),
        F.last("_fval", ignorenulls=True).over(w_all).alias("naive_value"),
        (
            F.sum(F.lit(1) - F.col("_is_label")).over(w_all)
            - F.sum(F.lit(1) - F.col("_is_label")).over(w_past)
        ).cast("long").alias("n_future"),
    )
    return audited.filter(F.col("_is_label") == 1).select(
        "entity",
        "label_ts",
        "pit_value",
        "naive_value",
        (~F.col("naive_value").eqNullSafe(F.col("pit_value")))
        .cast("int")
        .alias("leaked"),
        "n_future",
    )


def freshness_report(
    training_set: DataFrame,
    feature_names: list[str],
    label_ts_col: str = "label_ts",
) -> DataFrame:
    """(feature, n_rows, n_missing, min/max/sum_staleness_us) — how
    STALE each feature was at every label event in a
    provenance-enabled training set (``point_in_time_join(...,
    provenance=True)`` emits the ``<name>__ts`` source-timestamp
    columns this reads).

    Staleness is ``label_ts - <name>__ts`` in exact integer
    MICROSECONDS (no float division — min/max/sum hash-compare
    cross-engine); ``n_missing`` counts label rows the feature had
    never matched (its provenance NULL). A feature whose p99
    staleness exceeds its upstream refresh cadence is being served
    stale; one whose staleness is NEGATIVE would be a leak (the PIT
    join makes that impossible by construction — asserting
    min >= 0 here is the cheap regression guard).

    Scale: one unpivot + ONE partial-agg groupBy at feature
    cardinality, same shape as the drift monitors."""
    if not feature_names:
        raise ValueError("freshness_report: no feature names")
    lab_us = F.unix_micros(F.col(label_ts_col).cast("timestamp"))
    parts = [
        training_set.select(
            F.lit(n).alias("feature"),
            # never-matched = provenance NULL specifically; a NULL
            # label_ts (no-ts label) with a matched feature is NOT
            # missing — its staleness is merely undefined and stays
            # out of min/max/sum
            F.col(f"{n}__ts").isNull().cast("long").alias("_miss"),
            (lab_us - F.unix_micros(F.col(f"{n}__ts"))).alias("_stale"),
        )
        for n in feature_names
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_miss").alias("n_missing"),
        F.min("_stale").alias("min_staleness_us"),
        F.max("_stale").alias("max_staleness_us"),
        F.sum("_stale").alias("sum_staleness_us"),
    )
