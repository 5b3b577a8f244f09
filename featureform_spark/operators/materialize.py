"""Materialization: latest-value-per-entity snapshot of a feature.

Reference semantics (provider/queries/materialize_ts.sql:1-9,
materialize_no_ts.sql:1-33, offline_test.go:281-410 truth tables):

- latest row per entity by timestamp; missing timestamp defaults to
  epoch 0;
- duplicate (entity, ts) rows → last *written* wins, so an explicit
  ingestion order must break ties (Spark has no insertion order — callers
  pass ``order_col``, or we derive one);
- output table is (entity, value, ts) plus an optional dense ``row_number``
  used by the reference for chunked offline→online copy.

Spark-first design: the reference computes this with
``ROW_NUMBER() OVER (PARTITION BY entity ORDER BY ts DESC)`` — a full
shuffle of every row plus a reduce-side sort that keeps every input
row alive until the rank filter. We instead aggregate
``max(struct(ts, ord, value))`` per entity: lexicographic struct max
is exactly "latest ts, then latest write". The struct agg buffer is
not UnsafeRow-mutable, so Catalyst compiles this to SortAggregate
(map-side sort by entity + partial aggregate, then an exchange of one
pre-combined row per (task, entity), then a small reduce-side sort) —
but unlike the window it still COMBINES map-side, so only combined
rows cross the wire, and the reduce side aggregates instead of
materializing every row. A flat-buffer rewrite (one raw hash
repartition + three chained HashAggregates over (e,ts,ord)→(e,ts)→(e))
was implemented and A/B-measured in round 12 at sf0.1 AND at 100×
volume (10M events): the sort-based shape won both (x100 min-of-3:
0.98-1.12 s vs 1.58-1.73 s) — Spark's radix sort over narrow
UnsafeRows beats three extra hash passes and a raw-row shuffle. Keep
the struct form.

The reference's global ``row_number() OVER (ORDER BY entity)`` chunk
addressing (provider/sql.go:1832) is a single-partition window — a
scalability trap called out in SURVEY §4. ``with_row_index`` instead
computes per-partition counts in one cheap pass and offsets each
partition (zipWithIndex-style) entirely in the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EPOCH0 = "1970-01-01 00:00:00"


def _ord_or_warn(order_col: str | None, ts_col: str | None, what: str) -> Column:
    """Explicit ingestion index, or the partition-layout fallback WITH a
    warning — ids from monotonically_increasing_id follow partition
    layout, so 'latest' (no ts) / equal-ts ties (with ts) can resolve
    differently across retries and repartitions."""
    if order_col is not None:
        return F.col(order_col).cast("long")
    import warnings

    warnings.warn(
        f"{what}: no order_col given; "
        + (
            "'latest' follows partition layout"
            if ts_col is None
            else "equal-timestamp ties resolve by partition layout"
        )
        + " (monotonically_increasing_id) and may differ across retries "
        "— pass order_col for deterministic results",
        stacklevel=3,
    )
    return F.monotonically_increasing_id()


def _ts_or_epoch(df: DataFrame, ts_col: str | None) -> Column:
    if ts_col is None:
        return F.lit(EPOCH0).cast("timestamp")
    return F.coalesce(F.col(ts_col).cast("timestamp"), F.lit(EPOCH0).cast("timestamp"))


def materialize_latest(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    ts_col: str | None = None,
    order_col: str | None = None,
    out_entity: str = "entity",
    out_value: str = "value",
    out_ts: str = "ts",
) -> DataFrame:
    """Latest value per entity (A1/A2), last-write-wins on ties.

    ``order_col``: explicit ingestion index used to break equal-timestamp
    ties (and to define "latest" when ``ts_col`` is None). When absent we
    fall back to ``monotonically_increasing_id()``, which reproduces
    file/partition order for freshly-read data — the same "implicit
    ordering" contract the reference leans on (materialize_no_ts.sql:3).
    """
    ord_expr = _ord_or_warn(order_col, ts_col, "materialize_latest")
    packed = df.select(
        F.col(entity_col).alias(out_entity),
        F.struct(
            _ts_or_epoch(df, ts_col).alias("ts"),
            ord_expr.alias("ord"),
            F.col(value_col).alias("value"),
        ).alias("_m"),
    )
    latest = packed.groupBy(out_entity).agg(F.max("_m").alias("_m"))
    return latest.select(
        out_entity,
        F.col("_m.value").alias(out_value),
        F.col("_m.ts").alias(out_ts),
    )


def wide_materialize(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    feature_key_col: str,
    keys: list,
    ts_col: str | None = None,
    order_col: str | None = None,
    out_entity: str = "entity",
    prefix: str = "f_",
) -> DataFrame:
    """Latest-per-entity for N features keyed by a column, in ONE pass.

    The wide-feature-table shape (reference benchmark: hundreds of
    features over one source): instead of N materializations unioned or
    joined, one scan + one shuffle with N filtered ``max(struct)``
    aggregates — feature count changes the projection width, not the
    number of jobs. Output: (entity, <prefix><key>...).
    """
    ord_expr = _ord_or_warn(order_col, ts_col, "wide_materialize")
    packed = F.struct(
        _ts_or_epoch(df, ts_col).alias("ts"),
        ord_expr.alias("ord"),
        F.col(value_col).alias("value"),
    )
    # project the (possibly non-deterministic) packed struct BEFORE the
    # aggregation — Spark rejects monotonically_increasing_id inside
    # aggregate expressions
    projected = df.filter(F.col(feature_key_col).isin(keys)).select(
        F.col(entity_col).alias(out_entity),
        F.col(feature_key_col).alias("_fk"),
        packed.alias("_p"),
    )
    aggs = [
        F.max(F.when(F.col("_fk") == k, F.col("_p"))).getField("value").alias(f"{prefix}{k}")
        for k in keys
    ]
    return projected.groupBy(out_entity).agg(*aggs)


def _range_partition_count(df: DataFrame) -> int:
    """Partition count for an explicit (non-AQE-coalescible) range
    shuffle: the optimizer's plan-time size estimate divided by the
    AQE advisory partition size, clamped to [1, shuffle.partitions].
    Plan-time and deterministic, so every consumer of the exchange
    computes the same number; falls back to the session conf when the
    estimate is unavailable or the default 8-EiB unknown-stats value."""
    spark = df.sparkSession
    try:
        n_conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_conf = spark.sparkContext.defaultParallelism
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = raw if isinstance(raw, int) else int(raw.toString())
        advisory = spark._jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
            )
        )
        if 0 <= size < (1 << 50) and advisory > 0:
            return max(1, min(n_conf, -(-size // advisory)))
    except Exception:
        pass
    return n_conf


def with_row_index(
    df: DataFrame,
    order_cols: list[str] | None = None,
    index_col: str = "row_number",
    start: int = 1,
) -> DataFrame:
    """Attach a dense global row index without a single-partition window.

    If ``order_cols`` is given the index follows that global ordering via a
    range repartition (sort happens *within* partitions only; offsets come
    from per-partition counts — two narrow passes instead of one giant
    window). Without ``order_cols`` the index follows current partition
    order (cheapest; suitable for chunk addressing where any stable order
    works).

    The local position comes from ``monotonically_increasing_id`` —
    consecutive within a partition by construction — relative to the
    partition's min id, so no ``Window.partitionBy(partition_id)`` is
    needed: that window forced a SECOND full-data hash exchange + sort
    right after the range shuffle. The per-partition (count, min_id)
    aggregate is the only extra consumer, and its exchange subtree is
    identical to the main branch's, so the range shuffle executes once
    (ReusedExchange) instead of twice.
    """
    if order_cols:
        # the partition count is passed EXPLICITLY: a REPARTITION_BY_NUM
        # shuffle is exempt from AQE partition coalescing, so the main
        # branch and the stats branch below are guaranteed to read the
        # (reused) range exchange with IDENTICAL partition ids. With the
        # implicit count, AQE may coalesce one consumer's read and not
        # the other's (the broadcast subtree is re-optimized separately),
        # and the _pid equi-join then silently drops rows. Since the
        # explicit count disables coalescing, size it like AQE would:
        # plan-time size estimate / advisory partition size, capped by
        # the session shuffle-partition count (scale-adaptive, not a
        # constant — at 100 TB the cap is the six-figure conf value).
        df = df.repartitionByRange(
            _range_partition_count(df), *[F.col(c) for c in order_cols]
        ).sortWithinPartitions(*order_cols)
    # _mono is projected ABOVE the within-partition sort (nondeterministic
    # expressions are not reordered across sorts), so ids follow the
    # sorted order; _mono - min(_mono) is the 0-based local position.
    with_local = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mono", F.monotonically_increasing_id()
    )
    # per-partition stats are tiny (one row per partition) → broadcast join
    counts = with_local.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.min("_mono").alias("_mlo")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_mlo", "_offset")
    return (
        with_local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            index_col,
            F.col("_mono") - F.col("_mlo") + F.col("_offset") + F.lit(start),
        )
        .drop("_pid", "_mono", "_mlo", "_offset")
    )


def iterate_segment(df: DataFrame, start: int, end: int, index_col: str = "row_number") -> DataFrame:
    """Rows with ``start < row_number <= end`` (provider/sql.go:1939-1942).

    Chunk unit in the reference is 100k rows (offline.go:46).
    """
    return df.filter((F.col(index_col) > start) & (F.col(index_col) <= end))
