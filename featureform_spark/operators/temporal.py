"""Temporal shaping operators: SCD Type 2 intervals and time-grid
gap-filling.

Both are the standard companions to the engine's PIT/as-of join family
(``operators/asof.py``, ``operators/training_set.py``): SCD2 turns a
change stream into validity intervals (the dimension shape warehouses
join against, and the lossless input to a point-in-time lookup), and
gap-fill regularizes an irregular event series onto a fixed time grid
(the shape windowed feature pipelines and forecasting models consume).

Scale shape — each operator is exactly ONE hash shuffle on the entity
key:

* ``scd2``: one window (partitionBy key, orderBy ts) computes the
  change-compression lag and the closing lead — no self-join, no
  second pass. Skewed entities are bounded by per-entity history
  length, not corpus size.
* ``gap_fill``: per-entity bucket aggregation, then ``sequence()``
  explodes each entity's OWN [min, max] grid executor-side (never a
  driver-side calendar), then one more window for LOCF. The grid never
  materializes beyond the entity's true span, so a 100 TB corpus with
  short per-entity histories stays linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 from a change stream: one row
    per (key, attribute-state) RUN with ``valid_from`` / ``valid_to``
    / ``is_current``. Consecutive rows whose tracked attributes are
    unchanged compress into one interval (the warehouse-standard
    change compression); ``valid_to`` is the next change's timestamp
    (half-open intervals, NULL on the current row).

    ``tiebreak_cols`` breaks same-timestamp ordering deterministically
    (defaults to the attr columns themselves) — same-ts duplicates
    otherwise make the interval chain nondeterministic."""
    order = [F.col(ts_col)] + [
        F.col(c) for c in (tiebreak_cols or attr_cols)
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        F.lag(state).over(w).isNull()
        | (F.lag(state).over(w) != state)
    )
    marked = df.select(
        *key_cols, ts_col, *attr_cols, changed.alias("_chg")
    ).where(F.col("_chg"))
    # second window over the compressed rows closes each interval with
    # the NEXT change's start (same partitioning: Spark reuses the
    # exchange, so this is still one shuffle)
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or attr_cols)]
    )
    return (
        marked.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_chg", *([ts_col] if ts_col != "valid_from" else []))
    )


def gap_fill(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    how: str = "locf",
    agg: str = "sum",
) -> DataFrame:
    """Regularize an event series onto a fixed time grid per entity:
    bucket events to ``step``, aggregate ``value_col`` with ``agg``
    within each bucket, then emit EVERY bucket in the entity's
    [first, last] span, filling empty ones by ``how``:

    * ``"locf"`` — last observation carried forward (state series);
    * ``"zero"`` — 0.0 (count/sum series);
    * ``"null"`` — leave the gap explicit;
    * ``"linear"`` — interpolate between the surrounding observations
      (sensor series); edge gaps (before the first / after the last
      observation) have only one neighbor and stay NULL.

    Returns (entity, bucket_start, value, is_filled). The grid is
    generated executor-side with ``sequence()`` — no driver calendar,
    no cross-entity blowup. Fill modes that need a per-entity window
    anyway (``locf``/``linear``) generate it (r13) MAP-SIDE from each
    observed bucket to its successor (``lead``), so grid rows never
    cross an exchange: the r12 shape joined a separately-aggregated
    span grid back to the buckets ((entity,bucket) exchange on the
    grid side — an SMJ at scale — plus a fourth exchange for the fill
    window). Now ONE bucket-level aggregation and ONE entity window
    carry everything; fill state (LOCF carry, linear neighbors) is
    computed on the bucket rows BEFORE the explode, and every
    per-grid-point value is a pure projection of it — two data
    exchanges total at any scale, no join, one scan (interleaved
    min-of-5 ×3 at sf0.1: 1.15/1.15/1.21 → 0.76/0.80/0.90 s).
    ``zero``/``null`` modes keep the span-grid + left-join shape: they
    need no fill window, and the window+sort the map-side grid would
    add costs more than the (broadcast at bench scale) join it saves —
    measured 0.35-0.38 → 0.65-0.70 s; kept per the benched-scale
    rule."""
    if how not in ("locf", "zero", "null", "linear"):
        raise ValueError(f"unknown fill mode {how!r}")
    bucket = _step_bucket(step, F.col(ts_col)).alias("bucket_start")
    per_bucket = (
        df.select(F.col(entity_col).alias("entity"), bucket,
                  F.col(value_col).alias("v"))
        .groupBy("entity", "bucket_start")
        .agg(getattr(F, agg)("v").alias("value"))
    )
    if how in ("zero", "null"):
        return _gap_fill_join_grid(per_bucket, step, how)
    w = Window.partitionBy("entity").orderBy("bucket_start")
    wcur = w.rowsBetween(Window.unboundedPreceding, 0)
    nxt_bucket = F.lead("bucket_start").over(w)
    state_cols: list = []
    if how == "locf":
        # last non-null observation at-or-before this bucket; every
        # grid point emitted from this bucket (up to the next observed
        # one) carries exactly that value — identical to LOCF over the
        # joined grid, where non-null values exist only at observed
        # buckets
        state_cols.append(
            F.last("value", ignorenulls=True).over(wcur).alias("_locf")
        )
    elif how == "linear":
        obs = F.when(
            F.col("value").isNotNull(),
            F.struct(
                F.col("bucket_start").cast("double").alias("t"),
                F.col("value").cast("double").alias("v"),
            ),
        )
        # neighbors on the OBSERVED rows: prev includes this bucket
        # (its own null value is ignored), next strictly follows it —
        # the same pairs the per-grid-point windows resolved, since
        # observations exist only at bucket rows
        state_cols.append(
            F.last(obs, ignorenulls=True).over(wcur).alias("_prev")
        )
        state_cols.append(
            F.first(obs, ignorenulls=True)
            .over(w.rowsBetween(1, Window.unboundedFollowing))
            .alias("_nxt")
        )
    # window expressions cannot live inside the Generate — stage them
    # (one Window node, one exchange), then explode in a second select
    marked = per_bucket.select(
        "entity",
        "bucket_start",
        "value",
        *state_cols,
        nxt_bucket.alias("_nxt_b"),
    )
    stride_s = _step_seconds(step)
    if stride_s is not None:
        # fixed-length strides walk the grid in EPOCH-LONG space:
        # Spark's sequence() over timestamps steps in session-local
        # wall-clock (a "+86400 SECOND" step becomes 23 physical hours
        # across a DST spring-forward), which would walk off the
        # epoch-floor buckets in any DST session timezone. A long
        # sequence has no timezone to consult — and is cheaper.
        staged = marked.select(
            "*",
            F.explode(
                F.sequence(
                    F.col("bucket_start").cast("long"),
                    F.coalesce(
                        F.col("_nxt_b").cast("long") - F.lit(stride_s),
                        F.col("bucket_start").cast("long"),
                    ),
                    F.lit(stride_s),
                )
            ).alias("_b"),
        ).withColumn("_g", F.timestamp_seconds("_b"))
    else:
        # calendar strides (1 week / 1 month) keep the calendar walk —
        # variable-length by definition, matching date_trunc buckets;
        # stepping back one stride from the next observed bucket stays
        # on the truncation lattice, so the per-row sequences tile the
        # entity's span exactly once
        staged = marked.select(
            "*",
            F.explode(
                F.sequence(
                    F.col("bucket_start"),
                    F.coalesce(
                        F.col("_nxt_b") - F.expr(f"INTERVAL {step}"),
                        F.col("bucket_start"),
                    ),
                    F.expr(f"INTERVAL {step}"),
                )
            ).alias("_g"),
        )
    raw = F.when(F.col("_g") == F.col("bucket_start"), F.col("value"))
    is_filled = raw.isNull()
    if how == "locf":
        val = F.col("_locf")
    else:  # "linear"
        t = F.col("_g").cast("double")
        prev, nxt = F.col("_prev"), F.col("_nxt")
        interp = prev["v"] + (nxt["v"] - prev["v"]) * (
            (t - prev["t"]) / (nxt["t"] - prev["t"])
        )
        val = F.when(raw.isNotNull(), raw.cast("double")).when(
            prev.isNotNull() & nxt.isNotNull(), interp
        )
    return staged.select(
        "entity",
        F.col("_g").alias("bucket_start"),
        val.alias("value"),
        is_filled.alias("is_filled"),
    )


def _gap_fill_join_grid(per_bucket: DataFrame, step: str, how: str) -> DataFrame:
    """Span-grid + left-join gap fill for the window-free modes
    (``zero``/``null``): grid = sequence over each entity's [min, max]
    bucket span, left-joined back to the observed buckets. See
    :func:`gap_fill` for why the map-side-grid formulation is not used
    here."""
    spans = per_bucket.groupBy("entity").agg(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    stride_s = _step_seconds(step)
    if stride_s is not None:
        # epoch-long walk: DST-proof and cheaper (see gap_fill)
        grid = spans.select(
            "entity",
            F.explode(
                F.sequence(
                    F.col("lo").cast("long"),
                    F.col("hi").cast("long"),
                    F.lit(stride_s),
                )
            ).alias("_b"),
        ).select(
            "entity", F.timestamp_seconds("_b").alias("bucket_start")
        )
    else:
        grid = spans.select(
            "entity",
            F.explode(
                F.sequence(
                    F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {step}")
                )
            ).alias("bucket_start"),
        )
    joined = grid.join(per_bucket, ["entity", "bucket_start"], "left")
    out = joined.withColumn("is_filled", F.col("value").isNull())
    if how == "zero":
        out = out.withColumn("value", F.coalesce("value", F.lit(0.0)))
    return out.select("entity", "bucket_start", "value", "is_filled")


_STEP_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _step_bucket(step: str, col):
    """Bucket expression for a gap_fill stride.

    EVERY fixed-length stride ("1 hour", "24 hour", "15 minute",
    "2 day", "90 second") buckets by the same UTC epoch floor:
    ``floor(unix_ts / stride_s) * stride_s`` — every bucket start is
    an exact multiple of the stride from 1970-01-01 UTC, so the
    sequence() grid hits exactly the buckets the aggregation filled,
    and nominally-equal strides ("1 day" vs "24 hour") always produce
    the SAME grid regardless of the session timezone. (date_trunc
    would align "1 day" to session-timezone calendar midnight and
    even "1 hour" to :30-UTC boundaries in half-hour zones — a grid
    that silently shifts with ``spark.sql.session.timeZone``.)

    Only the calendar-variable strides "1 week" / "1 month" keep
    ``date_trunc`` (weeks start Monday, months on the 1st, month
    lengths vary — no fixed-second floor expresses them); these two
    ARE session-timezone-aligned by definition. Multi-unit strides
    ("1 hour 30 minutes") and "N month"/"N week" for N > 1 are
    refused loudly."""
    parts = step.strip().split()
    if len(parts) == 2:
        n_str, unit = parts
        unit = unit.lower().rstrip("s")
        n = int(n_str) if n_str.isdigit() else 0
        if n == 1 and unit in ("week", "month"):
            return F.date_trunc(unit, col)
        if n >= 1 and unit in ("second", "minute", "hour", "day"):
            s = n * _STEP_SECONDS[unit]
            return F.timestamp_seconds(
                F.floor(F.unix_timestamp(col) / F.lit(s)).cast("long")
                * F.lit(s)
            )
    raise ValueError(
        f"unsupported gap_fill step {step!r} — use '1 week', "
        "'1 month', or 'N second/minute/hour/day'"
    )


def _step_seconds(step: str) -> int | None:
    """Stride length in exact seconds, or None for the two
    calendar-variable strides (1 week / 1 month) that have no fixed
    length. Matches :func:`_step_bucket`'s validation."""
    n_str, unit = step.strip().split()
    unit = unit.lower().rstrip("s")
    if unit in ("week", "month"):
        return None
    return int(n_str) * _STEP_SECONDS[unit]


def funnel(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Ordered funnel analysis: for each entity, the first time it
    completed step 1, then the first step-2 event STRICTLY AFTER that,
    and so on — the product-analytics staple (signup → activate →
    purchase). Returns one row per entity with ``step_<i>_ts`` for
    every step (NULL once the chain breaks), ``steps_completed``, and
    ``converted`` (made it through all steps).

    ONE shuffle: events group per entity with their (ts, type) structs
    sorted in-array, and a single ``aggregate`` fold walks them in
    time order filling the step-timestamp vector — no per-step
    self-joins, so a 10-step funnel costs the same shuffle as a
    2-step one. Per-entity history must fit an array (true for
    user-event workloads; pre-filter to the funnel's event types —
    done here — to keep it small).

    ``within`` (an INTERVAL string, e.g. ``"7 days"``) bounds the
    whole chain: steps past the first only count inside
    ``step_1_ts + within`` — the standard conversion-window variant.
    NOTE: with a window, an entity's EARLIEST step-1 event anchors the
    chain (no backtracking to a later, better-positioned step-1 —
    same greedy semantics most funnel engines ship)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    k = len(steps)
    tb = tiebreak_col or ts_col
    evs = (
        df.where(F.col(type_col).isin(steps))
        .groupBy(F.col(entity_col).alias("entity"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(tb).alias("tb"),
                        F.col(type_col).alias("tp"),
                    )
                )
            ).alias("evs")
        )
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.array(
        *[F.lit(None).cast("timestamp") for _ in range(k)]
    )

    def _fold(acc, ev):
        # fill the FIRST unset step whose type matches and whose
        # predecessor is already set strictly earlier
        in_window = (
            F.lit(True)
            if within is None
            else ev["ts"]
            <= F.element_at(acc, 1) + F.expr(f"INTERVAL {within}")
        )
        return F.transform(
            acc,
            lambda t, i: F.when(t.isNotNull(), t).when(
                (ev["tp"] == F.element_at(steps_arr, i + 1))
                & (
                    (i == 0)
                    | (
                        F.element_at(acc, i).isNotNull()
                        & (ev["ts"] > F.element_at(acc, i))
                        & in_window
                    )
                )
                # only the first unset slot may fill on this event:
                # a type can appear once in `steps`, so i is unique
                ,
                ev["ts"],
            ),
        )

    folded = evs.select(
        "entity", F.aggregate(F.col("evs"), init, _fold).alias("t")
    )
    cols = [
        F.element_at("t", i + 1).alias(f"step_{i + 1}_ts")
        for i in range(k)
    ]
    out = folded.select("entity", *cols)
    completed = F.size(
        F.filter(
            F.array(*[F.col(f"step_{i + 1}_ts") for i in range(k)]),
            lambda x: x.isNotNull(),
        )
    )
    return out.withColumn(
        "steps_completed", completed.cast("int")
    ).withColumn("converted", F.col(f"step_{k}_ts").isNotNull())


def horizon_label(
    anchors: DataFrame,
    outcomes: DataFrame,
    horizon_seconds: int,
    anchor_entity_col: str = "entity",
    anchor_ts_col: str = "ts",
    outcome_entity_col: str = "entity",
    outcome_ts_col: str = "ts",
    out_count: str = "n_outcomes",
    out_label: str = "label",
) -> DataFrame:
    """Label maturation: for every anchor row, did (and how often did)
    an outcome event occur within ``(t, t + horizon]``? The standard
    churn/conversion label builder — "purchased within the hour after
    the click", "churned within 30 days of signup" — i.e. the LABEL
    side of the training sets the PIT join assembles (the reference
    leaves label construction to user SQL; this is the missing
    first-class builder).

    Returns every anchor row plus ``n_outcomes`` (exact count in the
    window) and ``label`` (1 iff any). The window is half-open
    ``(t, t+H]``: an outcome AT the anchor instant is not caused by
    it, one exactly at the horizon still counts.

    Spark-first shape: anchors and outcomes union on the entity key
    and ONE window with a VALUE-based frame does everything —
    ``partitionBy(entity).orderBy(unix_micros(ts)).rangeBetween(1,
    H·10⁶)`` counting outcome rows. One shuffle + one sort however
    many anchors and outcomes; no inequality join, no per-anchor
    probe, and range frames are tie-exact (rows at equal timestamps
    are in or out by VALUE, never by sort position — the formulation
    is deterministic cross-engine with no tiebreak column at all)."""
    if horizon_seconds <= 0:
        raise ValueError("horizon_label: horizon_seconds must be > 0")
    carry = [c for c in anchors.columns]
    anc = anchors.select(
        *carry,
        F.col(anchor_entity_col).alias("_ent"),
        F.unix_micros(F.col(anchor_ts_col).cast("timestamp")).alias("_us"),
        F.lit(0).alias("_is_outcome"),
    )
    out = outcomes.select(
        *[
            F.lit(None).cast(anchors.schema[c].dataType).alias(c)
            for c in carry
        ],
        F.col(outcome_entity_col).alias("_ent"),
        F.unix_micros(F.col(outcome_ts_col).cast("timestamp")).alias("_us"),
        F.lit(1).alias("_is_outcome"),
    )
    un = anc.unionByName(out)
    w = (
        Window.partitionBy("_ent")
        .orderBy(F.col("_us").asc())
        .rangeBetween(1, int(horizon_seconds) * 1_000_000)
    )
    counted = un.select(
        *carry,
        "_is_outcome",
        F.coalesce(F.sum("_is_outcome").over(w), F.lit(0))
        .cast("long")
        .alias(out_count),
    )
    return counted.filter(F.col("_is_outcome") == 0).select(
        *carry,
        out_count,
        (F.col(out_count) > 0).cast("int").alias(out_label),
    )
