"""Time-decayed aggregate features: half-life-weighted counts and sums.

The recsys/fraud staple — "purchases in the recent past, where recent
counts more" — computed as one groupBy per entity:

    decayed = Σ_events  value · 2^(−age/half_life)

Two variants:

* ``decayed_features`` (default, ``smooth=False``) quantizes age to
  whole half-life steps, making the weight an exact binary fraction
  ``SCALE >> k`` in FIXED POINT: counts become pure-integer sums and
  value sums DECIMAL·integer products — associative, order-free, and
  bit-reproducible on any engine (the repo's house rule for
  hash-matched oracles). Step-decay is what most production feature
  stores actually ship (daily decay buckets); the quantization error
  vs smooth decay is bounded by 2× within a step.
* ``smooth=True`` uses the exact ``exp`` weight per event — floats,
  order-dependent at the ulp level, pytest-verified rather than
  oracle-paired.

Scale: one partial-agg groupBy on the entity key (the weight is a
per-row expression, no window, no sort); the ``as_of`` anchor is a
literal so the whole weight computation stays in codegen.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECAY_SCALE_BITS = 40  # fixed-point denominator 2^40: exact longs


def decayed_features(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    as_of: Any,
    half_life_days: int = 7,
    smooth: bool = False,
    max_age_halflives: int = 39,
) -> DataFrame:
    """Per entity: ``decayed_count`` and ``decayed_sum`` of events at
    ``as_of`` (events after the anchor are excluded — the PIT rule).
    Ages quantize to whole half-lives (``smooth=False``); events older
    than ``max_age_halflives`` half-lives contribute 0 (their exact
    fixed-point weight underflows to zero anyway — documented cutoff,
    not a silent one)."""
    if half_life_days < 1:
        raise ValueError("half_life_days must be ≥ 1")
    if not 1 <= max_age_halflives <= DECAY_SCALE_BITS - 1:
        raise ValueError(
            f"max_age_halflives must be in [1, {DECAY_SCALE_BITS - 1}]"
        )
    anchor = F.lit(as_of).cast("timestamp")
    if smooth:
        # exact exponential decay on the true age — float path,
        # computed from the raw timestamps; the SAME age cutoff
        # applies (both modes must agree on which events are in scope)
        age_hl = (
            F.unix_timestamp(anchor) - F.unix_timestamp(F.col(ts_col))
        ).cast("double") / F.lit(float(half_life_days * 86400))
        aged_s = (
            df.where(F.col(ts_col) <= anchor)
            .select(
                F.col(entity_col).alias("entity"),
                F.col(value_col).cast("double").alias("_v"),
                F.pow(F.lit(2.0), -age_hl).alias("_w"),
                age_hl.alias("_a"),
            )
            .where(F.col("_a") <= float(max_age_halflives))
        )
        return aged_s.groupBy("entity").agg(
            F.sum("_w").alias("decayed_count"),
            F.sum(F.col("_v") * F.col("_w")).alias("decayed_sum"),
        )
    # decimal(18,6) values x decimal(18,0) weights -> decimal(37,6)
    # products: inside Spark's 38-digit cap, so the multiply is EXACT
    # (a 38,6x38,6 product would trigger precision-loss rounding)
    aged = df.where(F.col(ts_col) <= anchor).select(
        F.col(entity_col).alias("entity"),
        F.col(value_col).cast("decimal(18,6)").alias("_v"),
        (
            F.datediff(anchor.cast("date"), F.col(ts_col).cast("date"))
            / F.lit(half_life_days)
        )
        .cast("long")
        .alias("_k"),
    ).where(F.col("_k") <= max_age_halflives)
    # weight = SCALE >> k: an exact long; sums accumulate as DECIMAL so
    # a hot entity (billions of events x 2^40) can't wrap a long.
    # (expr form: the pyspark shiftright wrapper takes only a literal
    # bit count, the SQL function accepts a column)
    w = F.expr(
        f"shiftright(cast({1 << DECAY_SCALE_BITS} as bigint), "
        "cast(_k as int))"
    )
    out = aged.groupBy("entity").agg(
        F.sum(w.cast("decimal(18,0)")).alias("_wc"),
        F.sum(F.col("_v") * w.cast("decimal(18,0)")).alias("_ws"),
    )
    denom = float(1 << DECAY_SCALE_BITS)
    return out.select(
        "entity",
        (F.col("_wc").cast("double") / F.lit(denom)).alias(
            "decayed_count"
        ),
        (F.col("_ws").cast("double") / F.lit(denom)).alias("decayed_sum"),
    )
