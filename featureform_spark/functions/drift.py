"""Feature drift monitoring: training/serving skew detection.

A feature platform's silent killer is a feature whose LIVE
distribution walks away from the distribution it was trained on
(upstream schema change, seasonality, a broken join). The standard
monitor is a binned-distribution comparison per feature — Population
Stability Index (PSI) / KL — between a REFERENCE frame (the training
snapshot) and a CURRENT frame (recent serving traffic).

Reference parity note: featureform's dashboard surfaces metadata, not
distribution monitoring; this is a beyond-reference operator in the
feature-serving family (SURVEY §2.9 adjacent).

Spark-first shape, 100 TB honest:

- Bin edges are FIXED-WIDTH over the reference's exact [min, max] —
  one cheap agg on the reference; bin index is a pure codegen
  expression ``clamp(floor((x - min) / width), 0, bins-1)`` so the
  histogram pass is scan + one partial-agg groupBy per frame. (Exact
  quantile edges would need a full sort per feature; approxQuantile is
  nondeterministic across engines — fixed-width keeps the whole
  monitor hash-reproducible, and PSI over fixed-width bins is the
  standard scorecard variant.)
- ``histogram_compare`` returns integer bin counts for BOTH frames —
  +,*-free and therefore bit-exact cross-engine (the driver-row
  surface). Out-of-range current values clamp into the edge bins
  (drift OUTWARD must be counted, not dropped); NULLs get their own
  bin (-1) — a feature going null IS drift.
- ``psi`` folds the counts into the scalar score driver-side (ln is
  libm — the BM25/quality_model convention: transcendentals stay out
  of hash-compared plans; the score is pytest-pinned instead).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["histogram_compare", "psi", "drift_report"]


def _bin_expr(col, mn: float, width: float, bins: int):
    idx = F.floor((col.cast("double") - F.lit(mn)) / F.lit(width))
    bounded = F.least(
        F.greatest(idx, F.lit(0)), F.lit(bins - 1)
    ).cast("long")
    return F.when(col.isNull(), F.lit(-1)).otherwise(bounded)


def histogram_compare(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    bins: int = 10,
) -> DataFrame:
    """(feature, bin, ref_count, cur_count) for every feature column —
    bin -1 is the NULL bin; bins 0..bins-1 are fixed-width over the
    reference's [min, max] with out-of-range current values clamped
    into the edge bins.

    One agg on the reference for all edges (2·|cols| numbers), then
    ONE groupBy per frame covering all features (unpivot first, so
    adding features adds no jobs). Counts are exact integers —
    hash-reproducible cross-engine."""
    if not cols:
        raise ValueError("histogram_compare: no feature columns")
    if bins < 2:
        raise ValueError("histogram_compare: bins must be >= 2")
    stats = ref.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    edges: dict[str, tuple[float, float]] = {}
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None:
            raise ValueError(
                f"histogram_compare: reference column {c!r} is all-NULL"
            )
        width = (mx - mn) / bins if mx > mn else 1.0
        edges[c] = (float(mn), float(width))

    def _hist(df: DataFrame, alias: str) -> DataFrame:
        # unpivot to (feature, bin) then ONE groupBy for all features
        parts = [
            df.select(
                F.lit(c).alias("feature"),
                _bin_expr(F.col(c), edges[c][0], edges[c][1], bins).alias(
                    "bin"
                ),
            )
            for c in cols
        ]
        un = parts[0]
        for p in parts[1:]:
            un = un.unionByName(p)
        return un.groupBy("feature", "bin").agg(
            F.count(F.lit(1)).alias(alias)
        )

    out = _hist(ref, "ref_count").join(
        _hist(cur, "cur_count"), ["feature", "bin"], "full_outer"
    )
    return out.select(
        "feature",
        "bin",
        F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
        F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
    )


def psi(
    counts: list[tuple[int, int]], epsilon: float = 1e-4
) -> float:
    """Population Stability Index over (ref_count, cur_count) bins:
    ``Σ (p_i - q_i) · ln(p_i / q_i)`` with zero-count bins floored at
    ``epsilon`` (the standard smoothing — an empty bin must not yield
    an infinite score). Driver-side libm ln, pytest-pinned (never in a
    hash-compared plan). Rule of thumb: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 act."""
    ref_total = sum(r for r, _ in counts)
    cur_total = sum(c for _, c in counts)
    if ref_total == 0 or cur_total == 0:
        raise ValueError("psi: empty frame")
    score = 0.0
    for r, c in counts:
        p = max(r / ref_total, epsilon)
        q = max(c / cur_total, epsilon)
        score += (p - q) * math.log(p / q)
    return score


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    bins: int = 10,
) -> dict[str, float]:
    """Per-feature PSI — ONE aggregation-scale collect of the bin
    counts (|cols|·(bins+1) rows), then driver-side folds."""
    rows = histogram_compare(ref, cur, cols, bins).collect()
    by_feature: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_feature.setdefault(r["feature"], []).append(
            (int(r["ref_count"]), int(r["cur_count"]))
        )
    return {f: psi(c) for f, c in sorted(by_feature.items())}
