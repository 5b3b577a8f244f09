"""Feature-engineering encoders: equi-depth binning, target encoding,
and a key-skew diagnostic.

The classic tabular-ML transforms a feature platform serves next to
scaling (operators/scaling.py). Cross-engine determinism rules used
throughout this repo apply: exact integer/decimal accumulation wherever
a sum crosses an unordered aggregation, doubles only in final per-row
expressions, cutpoints rounded to 6dp before use.

Scale shapes:
- binning: one exact-percentile aggregate (single reduce to cutpoints),
  then a broadcast of the tiny cutpoint array into a scan-side
  expression — the fact table never shuffles for assignment;
- target encoding: one partial-agg groupBy per category + a 1-row
  global prior, both broadcast back;
- skew report: one partial-agg count groupBy + TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame, value_col: str, fracs: list[float]
) -> DataFrame:
    """1-row DataFrame with ``cuts``: EXACT interpolated percentiles
    (quantile_cont semantics: v[floor(p)] + (v[ceil(p)] - v[floor(p)])
    * (p - floor(p)) at p = f*(N-1)), computed DISTRIBUTED.

    Spark's ``percentile`` aggregate merges a value->count map of every
    distinct value onto ONE reducer — a single-node sort of the whole
    fact column that stops scaling (and OOMs) long before 100 TB. Here
    the order statistics come from range-partitioned rank selection
    instead: range-repartition the bare value column, sort within
    partitions, attach global ranks from per-partition count offsets
    (with_row_index — no global window), then keep only the <=2*k rows
    whose rank is a floor/ceil target. Every stage is parallel; the
    final interpolation folds a <=2*k-entry map on one row. The row
    count N rides a broadcast 1-row aggregate, so the plan stays fully
    declarative (no driver-side count action)."""
    from featureform_spark.operators.materialize import with_row_index

    vals = df.select(F.col(value_col).cast("double").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    n_row = vals.agg(F.count(F.lit(1)).alias("_n"))
    indexed = with_row_index(vals, order_cols=["_v"], index_col="_idx").select(
        (F.col("_idx") - 1).alias("_i"), "_v"
    )

    def _p(f: float):
        return F.lit(float(f)) * (F.col("_n") - F.lit(1))

    want = None
    for f in fracs:
        hit = (F.col("_i") == F.floor(_p(f))) | (F.col("_i") == F.ceil(_p(f)))
        want = hit if want is None else (want | hit)
    picked = (
        indexed.join(F.broadcast(n_row))
        .filter(want)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_i"), F.col("_v")))
            ).alias("_m")
        )
        .join(F.broadcast(n_row))
    )

    def _interp(f: float):
        p = _p(f)
        lo = F.element_at(F.col("_m"), F.floor(p))
        hi = F.element_at(F.col("_m"), F.ceil(p))
        return F.round(lo + (hi - lo) * (p - F.floor(p)), 6)

    return picked.select(F.array(*[_interp(f) for f in fracs]).alias("cuts"))


def equi_depth_cutpoints(
    df: DataFrame, value_col: str, n_bins: int
) -> DataFrame:
    """1-row DataFrame with `cuts`: n_bins-1 interior cutpoints from the
    EXACT percentile (linear interpolation — matches DuckDB's
    quantile_cont bit-for-bit; verified in tests), rounded to 6dp so a
    value landing on a boundary bins identically in any engine.
    Computed via distributed rank selection (exact_percentiles), never
    a single-reducer percentile map."""
    return exact_percentiles(
        df, value_col, [i / n_bins for i in range(1, n_bins)]
    )


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 8,
    out_col: str = "bin",
) -> DataFrame:
    """Assign each row an equi-depth bin 1..n_bins.

    bin = 1 + #cutpoints strictly below the value; NULL values get a
    NULL bin. The cutpoint row is broadcast — assignment is a pure
    scan-side expression."""
    cuts = equi_depth_cutpoints(df, value_col, n_bins)
    v = F.col(value_col)
    return df.crossJoin(F.broadcast(cuts)).withColumn(
        out_col,
        F.when(
            v.isNotNull(),
            F.size(F.filter(F.col("cuts"), lambda c: v > c)) + F.lit(1),
        ),
    ).drop("cuts")


def target_encode(
    df: DataFrame,
    category_col: str,
    label_col: str,
    alpha: float = 10.0,
) -> DataFrame:
    """Smoothed target (mean-label) encoding per category:

        enc = (sum_label + prior_mean * alpha) / (n + alpha)

    — the additive-smoothing estimator that shrinks rare categories
    toward the global mean instead of memorizing them. Label sums
    accumulate as DECIMAL(38,6) (exact, order-independent) and convert
    to double only in the final per-category expression, so the output
    is bit-identical regardless of partitioning or engine.

    Output: (category_col, n, target_enc) — join it back to the fact
    table as a broadcast to encode rows."""
    dec = F.col(label_col).cast("decimal(38,6)")
    per_cat = df.groupBy(category_col).agg(
        F.sum(dec).alias("_s"), F.count(F.lit(1)).alias("n")
    )
    glob = df.agg(
        F.sum(dec).alias("_gs"), F.count(F.lit(1)).alias("_gn")
    )
    prior = F.col("_gs").cast("double") / F.col("_gn").cast("double")
    return per_cat.crossJoin(F.broadcast(glob)).select(
        category_col,
        "n",
        F.round(
            (F.col("_s").cast("double") + prior * F.lit(float(alpha)))
            / (F.col("n") + F.lit(float(alpha))),
            6,
        ).alias("target_enc"),
    )


def target_encode_oof(
    df: DataFrame,
    category_col: str,
    label_col: str,
    id_col: str,
    n_folds: int = 4,
    alpha: float = 10.0,
) -> DataFrame:
    """Out-of-fold target encoding — the leakage-protected form ML
    pipelines must use at training time (a row's own label leaking
    into its encoding overfits high-cardinality categoricals; the
    plain :func:`target_encode` is only safe for inference-time
    encoding of NEW data). Rows hash into ``n_folds`` folds
    (md5-deterministic, reproducible across runs/engines), and each
    row's encoding is the smoothed category mean computed from the
    OTHER folds only:

        enc = (S_cat − s_cat,fold + prior_oof · α)
              / (N_cat − n_cat,fold + α)

    with ``prior_oof`` the out-of-fold global mean.

    Scale shape: ONE pass aggregates (category, fold) partial sums
    (map-side combine; output is aggregation-scale, never row-scale),
    a category-total rollup and the fold-complement arithmetic happen
    on that tiny frame, and the per-fold encodings broadcast back onto
    the rows — the fact table shuffles zero times. Label sums stay
    DECIMAL until one final double expression (+round 6), so the
    encoding is bit-identical across engines and partitionings.

    Output: (id_col, category_col, fold, target_enc_oof)."""
    if n_folds < 2:
        raise ValueError("n_folds must be ≥ 2")
    dec = F.col(label_col).cast("decimal(38,6)")
    fold = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 2),
            16,
            10,
        ).cast("int")
        % n_folds
    ).alias("fold")
    rows = df.select(F.col(id_col), F.col(category_col), dec.alias("_l"), fold)
    cf = rows.groupBy(category_col, "fold").agg(
        F.sum("_l").alias("_fs"), F.count(F.lit(1)).alias("_fn")
    )
    cat_tot = cf.groupBy(category_col).agg(
        F.sum("_fs").alias("_cs"), F.sum("_fn").alias("_cn")
    )
    g = cf.groupBy("fold").agg(
        F.sum("_fs").alias("_gs"), F.sum("_fn").alias("_gn")
    )
    g_tot = cf.agg(F.sum("_fs").alias("_ts"), F.sum("_fn").alias("_tn"))
    # null-safe intermediate joins: groupBy made NULL categories (and
    # the NULL fold of NULL ids) their own groups, so equi-joins here
    # would drop exactly those groups before the row join ever runs
    ct2 = cat_tot.select(
        F.col(category_col).alias("_tcat"), "_cs", "_cn"
    )
    g2 = g.select(F.col("fold").alias("_tfold"), "_gs", "_gn")
    enc = (
        cf.join(
            ct2, F.col(category_col).eqNullSafe(F.col("_tcat"))
        )
        .join(g2, F.col("fold").eqNullSafe(F.col("_tfold")))
        .crossJoin(F.broadcast(g_tot))
        .select(
            category_col,
            "fold",
            F.round(
                (
                    (F.col("_cs") - F.col("_fs")).cast("double")
                    + (
                        (F.col("_ts") - F.col("_gs")).cast("double")
                        / (F.col("_tn") - F.col("_gn")).cast("double")
                    )
                    * F.lit(float(alpha))
                )
                / (
                    (F.col("_cn") - F.col("_fn")).cast("double")
                    + F.lit(float(alpha))
                ),
                6,
            ).alias("target_enc_oof"),
        )
    )
    # null-safe join: groupBy made NULL categories (and the NULL fold
    # of NULL ids) their own aggregation groups, so an equi-join here
    # would silently DROP those rows from the training output; <=>
    # keeps every input row and gives NULL keys their own encoding
    # level, matching the aggregation's semantics
    renc = F.broadcast(
        enc.select(
            F.col(category_col).alias("_ecat"),
            F.col("fold").alias("_efold"),
            "target_enc_oof",
        )
    )
    return rows.join(
        renc,
        rows[category_col].eqNullSafe(renc["_ecat"])
        & rows["fold"].eqNullSafe(renc["_efold"]),
    ).select(id_col, category_col, "fold", "target_enc_oof")


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Partition-design diagnostic: the top-k hottest keys with their
    share of all rows and the hot/average ratio — exactly the numbers
    that decide whether a join on this key needs salting or AQE skew
    handling. One partial-agg groupBy; heads through a top-k heap.

    Output: (rank, key, cnt, share, hot_ratio) where hot_ratio is
    cnt / (total/n_keys), the multiple of a perfectly uniform key."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    summary = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(summary))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("cnt") / (F.col("_total") / F.col("_nkeys")), 6
        ).alias("hot_ratio"),
    )


def contingency_counts(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """(feature, bin, label, count) — exact integer contingency table
    of equi-width-binned numeric features against a categorical
    label, the hash-comparable surface under mutual-information
    feature relevance (:func:`mi_report`). Bin edges come from the
    frame's own NaN-excluding [min, max] (the drift-module
    convention); NULL/NaN feature values take bin -1, NULL labels the
    ``__null__`` category — a feature that goes null exactly when the
    label is positive is maximally informative, so null cells must
    be IN the table, not dropped.

    Scale shape: one driver-side edges agg, then unpivot + ONE
    partial-agg groupBy for all features — (features × bins ×
    labels) output rows, never corpus-scale."""
    from featureform_spark.functions.drift import (
        _bin_expr,
        reference_edges,
    )

    if not feature_cols:
        raise ValueError("contingency_counts: no feature columns")
    edges = reference_edges(df, feature_cols, bins)
    lab = F.coalesce(F.col(label_col).cast("string"), F.lit("__null__"))
    parts = [
        df.select(
            F.lit(c).alias("feature"),
            _bin_expr(F.col(c), mn, width, bins).alias("bin"),
            lab.alias("label"),
        )
        for c, (mn, width) in edges.items()
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy("feature", "bin", "label").agg(
        F.count(F.lit(1)).alias("count")
    )


def mi_report(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    bins: int = 10,
) -> dict[str, float]:
    """Mutual information I(binned feature; label) in nats, per
    feature — the model-free relevance scorecard a feature platform
    runs before training (near-zero MI features are candidates to
    drop; the binned estimator is the standard plug-in MI over the
    exact contingency table). One aggregation-scale collect of
    :func:`contingency_counts`, then a driver-side libm fold (the
    standing transcendental convention — ln never enters a
    hash-compared plan)."""
    import math

    rows = contingency_counts(df, feature_cols, label_col, bins).collect()
    by_feature: dict[str, dict[tuple, int]] = {}
    for r in rows:
        by_feature.setdefault(r["feature"], {})[
            (int(r["bin"]), r["label"])
        ] = int(r["count"])
    out: dict[str, float] = {}
    for feature, cells in sorted(by_feature.items()):
        n = sum(cells.values())
        nx: dict[int, int] = {}
        ny: dict[str, int] = {}
        for (b, lab), c in cells.items():
            nx[b] = nx.get(b, 0) + c
            ny[lab] = ny.get(lab, 0) + c
        mi = 0.0
        for (b, lab), c in cells.items():
            if c:
                mi += (c / n) * math.log(c * n / (nx[b] * ny[lab]))
        out[feature] = mi
    return out
