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

__all__ = [
    "binned_counts",
    "reference_edges",
    "histogram_compare",
    "categorical_compare",
    "embedding_compare",
    "schema_compare",
    "psi",
    "chi_square",
    "drift_report",
    "drift_report_categorical",
    "drift_report_embedding",
]


def _bin_expr(col, mn: float, width: float, bins: int):
    d = col.cast("double")
    idx = F.floor((d - F.lit(mn)) / F.lit(width))
    bounded = F.least(
        F.greatest(idx, F.lit(0)), F.lit(bins - 1)
    ).cast("long")
    # NaN joins NULL in the -1 bin: floor(NaN) would otherwise cast to
    # a garbage index, and a feature going NaN IS drift exactly like a
    # feature going NULL (broken upstream arithmetic vs broken join)
    return F.when(col.isNull() | F.isnan(d), F.lit(-1)).otherwise(bounded)


def binned_counts(
    df: DataFrame,
    edges: dict[str, tuple[float, float]],
    bins: int,
    alias: str,
) -> DataFrame:
    """(feature, bin, <alias>) histogram of ``df`` under FIXED edges
    ``{col: (min, width)}`` — the shared binning pass of
    :func:`histogram_compare` and the persistent
    ``streaming.drift_monitor.DriftMonitor`` (which pins its reference
    edges once and bins every later batch with them). Unpivot to
    (feature, bin) then ONE partial-agg groupBy for all features."""
    parts = [
        df.select(
            F.lit(c).alias("feature"),
            _bin_expr(F.col(c), mn, width, bins).alias("bin"),
        )
        for c, (mn, width) in edges.items()
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy("feature", "bin").agg(F.count(F.lit(1)).alias(alias))


def reference_edges(
    ref: DataFrame, cols: list[str], bins: int
) -> dict[str, tuple[float, float]]:
    """NaN-excluding fixed-width bin edges ``{col: (min, width)}``
    from one agg over the reference frame (see
    :func:`histogram_compare` for the NaN rationale)."""
    def _finite(c):
        d = F.col(c).cast("double")
        return F.when(~F.isnan(d), d)

    stats = ref.agg(
        *[F.min(_finite(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(_finite(c)).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    edges: dict[str, tuple[float, float]] = {}
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None:
            raise ValueError(
                f"reference column {c!r} has no non-NULL, non-NaN "
                "values to derive bin edges from"
            )
        width = (mx - mn) / bins if mx > mn else 1.0
        edges[c] = (float(mn), float(width))
    return edges


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
    # NaN-excluding edges: Spark's min/max order NaN as the LARGEST
    # double, so one NaN in the reference would make mx (and hence
    # width) NaN and collapse every value into bin 0 with no error —
    # exactly the broken-upstream case the monitor exists to catch.
    # NaN rows still count, in the -1 bin (see _bin_expr).
    edges = reference_edges(ref, cols, bins)

    out = binned_counts(ref, edges, bins, "ref_count").join(
        binned_counts(cur, edges, bins, "cur_count"),
        ["feature", "bin"],
        "full_outer",
    )
    return out.select(
        "feature",
        "bin",
        F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
        F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
    )


def categorical_compare(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    top_k: int = 20,
) -> DataFrame:
    """(feature, category, ref_count, cur_count) for string/categorical
    feature columns — the categorical twin of :func:`histogram_compare`
    (r12; numeric-only monitoring misses exactly the schema-change
    drift a string feature shows first).

    Binning is hash-stable top-K: the K categories ranked by
    (ref_count DESC, category ASC) keep their own rows — a
    deterministic total order, so the same K on every engine — and
    everything else folds into ``__other__``. NULL becomes the
    ``__null__`` category (a feature going NULL is drift, and it can
    legitimately BE a top-K category). Categories never seen in the
    reference rank after all reference-backed ones (ref_count 0) and
    typically fold into ``__other__`` — where a brand-new category's
    mass belongs. Counts are exact integers, hash-reproducible
    cross-engine; PSI/chi-square fold driver-side
    (:func:`drift_report_categorical`).

    Scale shape: one unpivoted partial-agg groupBy per frame (adding
    features adds no jobs), then the rank + fold run at CATEGORY
    cardinality — post-aggregation, thousands of rows at most, never
    the corpus. Reserved names: a real category spelled exactly
    ``__null__``/``__other__`` merges with the sentinel row
    (documented, not scanned for — a guard pass over 100 TB to catch
    a pathological label is the wrong trade)."""
    from pyspark.sql import Window

    if not cols:
        raise ValueError("categorical_compare: no feature columns")
    if top_k < 1:
        raise ValueError("categorical_compare: top_k must be >= 1")

    def _counts(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            df.select(
                F.lit(c).alias("feature"),
                F.coalesce(
                    F.col(c).cast("string"), F.lit("__null__")
                ).alias("category"),
            )
            for c in cols
        ]
        un = parts[0]
        for p in parts[1:]:
            un = un.unionByName(p)
        return un.groupBy("feature", "category").agg(
            F.count(F.lit(1)).alias(alias)
        )

    joined = (
        _counts(ref, "ref_count")
        .join(_counts(cur, "cur_count"), ["feature", "category"], "full_outer")
        .select(
            "feature",
            "category",
            F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
            F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
        )
    )
    w = Window.partitionBy("feature").orderBy(
        F.desc("ref_count"), F.asc("category")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .select(
            "feature",
            F.when(F.col("_rn") <= top_k, F.col("category"))
            .otherwise(F.lit("__other__"))
            .alias("category"),
            "ref_count",
            "cur_count",
        )
        .groupBy("feature", "category")
        .agg(
            F.sum("ref_count").alias("ref_count"),
            F.sum("cur_count").alias("cur_count"),
        )
    )


def embedding_compare(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    dim: int,
    num_planes: int = 8,
) -> DataFrame:
    """(bucket, ref_count, cur_count) — embedding-space drift monitor
    (r12): the distribution of an ``array<float>`` feature column is
    summarized per frame as a histogram over md5-seeded hyperplane
    SIGN buckets (the LSH bucket machinery from
    ``functions.similarity``), then compared reference vs current
    exactly like the scalar monitors. A broken encoder, a domain
    shift, or a renormalization upstream all move mass between sign
    buckets; PSI over the bucket histogram scores it
    (:func:`drift_report_embedding`).

    Exactness: hyperplanes are deterministic ±1 from md5, projections
    are fixed-order IEEE folds (bit-identical cross-engine — the ANN
    oracle convention), counts are exact integers. NULL embeddings
    get the ``__null__`` bucket.

    Scale shape: scan + Arrow bucket kernel + ONE partial-agg groupBy
    per frame; 2^num_planes buckets (256 at the default) — the
    compare join runs at bucket cardinality, never corpus scale."""
    if num_planes < 1 or num_planes > 20:
        raise ValueError(
            "embedding_compare: num_planes must be in [1, 20] "
            "(2^planes buckets must stay aggregation-scale)"
        )
    # the ONE shared Arrow kernel (functions.similarity) with NULL
    # routing — a single implementation carries the bit-exactness
    # contract with the DuckDB oracle
    from featureform_spark.functions.similarity import bucket_pandas

    kernel = bucket_pandas(dim, num_planes, null_bucket="__null__")

    def _hist(df: DataFrame, alias: str) -> DataFrame:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return (
            df.select(kernel(v).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    out = _hist(ref, "ref_count").join(
        _hist(cur, "cur_count"), ["bucket"], "full_outer"
    )
    return out.select(
        "bucket",
        F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
        F.coalesce("cur_count", F.lit(0)).alias("cur_count"),
    )


def schema_compare(ref: DataFrame, cur: DataFrame) -> list[dict]:
    """Schema drift — the monitor that fires FIRST when an upstream
    contract breaks: columns added, removed, or type-changed between
    the reference frame and the current one (nullability changes are
    reported as ``nullability_changed`` — they matter to writers even
    when values still flow). Pure metadata — no job runs; returns a
    driver-side list of ``{column, status, ref_type, cur_type}``
    sorted by column name, ``status`` ∈ {unchanged, added, removed,
    type_changed, nullability_changed}. Pair with the value monitors
    (:func:`histogram_compare` / :func:`categorical_compare` /
    :func:`embedding_compare`) which assume the schema already
    lines up."""
    ref_fields = {f.name: f for f in ref.schema.fields}
    cur_fields = {f.name: f for f in cur.schema.fields}
    out: list[dict] = []
    for name in sorted(set(ref_fields) | set(cur_fields)):
        r, c = ref_fields.get(name), cur_fields.get(name)
        if r is None:
            status = "added"
        elif c is None:
            status = "removed"
        elif r.dataType != c.dataType:
            status = "type_changed"
        elif r.nullable != c.nullable:
            status = "nullability_changed"
        else:
            status = "unchanged"
        out.append(
            {
                "column": name,
                "status": status,
                "ref_type": r.dataType.simpleString() if r else None,
                "cur_type": c.dataType.simpleString() if c else None,
            }
        )
    return out


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


def chi_square(counts: list[tuple[int, int]]) -> float:
    """Pearson chi-square statistic comparing the current distribution
    to reference proportions: ``Σ (o_i - e_i)² / e_i`` where
    ``e_i = ref_share_i × cur_total``. Zero-reference bins are skipped
    (their mass is tested by the PSI epsilon path instead — chi-square
    is undefined at e=0). Driver-side fold like :func:`psi`."""
    ref_total = sum(r for r, _ in counts)
    cur_total = sum(c for _, c in counts)
    if ref_total == 0 or cur_total == 0:
        raise ValueError("chi_square: empty frame")
    stat = 0.0
    for r, c in counts:
        if r == 0:
            continue
        e = (r / ref_total) * cur_total
        stat += (c - e) * (c - e) / e
    return stat


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


def drift_report_embedding(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    dim: int,
    num_planes: int = 8,
) -> float:
    """PSI over the hyperplane sign-bucket histogram of an embedding
    column — one aggregation-scale collect (≤ 2^num_planes + 1 rows),
    driver-side fold per the transcendental convention."""
    rows = embedding_compare(ref, cur, vec_col, dim, num_planes).collect()
    return psi([(int(r["ref_count"]), int(r["cur_count"])) for r in rows])


def drift_report_categorical(
    ref: DataFrame,
    cur: DataFrame,
    cols: list[str],
    top_k: int = 20,
    stat: str = "psi",
) -> dict[str, float]:
    """Per-feature PSI (default) or chi-square over top-K + __other__
    category counts — one aggregation-scale collect, driver-side
    folds (the transcendental/float division stays out of any
    hash-compared plan, same convention as :func:`drift_report`)."""
    if stat not in ("psi", "chi_square"):
        raise ValueError(f"stat={stat!r}; use 'psi' or 'chi_square'")
    rows = categorical_compare(ref, cur, cols, top_k).collect()
    by_feature: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_feature.setdefault(r["feature"], []).append(
            (int(r["ref_count"]), int(r["cur_count"]))
        )
    fold = psi if stat == "psi" else chi_square
    return {f: fold(c) for f, c in sorted(by_feature.items())}
