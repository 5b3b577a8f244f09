"""Corpus mixing: downsample a multi-source corpus to target mixture
proportions — the "data mixing" step of LLM pre-training pipelines
(e.g. 60% web / 30% code / 10% books from unbalanced raw sources).

Weights are *integer parts* (``{"web": 6, "code": 3, "books": 1}``),
not floats: the kept-per-source quota and the md5 keep-threshold are
then computed in exact integer arithmetic, so the selection is a pure
function of (key, seed, weights, per-source counts) that any engine
reproduces bit-exactly — the DuckDB oracle re-derives the same
thresholds from the same counts in SQL.

Semantics: let ``W = sum(parts)``, ``n_s`` the observed rows of source
``s``. The largest feasible mixed corpus keeping exact proportions is
``K = min_s floor(n_s * W / w_s)`` total rows; each source keeps rows
whose 32-bit md5 prefix falls below ``t_s = floor(2^32 * w_s * K /
(W * n_s))`` — fractional-in-expectation per source (same contract as
``train_test_split``), proportions exact in expectation. Sources
absent from ``weights`` are dropped.

Scale design (100 TB corpus):
- One tiny groupBy(source) count (map-side combined, #sources rows),
  a single-row global min, then two broadcast joins back onto the
  corpus — the data-sized path is one scan + filter, zero wide
  shuffles of the corpus itself.
- Threshold math runs in decimal(38,0) (HUGEINT in the oracle), so
  ``2^32 * w * K`` cannot overflow at any realistic corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_u32(key: Column, seed: int = 42) -> Column:
    """First 8 hex chars of md5(key#seed) as an integer in [0, 2^32)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def mix_corpus(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Rows of ``df`` downsampled to the ``weights`` mixture (columns
    unchanged). Deterministic per (key, seed): stable under retries,
    partitioning, and engines."""
    if not weights or any(w <= 0 or w != int(w) for w in weights.values()):
        raise ValueError("weights must be positive integer parts")
    total_w = sum(weights.values())
    w_expr = F.lit(None)
    for s, w in weights.items():
        w_expr = F.when(F.col(source_col) == s, F.lit(int(w))).otherwise(w_expr)

    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", w_expr.cast("long"))
        .filter(F.col("__w").isNotNull())
    )
    dec = "decimal(38,0)"
    k_total = counts.agg(
        F.min(
            F.expr(f"cast(__n as {dec}) * {total_w} div cast(__w as {dec})")
        ).alias("__k")
    )
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    threshold = F.expr(
        f"cast(4294967296 as {dec}) * __w * __k div ({total_w} * cast(__n as {dec}))"
    )
    return (
        df.join(F.broadcast(counts), source_col)
        .crossJoin(F.broadcast(k_total))
        .filter(md5_u32(key, seed) < threshold)
        .drop("__n", "__w", "__k")
    )


def mix_summary(
    df: DataFrame, source_col: str, weights: dict[str, int], key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Achieved mixture report: ``[source, n_kept, achieved_frac]``."""
    mixed = mix_corpus(df, source_col, weights, key_cols, seed)
    counts = mixed.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_kept"))
    total = counts.agg(F.sum("n_kept").alias("__tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            source_col,
            F.col("n_kept").cast("long").alias("n_kept"),
            (F.col("n_kept").cast("double") / F.col("__tot").cast("double")).alias(
                "achieved_frac"
            ),
        )
    )


def upsample_epochs(
    df: DataFrame,
    source_col: str,
    epochs: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Repeat rows per-source by a (possibly fractional) epoch count —
    the upsampling half of LLM data mixing (e.g. books at 2.5 epochs,
    web at 1.0). Each row appears ``floor(e)`` times, plus once more iff
    its md5 hash-bucket falls under ``frac(e)`` — deterministic per
    (key, seed), so the fractional epoch picks the *same* stable subset
    every run. Output gains a 0-based ``epoch_col``; sources absent
    from ``epochs`` are dropped.

    Scale shape: pure narrow ops (hash + sequence + explode) — zero
    shuffles; output volume is the weighted sum of inputs.
    """
    from featureform_spark.operators.split import threshold_hex

    if not epochs or any(e < 0 for e in epochs.values()):
        raise ValueError("epochs must be non-negative")
    n_full = F.lit(None)
    thr = F.lit(None)
    for s, e in epochs.items():
        whole, frac = int(e), e - int(e)
        n_full = F.when(F.col(source_col) == s, F.lit(whole)).otherwise(n_full)
        thr = F.when(
            F.col(source_col) == s, F.lit(threshold_hex(frac))
        ).otherwise(thr)

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h8 = F.substring(F.md5(F.concat(key, F.lit(f"#{seed}"))), 1, 8)
    n_rep = (n_full + F.when(h8 < thr, 1).otherwise(0)).cast("int")
    # sequence(0, -1) would generate a DESCENDING [0, -1] — guard the
    # n_rep == 0 case with an empty array so explode drops the row
    reps = F.when(
        n_rep >= 1,
        F.sequence(F.lit(0).cast("long"), (n_rep - 1).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn("__reps", reps)
        .filter(n_full.isNotNull())
        .withColumn(epoch_col, F.explode("__reps"))
        .drop("__reps")
    )


def quality_weighted_sample(
    df: DataFrame,
    score_col: str,
    key_cols: list[str],
    seed: int = 42,
    scale: float = 1.0,
) -> DataFrame:
    """Importance sampling by a per-row quality score: row ``i`` is kept
    with probability ``clamp(score_i * scale, 0, 1)`` — the
    quality-weighted data-selection step of LLM pipelines (public
    DSIR / quality-classifier-resampling recipes), where high-quality
    documents are retained and low-quality ones are thinned rather than
    hard-filtered.

    Deterministic per (key, seed): the Bernoulli draw is
    ``md5_u32(key) < floor(p * 2^32)``, a pure function any engine
    reproduces bit-exactly when ``score_col`` itself is bit-exact
    (IEEE multiply + floor). ``scale`` rescales scores (e.g. 2.0 keeps
    everything above 0.5 surely, thins below proportionally).

    Scale shape: a scan + filter — zero shuffles, zero driver state;
    composes with any upstream score (text_stats quality_score, a
    classifier margin, a perplexity bucket).
    """
    p = F.least(
        F.greatest(F.col(score_col) * F.lit(float(scale)), F.lit(0.0)),
        F.lit(1.0),
    )
    thr = F.floor(p * F.lit(4294967296.0)).cast("long")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(md5_u32(key, seed) < thr)


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """EXACTLY ``min(k, group size)`` rows per group, chosen by a
    deterministic hash ranking — balanced eval subsets, per-domain
    audits, "k docs per source" style selections where Bernoulli
    sampling's variance is unacceptable.

    Rows rank within their group by ``(md5_u32(key), key)`` (the key
    tiebreak makes hash collisions deterministic too), so the selection
    is a pure function of (group, key, seed): stable under
    re-partitioning, re-runs, and engines.

    Scale shape: one shuffle on ``group_col``; the per-group window sort
    is the k-selection. Groups here are domains/sources (thousands at
    most), so per-group volume — not group count — bounds the sort; for
    a pathologically hot group pre-filter with
    ``quality_weighted_sample`` to ~k·10 candidates first.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    w = Window.partitionBy(group_col).orderBy(
        md5_u32(key, seed).asc(), key.asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# weight scale for temperature mixing: floor(n^alpha * 2^20) — large
# enough that the integer truncation shifts proportions by < 1e-6
TEMP_W_SCALE = 1 << 20


def temperature_weights(
    counts: dict[str, int], alpha: float
) -> dict[str, int]:
    """Integer mixture parts ∝ ``n_s^alpha`` — the multilingual /
    multi-domain "temperature" reweighting (alpha < 1 upsamples small
    domains relative to their raw share; alpha=1 is the natural mix).

    FLOAT ``alpha`` is restricted to {0.25, 0.5, 0.75}: those powers
    compose from IEEE sqrt and multiply, both CORRECTLY ROUNDED per
    IEEE-754, so Python, the JVM, and DuckDB produce bit-identical
    doubles and ``floor(x * 2^20)`` lands on the same integer
    everywhere. General float ``pow`` is a libm transcendental
    (last-ulp divergence across engines — same reason BM25 scores
    aren't hash-compared) and is refused rather than silently
    nondeterministic. ANY other temperature is available as an exact
    rational ``(num, den)`` tuple — e.g. ``alpha=(7, 10)`` — routed
    to :func:`temperature_weights_exact` (pure integer roots)."""
    import math

    if isinstance(alpha, tuple):
        return temperature_weights_exact(counts, alpha)

    def f(n: float) -> float:
        if alpha == 0.5:
            return math.sqrt(n)
        if alpha == 0.25:
            return math.sqrt(math.sqrt(n))
        if alpha == 0.75:
            return math.sqrt(n) * math.sqrt(math.sqrt(n))
        raise ValueError(
            "float temperature alpha must be one of 0.25/0.5/0.75 "
            "(sqrt-composable — exact cross-engine); for any other "
            "value pass an exact rational as a (num, den) tuple, "
            "e.g. alpha=(7, 10) — integer root arithmetic, no "
            f"floats at all; got {alpha!r}"
        )

    if not counts:
        raise ValueError("temperature_weights: no sources")
    return {
        s: int(math.floor(f(float(n)) * TEMP_W_SCALE))
        for s, n in counts.items()
        if n > 0
    }


def _iroot(n: int, k: int) -> int:
    """floor(n ** (1/k)) for non-negative int ``n`` — exact integer
    Newton iteration (arbitrary precision, no floats anywhere)."""
    if n < 0 or k < 1:
        raise ValueError("_iroot: need n >= 0, k >= 1")
    if n == 0:
        return 0
    if k == 1:
        return n
    # start at 2^ceil(bits/k) >= true root, descend monotonically
    x = 1 << -(-n.bit_length() // k)
    while True:
        y = ((k - 1) * x + n // x ** (k - 1)) // k
        if y >= x:
            break
        x = y
    # Newton over ints can land one off either side of the floor
    while x ** k > n:
        x -= 1
    while (x + 1) ** k <= n:
        x += 1
    return x


def temperature_weights_exact(
    counts: dict[str, int], alpha: tuple[int, int]
) -> dict[str, int]:
    """Integer mixture parts ``floor(n^(p/q) * 2^20)`` for ANY
    rational temperature ``alpha = (p, q)`` — the escape hatch past
    the sqrt-composable float set (r10 verdict task #7).

    Pure integer arithmetic: ``n^(p/q) * 2^20 = (n^p * 2^(20q))^(1/q)``,
    so the weight is the exact q-th integer root of an exact integer —
    no libm, no rounding mode, nothing engine-dependent. (The float
    path floors a CORRECTLY ROUNDED double, which can round up across
    an integer boundary, so the two paths are distinct APIs rather
    than one silently switching representations: ``alpha=0.5`` and
    ``alpha=(1, 2)`` may differ by 1 part in 2^20 on adversarial n.)

    Driver-side over the per-source count dict (thousands of entries
    at most); Python big ints carry n^p for any real corpus size."""
    p, q = alpha
    if p < 1 or q < 1:
        raise ValueError(
            f"temperature alpha must be a positive rational, got {alpha!r}"
        )
    if q > 64:
        raise ValueError(
            "temperature alpha denominator > 64 makes the integer-root "
            f"work pathological (n^p << 20q bits); reduce the fraction "
            f"— got {alpha!r}"
        )
    if p > 8 * q:
        raise ValueError(
            "temperature alpha > 8 amplifies large sources beyond any "
            f"mixing use; got {alpha!r}"
        )
    if not counts:
        raise ValueError("temperature_weights_exact: no sources")
    return {
        s: _iroot(int(n) ** p << (20 * q), q)
        for s, n in counts.items()
        if n > 0
    }


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_cols: list[str],
    alpha: float | tuple[int, int] = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Downsample a multi-source corpus to ``n_s^alpha`` proportions —
    the data-mixing temperature knob (alpha=0.5 is the common
    multilingual setting). One tiny per-source count (aggregation-
    scale), integer weights via :func:`temperature_weights`, then the
    same exact-integer threshold selection as :func:`mix_corpus`:
    deterministic per (key, seed) and bit-reproducible by a SQL
    oracle that re-derives the weights with its own sqrt."""
    obs = {
        r[source_col]: int(r["__n"])
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    return mix_corpus(
        df, source_col, temperature_weights(obs, alpha), key_cols, seed
    )
