"""DSIR-style data selection: hashed n-gram importance resampling.

The published recipe (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023 — public paper): estimate
per-example importance weights between a small TARGET corpus (the
domain you want more of) and the big RAW corpus using hashed n-gram
bucket distributions, then resample the raw corpus with probability
proportional to the weight. It is the standard pretraining-data
selection pass a 100 TB pipeline runs between quality filtering and
mixing.

Spark-first shape (no stage touches more than one corpus scan):

1. ``hashed_token_histogram`` — per-corpus bucket histogram. Tokens
   hash into ``n_buckets`` via md5 (cross-engine reproducible), and the
   groupBy partial-aggregates map-side, so each partition contributes
   at most ``n_buckets`` rows to the single bounded shuffle.
2. ``dsir_fixed_point_weights`` — driver-side fold of the two
   B-bounded histograms into per-bucket integer importance weights:
   ``w_b = floor(SCALE · (t_b+1)(R+B) / ((r_b+1)(T+B)))`` — the
   add-one-smoothed likelihood ratio ``p_target(b)/p_raw(b)`` in fixed
   point. Integer end-to-end, so the per-document sums below are
   associative (order-free) and an ANSI-SQL oracle reproduces them
   bit-for-bit — the repo's house rule for hash-matched oracles. The
   paper's log-space form is ``dsir_log_weights`` (floats; pytest-
   checked, not oracle-paired, since transcendental sums aren't
   portable across engines).
3. ``dsir_score`` — ONE projection over the raw corpus: the weight
   table rides as a B-entry literal array, each token folds
   ``w[bucket(token)]`` into a long, all inside whole-stage codegen
   (md5/conv/element_at/aggregate are JVM expressions — no Python, no
   join, no shuffle at scoring time).
4. ``dsir_resample`` — deterministic Gumbel-top-k over the scores
   (md5-derived uniforms, so reruns select the same documents), the
   sampling step of the paper. TakeOrderedAndProject keeps it one
   bounded reduction.

At 100 TB: two histogram passes (B-bounded shuffles), one scoring
projection, one top-k — nothing materializes more than ``n_buckets``
rows except the final selection itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256
DEFAULT_SCALE = 1_000_000

_TOKENS = "filter(split(text, ' '), x -> x != '')"


def _token_bucket(tok, n_buckets: int):
    """Bucket id from the first 4 hex chars of md5(token): a 16-bit
    space, so ``% n_buckets`` is unbiased for power-of-two bucket
    counts ≤ 65536 (and md5 is the one hash Spark and DuckDB spell
    identically)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long")
        % n_buckets
    )


def hashed_token_histogram(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Corpus → (bucket, cnt) histogram over hashed unigrams. The
    explode feeds a groupBy that partial-aggregates to ≤ ``n_buckets``
    rows per partition before the (bounded) shuffle."""
    tok = F.explode(
        F.expr(_TOKENS.replace("text", text_col))
    ).alias("tok")
    return (
        df.select(tok)
        .select(_token_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_fixed_point_weights(
    target_hist: list[tuple[int, int]],
    raw_hist: list[tuple[int, int]],
    n_buckets: int = DEFAULT_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> list[int]:
    """Per-bucket integer importance weights from two collected
    histograms (each ≤ n_buckets rows — the only driver-side data).
    Pure-integer floor arithmetic (python ints are arbitrary
    precision; the SQL oracle mirrors it with HUGEINT/DECIMAL(38,0)
    integral division), so every engine lands the same longs."""
    t = dict(target_hist)
    r = dict(raw_hist)
    t_total = sum(t.values())
    r_total = sum(r.values())
    return [
        (
            scale
            * (t.get(b, 0) + 1)
            * (r_total + n_buckets)
        )
        // ((r.get(b, 0) + 1) * (t_total + n_buckets))
        for b in range(n_buckets)
    ]


def dsir_score(
    df: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Score every raw document in ONE zero-shuffle projection:
    ``score_fp = Σ_tokens w[bucket(token)]`` (fixed-point long) and
    ``dsir_weight = score_fp / n_tokens`` (the per-token normalized
    importance, one final division so long docs don't dominate purely
    by length). Empty documents carry NULL weight."""
    if len(weights) != n_buckets:
        raise ValueError(
            f"weights has {len(weights)} entries, expected {n_buckets}"
        )
    warr = F.array(*[F.lit(int(w)) for w in weights])
    toks = F.expr(_TOKENS.replace("text", text_col))
    score = F.aggregate(
        F.transform(
            toks,
            lambda t: F.element_at(
                warr, (_token_bucket(t, n_buckets) + 1).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    out = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_fp"),
    )
    return out.withColumn(
        "dsir_weight",
        F.when(
            F.col("n_tokens") > 0,
            F.col("score_fp").cast("double") / F.col("n_tokens"),
        ),
    )


def dsir_select(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """The composed pipeline: histogram both corpora, fold weights on
    the driver, score the raw corpus. Returns (id, n_tokens, score_fp,
    dsir_weight) for every raw document — feed to ``dsir_resample``
    (or a plain threshold) for the selection itself."""
    t_hist = [
        (r["bucket"], r["cnt"])
        for r in hashed_token_histogram(
            target, text_col, n_buckets
        ).collect()
    ]
    r_hist = [
        (r["bucket"], r["cnt"])
        for r in hashed_token_histogram(raw, text_col, n_buckets).collect()
    ]
    weights = dsir_fixed_point_weights(t_hist, r_hist, n_buckets, scale)
    return dsir_score(raw, weights, text_col, id_col, n_buckets)


def dsir_log_weights(
    target_hist: list[tuple[int, int]],
    raw_hist: list[tuple[int, int]],
    n_buckets: int = DEFAULT_BUCKETS,
) -> list[float]:
    """The paper's log-space weights: ``log p_target(b) − log
    p_raw(b)`` with add-one smoothing. Rank-identical per bucket to
    the fixed-point form (log is monotone); exposed for consumers who
    want true log-likelihood-ratio scores. Float-valued — use the
    fixed-point form where cross-engine bit-exactness matters."""
    import math

    t = dict(target_hist)
    r = dict(raw_hist)
    t_total = sum(t.values()) + n_buckets
    r_total = sum(r.values()) + n_buckets
    return [
        math.log((t.get(b, 0) + 1) / t_total)
        - math.log((r.get(b, 0) + 1) / r_total)
        for b in range(n_buckets)
    ]


def dsir_resample(
    scored: DataFrame,
    n: int,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic importance resampling (the paper's final step):
    Gumbel-top-k — key each doc with ``log(dsir_weight) + gumbel(u)``
    where u derives from md5(id, seed), take the global top ``n``.
    The Gumbel-max trick on LOG weights samples n docs without
    replacement with probability ∝ dsir_weight (keying on the raw
    fixed-point weight instead would let a ~1e6-scale weight gap
    swamp the O(1) Gumbel noise and collapse into a plain top-n);
    reruns and retries pick the SAME docs — the property a resumable
    100 TB pipeline needs. Zero-weight docs are never selected (their
    sampling probability is zero). One TakeOrderedAndProject, no full
    sort."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col(id_col), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(16**8)
    )
    # clamp away u=0 (log(0)) — md5 can land exactly on zero
    gumbel = -F.log(-F.log((u + F.lit(1e-12)) / (1.0 + 2e-12)))
    key = F.log(F.col("dsir_weight")) + gumbel
    return (
        scored.where(
            F.col("dsir_weight").isNotNull() & (F.col("dsir_weight") > 0)
        )
        .withColumn("_k", key)
        .orderBy(F.col("_k").desc(), F.col(id_col))
        .limit(n)
        .drop("_k")
    )
