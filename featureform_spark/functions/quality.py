"""Gopher/C4-style document quality signals and PII redaction.

Repetition ratios (duplicate lines / duplicate bigrams), symbol and
alpha-word ratios, bullet/ellipsis line ratios, and a combined
keep/drop verdict in the spirit of the Gopher rules (Rae et al. 2021)
and C4 cleaning (Raffel et al. 2020). Everything is built from
JVM-side array/regexp expressions (whole-stage codegen, no Python
UDFs) so a quality pass over 100 TB of documents runs at scan speed,
and every signal is replicated bit-for-bit by the DuckDB oracle.

Reference parity note: featureform has no text-quality surface; this
is part of the beyond-reference LLM-data-pipeline layer (SURVEY.md
§8.10) alongside functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featureform_spark.functions.text import tokens_expr

# Patterns restricted to constructs RE2 (DuckDB) and Java regex (Spark)
# interpret identically: character classes, bounded repeats, no
# backrefs / lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"\+[0-9][0-9 ()-]{6,}[0-9]"


def _lines(text_col: str) -> Column:
    # trimmed so duplicate-line detection ignores leading/trailing space
    # NB: single-arg lambda — a bare F.trim would be seen as a
    # two-parameter (elem, idx) lambda and trim index digits
    return F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def quality_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/shape signals + keep verdict.

    - dup_line_frac: 1 - distinct/total over non-blank lines
    - dup_bigram_frac: 1 - distinct/total over token bigrams
    - symbol_ratio: non-alphanumeric, non-space chars / chars
    - alpha_word_ratio: tokens containing a letter / tokens
    - bullet_line_frac / ellipsis_line_frac: lines starting with a
      bullet mark / ending with '...'
    - keep: Gopher-style verdict combining the above
    """
    from featureform_spark.functions.parallel import (
        fan_out_if_underparallel,
    )

    # The whole computation is one per-row projection of HOF/regex
    # expressions (no codegen — lambda trees evaluate interpreted), so
    # a single-split scan would run it on one core; fan out the raw
    # rows first (no-op at real scale where the scan has >> cores
    # splits).
    df = fan_out_if_underparallel(df)
    # Project tokens/lines/bigrams as real columns first: expression
    # trees referencing tokens_expr() inline it at every use site, and
    # inside a higher-order-function lambda that re-evaluates the
    # split-per-element — O(n²) per document. Attribute references
    # evaluate once. (Measured: 36s → ~1s for the suite query at sf0.1.)
    staged = df.withColumns(
        {"__toks": tokens_expr(text_col), "__lines": _lines(text_col)}
    )
    toks = F.col("__toks")
    lines = F.col("__lines")
    n_tokens = F.size(toks).cast("long")
    # bigrams in O(n): zip tokens with their shifted-by-one slice.
    # zip_with pads the shorter array with null and concat_ws drops
    # nulls, so the trailing (last_token, null) pair must be cut —
    # slice to n-1; the <2-token case short-circuits to empty.
    staged = staged.withColumn(
        "__bigrams",
        F.when(
            n_tokens >= 2,
            F.slice(
                F.zip_with(
                    toks,
                    F.slice(toks, 2, F.greatest(n_tokens - 1, F.lit(1)).cast("int")),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
                1,
                (n_tokens - 1).cast("int"),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    bigrams = F.col("__bigrams")
    df = staged

    n_lines = F.size(lines).cast("long")

    dup_line_frac = F.when(n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))

    n_bigrams = F.size(bigrams).cast("long")
    dup_bigram_frac = F.when(n_bigrams > 0,
        F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / n_bigrams.cast("double")
    ).otherwise(F.lit(0.0))

    n_chars = F.length(F.col(text_col)).cast("long")
    n_symbol = F.length(
        F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")
    ).cast("long")
    symbol_ratio = F.when(n_chars > 0,
        n_symbol.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))

    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("long")
    alpha_word_ratio = F.when(n_tokens > 0,
        alpha_words.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))

    bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike("^[-*•]"))
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike("\\.\\.\\.$"))
    ).cast("long")
    bullet_line_frac = F.when(n_lines > 0,
        bullet_lines.cast("double") / n_lines.cast("double")).otherwise(F.lit(0.0))
    ellipsis_line_frac = F.when(n_lines > 0,
        ellipsis_lines.cast("double") / n_lines.cast("double")).otherwise(F.lit(0.0))

    mean_word_len = F.when(n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        .cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))

    # Stage every signal as a real column before the keep verdict:
    # the signal expressions are interpreted (HOF lambdas block
    # codegen and its subexpression elimination), so referencing the
    # expression TREES in `keep` re-evaluates each one per row —
    # mean_word_len's O(tokens) fold ran 3x, every dup fraction 2x.
    # Attribute references evaluate once; values are the identical
    # doubles, just not recomputed.
    signals = df.withColumns(
        {
            "n_tokens": n_tokens,
            "dup_line_frac": dup_line_frac,
            "dup_bigram_frac": dup_bigram_frac,
            "symbol_ratio": symbol_ratio,
            "alpha_word_ratio": alpha_word_ratio,
            "bullet_line_frac": bullet_line_frac,
            "ellipsis_line_frac": ellipsis_line_frac,
            "mean_word_len": mean_word_len,
        }
    )
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 100000)
        & (F.col("mean_word_len") >= 2.0)
        & (F.col("mean_word_len") <= 12.0)
        & (F.col("symbol_ratio") < 0.2)
        & (F.col("alpha_word_ratio") > 0.6)
        & (F.col("dup_line_frac") < 0.5)
        & (F.col("dup_bigram_frac") < 0.5)
    )

    return signals.select(
        F.col(id_col),
        "n_tokens",
        "dup_line_frac",
        "dup_bigram_frac",
        "symbol_ratio",
        "alpha_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "mean_word_len",
        keep.cast("long").alias("keep"),
    )


def readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-style reading-ease per document, fully in codegen.

    Words = whitespace tokens; sentences = runs of [.!?] (floor 1);
    syllables approximated by vowel-group count over the whole text —
    the classic public heuristic, chosen because every term is a count
    or a ratio of counts: pure IEEE double arithmetic both engines
    execute identically, so the score hash-matches with no tolerance
    (no logs, no libm). One narrow projection, no shuffle."""
    from featureform_spark.functions.text import tokens_expr

    n_words = F.size(tokens_expr(text_col)).cast("double")
    n_sent = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")).cast("double"),
        F.lit(1.0),
    )
    n_syll = F.size(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[aeiouy]+"), 0
        )
    ).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.when(n_words > 0, flesch).otherwise(F.lit(None)).alias(
            "flesch"
        ),
    )


def code_detect(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    symbol_threshold: float = 0.05,
    brace_threshold: float = 0.01,
) -> DataFrame:
    """Code-vs-prose routing signals (the standard pipeline stage that
    sends code-looking documents to a code-data path): symbol density
    ({}();=[]<> per char), brace+semicolon density, digit ratio, and
    an indented-line fraction — all counts and ratios of counts, so
    the flag and every signal hash-match across engines exactly. One
    codegen projection, no shuffle."""
    # NOTE: no fan_out_if_underparallel here — A/B-probed a consistent
    # loss (0.35-0.37 -> 0.36-0.45 s at sf0.1): the per-row regex work
    # is too cheap to pay for the repartition exchange.
    n_chars = F.length(F.col(text_col)).cast("double")

    def _density(pattern: str):
        # regexp_count is RuntimeReplaceable sugar for
        # size(regexp_extract_all(...)) — the same integer AND the
        # same execution (micro-A/B: wash); the win in this function
        # is the density STAGING below, which evaluates each regex
        # expression once instead of per consumer
        return (
            F.regexp_count(F.col(text_col), F.lit(pattern)).cast("double")
            / n_chars
        )

    symbol_density = _density(r"[{}();=\[\]<>]")
    brace_density = _density(r"[{};]")
    digit_ratio = _density(r"[0-9]")
    lines = F.split(F.col(text_col), "\n")
    indent_frac = (
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"^(    |\t)"))
        ).cast("double")
        / F.greatest(F.size(lines).cast("double"), F.lit(1.0))
    )
    zero = F.lit(0.0)
    guard = n_chars > 0
    cols = {
        "symbol_density": symbol_density,
        "brace_density": brace_density,
        "digit_ratio": digit_ratio,
        "indent_frac": indent_frac,
    }
    # stage the guarded densities as real columns so is_code reuses
    # them instead of re-running both regex scans per row (these
    # projections are interpreted — HOF lambdas in indent_frac block
    # codegen CSE)
    staged = df.withColumns(
        {n: F.when(guard, e).otherwise(zero) for n, e in cols.items()}
    )
    return staged.select(
        F.col(id_col),
        *cols.keys(),
        (
            (F.col("symbol_density") > F.lit(float(symbol_threshold)))
            & (F.col("brace_density") > F.lit(float(brace_threshold)))
        ).alias("is_code"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> DataFrame:
    """Gopher-style n-gram CHARACTER-fraction repetition rules (Rae et
    al. 2021 §A1.1 "repetitious documents") — the char-weighted
    complement of quality_signals' count-based dup fractions:

    - ``top{n}_char_frac`` (n in ``top_ns``): characters covered by the
      single most character-covering word n-gram (occurrences ×
      n-gram length), over total characters across all of the doc's
      n-gram occurrences. Catches "the same slogan 500 times".
    - ``dup{n}_char_frac`` (n in ``dup_ns``): characters covered by
      ALL n-grams occurring more than once, over the same total
      (overlap between occurrences is not discounted — the standard
      reimplementation approximation). Catches long boilerplate runs.
    - ``keep_repetition``: 1 when every signal is under Gopher's
      published thresholds (0.20 / 0.18 for top-2/3; 0.15 for dup-5).

    Scale shape: one explode + two partial-agg groupBys PER n, all
    keyed on ``id_col`` (the joins after the first agg reuse the same
    hash partitioning); no window over the corpus, no driver
    collection. Docs shorter than n tokens contribute 0.
    """
    from featureform_spark.functions.text import tokens_expr

    thresholds = {2: 0.20, 3: 0.18, 4: 0.16, 5: 0.15, 6: 0.14,
                  7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    bad = [n for n in (*top_ns, *dup_ns) if n not in thresholds]
    if bad:
        raise ValueError(
            f"n-gram sizes {bad} have no Gopher threshold (supported: "
            f"{sorted(thresholds)})"
        )
    base = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    out = base.select(id_col).distinct()
    signal_cols: list[str] = []
    for n, mode in [(n, "top") for n in top_ns] + [
        (n, "dup") for n in dup_ns
    ]:
        # guard short docs: sequence(0, negative) counts DOWN in Spark,
        # which would fabricate n-grams from negative slice offsets
        grams = base.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"CASE WHEN size(__toks) >= {n} THEN "
                    f"transform(sequence(0, size(__toks) - {n}), "
                    f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))) "
                    f"ELSE array() END"
                )
            ).alias("__ng"),
        )
        counts = grams.groupBy(id_col, "__ng").agg(
            F.count(F.lit(1)).alias("__occ")
        )
        chars = F.col("__occ") * F.length("__ng")
        name = f"{mode}{n}_char_frac"
        if mode == "top":
            agg = counts.groupBy(id_col).agg(
                (
                    F.max(chars).cast("double")
                    / F.sum(chars).cast("double")
                ).alias(name)
            )
        else:
            agg = counts.groupBy(id_col).agg(
                (
                    F.sum(F.when(F.col("__occ") > 1, chars).otherwise(0))
                    .cast("double")
                    / F.sum(chars).cast("double")
                ).alias(name)
            )
        out = out.join(agg, id_col, "left")
        signal_cols.append(name)
    out = out.select(
        id_col,
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in signal_cols],
    )
    keep = F.lit(True)
    for c in signal_cols:
        n = int("".join(ch for ch in c.split("_")[0] if ch.isdigit()))
        keep = keep & (F.col(c) < F.lit(thresholds[n]))
    return out.withColumn("keep_repetition", keep.cast("long"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """C4-style PII scrub: replace emails, IPv4s, and international
    phone numbers with placeholder tokens. Order matters (emails
    before phones so digits in addresses aren't half-eaten); the
    oracle applies the same order.
    """
    out = out or text_col
    scrubbed = F.regexp_replace(F.col(text_col), EMAIL_RE, email_token)
    scrubbed = F.regexp_replace(scrubbed, IPV4_RE, ip_token)
    scrubbed = F.regexp_replace(scrubbed, PHONE_RE, phone_token)
    return df.withColumn(out, scrubbed)
