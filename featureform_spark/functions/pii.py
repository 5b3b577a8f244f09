"""PII detection / redaction for training-data pipelines.

The hygiene pass every pretraining corpus runs before packing: find
and strip emails, phone numbers, IP addresses, SSNs, and long card-like
digit runs. Reference parity note: the reference has no PII pass (its
transformations are user-supplied SQL/DF fns); this extends the
beyond-reference family started by ``functions/quality.redact_pii``
(r7: email/ipv4/phone redaction only, pinned by the ``pii_redact``
suite row) with per-type COUNTS, ssn/card patterns, type selection,
a corpus-level report, and sorted-order chaining — quality.redact_pii
stays as-is for its pinned row; new callers use this module.

Spark-first shape: everything is ONE codegen projection per document —
``regexp_extract_all`` for counts, chained ``regexp_replace`` for
redaction. No Python in the row path, no shuffle anywhere (the report
aggregation is the usual partial-agg fold). At 100 TB this is
scan-bound, exactly like the quality-signal pass it composes with.

Cross-engine determinism: patterns are ASCII-EXPLICIT (no ``\\w``/
``\\d`` — Java regex is Unicode-aware where RE2 is ASCII; the repo's
standing regex rule) and use only constructs Java regex and RE2
implement identically (character classes, bounded quantifiers,
non-capturing groups, ``\\b``). Redaction applies types in sorted-name
order on both engines so overlapping matches resolve identically.

The deliberately-simple patterns over-match (an IPv4 octet may exceed
255; a 13-16 digit run need not pass Luhn): for CORPUS SCRUBBING the
cheap false positive is the right trade — redacting a non-card number
costs nothing, leaking a real one costs a lawsuit. Callers needing
precision post-filter the ``pii_counts`` hits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement tag). Dict order is NOT semantic —
# application order is sorted(name) everywhere.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "card": r"\b[0-9]{13,16}\b",
}


def _types(types: list[str] | None) -> list[str]:
    out = sorted(types) if types is not None else sorted(PII_PATTERNS)
    unknown = [t for t in out if t not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII types {unknown}; have {sorted(PII_PATTERNS)}"
        )
    if not out:
        raise ValueError("no PII types selected")
    return out


def pii_count_cols(
    text: Column, types: list[str] | None = None
) -> list[Column]:
    """One ``n_<type>`` count column per PII type — a codegen
    ``size(regexp_extract_all(...))`` each. NULL text counts as 0
    matches (``size(NULL)`` is -1 under Spark's default
    ``spark.sql.legacy.sizeOfNull`` — a NULL document has no PII, not
    negative PII, and a -1 would silently deflate ``pii_report`` sums)."""
    safe = F.coalesce(text, F.lit(""))
    return [
        F.size(F.regexp_extract_all(safe, F.lit(PII_PATTERNS[t]), F.lit(0)))
        .cast("long")
        .alias(f"n_{t}")
        for t in _types(types)
    ]


def redact_expr(text: Column, types: list[str] | None = None) -> Column:
    """Redacted text: each match replaced by ``[<TYPE>]``, types
    applied in sorted-name order (both engines must chain
    identically — order changes results where patterns overlap, e.g.
    ssn before phone)."""
    out = text
    for t in _types(types):
        out = F.regexp_replace(out, PII_PATTERNS[t], f"[{t.upper()}]")
    return out


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
    redact: bool = True,
) -> DataFrame:
    """Per-document PII scan: input columns + ``n_<type>`` counts and
    (with ``redact``) a ``redacted`` text column. One projection.
    NULL text rows get zero counts and a NULL ``redacted`` (faithful
    passthrough — redaction never invents an empty document)."""
    ts = _types(types)
    new_names = {f"n_{t}" for t in ts} | ({"redacted"} if redact else set())
    clash = {c for c in df.columns if c.lower() in new_names}
    if clash:
        # Spark resolves case-insensitively — re-running the scan on
        # its own output would otherwise produce ambiguous duplicates
        raise ValueError(
            f"pii_scan output columns collide with input columns "
            f"{sorted(clash)}; rename or drop them first"
        )
    text = F.col(text_col)
    cols = [F.col(c) for c in df.columns] + pii_count_cols(text, ts)
    if redact:
        cols.append(redact_expr(text, ts).alias("redacted"))
    return df.select(*cols)


def pii_report(
    df: DataFrame, text_col: str = "text", types: list[str] | None = None
) -> DataFrame:
    """Corpus-level report: ``(pii_type, n_matches, n_docs)`` — total
    matches and documents containing >=1, one partial-agg pass for all
    types (unpivoted from a single-row aggregate, never one job per
    type)."""
    ts = _types(types)
    # same NULL-text convention as pii_count_cols: 0 matches, never -1
    text = F.coalesce(F.col(text_col), F.lit(""))
    aggs = []
    for t in ts:
        n = F.size(
            F.regexp_extract_all(text, F.lit(PII_PATTERNS[t]), F.lit(0))
        )
        aggs.append(F.sum(n.cast("long")).alias(f"m_{t}"))
        aggs.append(
            F.sum(F.when(n > 0, 1).otherwise(0)).cast("long").alias(f"d_{t}")
        )
    one = df.agg(*aggs)
    pairs = ", ".join(f"'{t}', named_struct('m', m_{t}, 'd', d_{t})" for t in ts)
    return one.select(
        F.explode(F.expr(f"map({pairs})")).alias("pii_type", "_s")
    ).select(
        "pii_type",
        F.col("_s.m").alias("n_matches"),
        F.col("_s.d").alias("n_docs"),
    )
