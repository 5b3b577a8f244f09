"""Data-quality expectations: declarative rules validated in ONE scan.

The validation pass every production pipeline runs between ingest and
publish (dbt tests / Great Expectations semantics), shaped for 100 TB:
all rules — however many — compile into a SINGLE aggregation over ONE
scan of the table. Each rule becomes a conditional-count expression
(``sum(case when violated then 1 end)``); uniqueness rules add
``count(distinct col)`` terms that Spark's multi-distinct Expand
handles inside the same shuffle. The per-rule report then explodes
from the one aggregated row — no second scan, no per-rule jobs.

Row-level triage (``quarantine``) is likewise one projection: each row
gets the array of rule names it violates and splits into (clean,
quarantined) DataFrames off the same cached plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(Exception):
    """Raised by ``enforce`` when any rule has violations."""


@dataclass(frozen=True)
class Rule:
    """A named expectation. ``condition`` is the PASS predicate (a
    Column); rows where it is false or NULL count as violations.
    ``distinct_on`` marks uniqueness rules (handled with a
    count-distinct term instead of a row predicate)."""

    name: str
    condition: Column | None = None
    distinct_on: str | None = None
    meta: dict = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNotNull())


def unique(col: str) -> Rule:
    return Rule(f"unique({col})", distinct_on=col)


def accepted_values(col: str, values: list[Any]) -> Rule:
    return Rule(
        f"accepted_values({col})",
        F.col(col).isin(list(values)),
    )


def in_range(col: str, lo: Any, hi: Any) -> Rule:
    return Rule(
        f"in_range({col})",
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)),
    )


def matches_regex(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches_regex({col})",
        F.col(col).rlike(pattern),
    )


def freshness(col: str, max_age: str) -> Rule:
    """Recency gate: every row's ``col`` must be within ``max_age``
    (an INTERVAL string, e.g. "2 days") of now — the most common
    pipeline check after not_null. Time-dependent by nature: the same
    table can pass today and fail tomorrow."""
    return Rule(
        f"freshness({col})",
        F.col(col)
        >= F.current_timestamp() - F.expr(f"INTERVAL {max_age}"),
    )


def custom(name: str, condition: Column) -> Rule:
    return Rule(name, condition)


def expect(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Validate all rules in one scan. Returns one row per rule:
    (rule, total_rows, violations, passed). A NULL evaluation of a
    pass-predicate counts as a violation (NULL o_custkey fails
    ``in_range`` just like an out-of-range one — the dbt convention).
    Uniqueness violations are ``count(rows with non-null col) −
    count(distinct col)`` (NULLs don't collide, matching SQL UNIQUE)."""
    if not rules:
        raise ValueError("expect: no rules")
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, r in enumerate(rules):
        if r.distinct_on is not None:
            aggs.append(
                (
                    F.count(F.col(r.distinct_on))
                    - F.countDistinct(F.col(r.distinct_on))
                ).alias(f"_v{i}")
            )
        else:
            # coalesce: sum() over ZERO rows is NULL, and a NULL
            # violation count reads as a failure in enforce() — an
            # empty table passes every predicate rule vacuously
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(r.condition, F.lit(0)).otherwise(F.lit(1))
                    ),
                    F.lit(0),
                ).alias(f"_v{i}")
            )
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"_v{i}").cast("long").alias("violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return (
        one.select(
            F.col("_total").cast("long").alias("total_rows"),
            F.explode(pairs).alias("p"),
        )
        .select(
            F.col("p.rule").alias("rule"),
            "total_rows",
            F.col("p.violations").alias("violations"),
            (F.col("p.violations") == 0).alias("passed"),
        )
    )


def enforce(df: DataFrame, rules: list[Rule]) -> None:
    """Run ``expect`` and raise ``ExpectationError`` naming every
    failed rule with its violation count — the gate a publish step
    calls before committing a snapshot."""
    failed = [
        (r["rule"], r["violations"])
        for r in expect(df, rules).collect()
        if not r["passed"]
    ]
    if failed:
        detail = ", ".join(f"{n}: {v} violations" for n, v in failed)
        raise ExpectationError(f"expectations failed — {detail}")


def quarantine(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Row-level triage in one projection: returns (clean, quarantined)
    where quarantined rows carry ``_violations`` (the array of rule
    names the row fails). Both sides share one (uncached) plan —
    materializing both re-reads the input; callers that consume both
    (e.g. the streaming quarantine sink) should pin the input first
    (``localCheckpoint``), which ``stream_quarantine`` does.
    Uniqueness rules are aggregate-level and cannot mark individual
    rows — passing one here raises."""
    for r in rules:
        if r.distinct_on is not None:
            raise ValueError(
                f"quarantine: {r.name} is aggregate-level (uniqueness) "
                "— row triage cannot attribute it; use expect()"
            )
    viols = F.filter(
        F.array(
            *[
                F.when(r.condition, F.lit(None).cast("string")).otherwise(
                    F.lit(r.name)
                )
                for r in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    marked = df.withColumn("_violations", viols)
    clean = marked.where(F.size("_violations") == 0).drop("_violations")
    bad = marked.where(F.size("_violations") > 0)
    return clean, bad


def sample_violations(
    df: DataFrame,
    rules: list[Rule],
    n: int = 5,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """≤``n`` DETERMINISTIC example rows per failed rule — the
    debugging companion to :func:`expect`'s counts (production triage
    needs to see offending rows, not just that 2,311 exist).

    One extra scan, never per-rule jobs: the same one-projection
    violation marking ``quarantine`` uses, exploded to (rule, row)
    pairs (violation-scale, not table-scale), then ranked per rule by
    ``md5(key_cols ⊕ rule)`` with a single window — stable across
    runs, partitionings, and engines, unlike LIMIT's
    first-partition-wins sample. ``key_cols`` (default: all columns)
    feed the hash; pass a unique key for fully deterministic picks
    when rows can collide on the hashed columns. Output:
    (rule, sample_rank, *original columns). Uniqueness rules are
    aggregate-level and refuse, same as ``quarantine``."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError("sample_violations: n must be >= 1")
    for r in rules:
        if r.distinct_on is not None:
            raise ValueError(
                f"sample_violations: {r.name} is aggregate-level "
                "(uniqueness) — row sampling cannot attribute it; "
                "use expect()"
            )
    reserved = {"rule", "sample_rank", "_rk", "_salt", "_r1", "_violations"}
    clash = reserved & {c.lower() for c in df.columns}
    if clash:
        # Spark resolves columns case-insensitively, so explode(...)
        # .alias('rule') next to an input 'rule'/'RULE' column makes
        # F.col('rule') ambiguous (or silently binds the wrong one).
        raise ValueError(
            "sample_violations: input columns collide with internal "
            f"names {sorted(clash)}; rename them first"
        )
    _, bad = quarantine(df, rules)
    exploded = bad.select(
        F.explode("_violations").alias("rule"), "*"
    ).drop("_violations")
    keys = key_cols or df.columns
    rank_key = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.col(c).cast("string") for c in keys],
            F.col("rule"),
        )
    )
    # Two-phase top-n: a single window partitioned by rule alone would
    # run ONE task per rule (3 rules = 3-way parallelism over every
    # violation — 8.9x at x100 in the round-10 scale stress). Phase 1
    # ranks within (rule, salt) — salt derived from the rank key
    # itself, so it is deterministic — and keeps n per salt; the
    # global top-n by md5 is necessarily a subset of the per-salt
    # top-ns. Phase 2 re-ranks the <= n*S survivors per rule. Same
    # output, violation-scale work fans across S*rules tasks.
    n_salts = 32
    salted = exploded.withColumn("_rk", rank_key).withColumn(
        "_salt",
        F.conv(F.substring("_rk", 1, 4), 16, 10).cast("long")
        % n_salts,
    )
    w1 = Window.partitionBy("rule", "_salt").orderBy("_rk")
    survivors = salted.withColumn(
        "_r1", F.row_number().over(w1)
    ).where(F.col("_r1") <= n)
    w2 = Window.partitionBy("rule").orderBy("_rk")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= n)
        .select("rule", "sample_rank", *df.columns)
    )
