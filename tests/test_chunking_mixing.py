"""Chunking, token diversity, and corpus mixing semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.chunking import chunk_documents
from featureform_spark.functions.text import token_diversity
from featureform_spark.operators.mixing import mix_corpus, mix_summary
from tests.test_plans import plan_of, shuffle_exchanges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_chunk_exact_multiple(spark):
    # 10 tokens, chunk 4 overlap 2 (stride 2): starts 0,2,4,6 -> ceil(8/2)=4
    df = _docs(spark, [" ".join(f"t{i}" for i in range(10))])
    out = chunk_documents(df, chunk_size=4, overlap=2).orderBy("chunk_id").collect()
    assert [r["chunk_text"] for r in out] == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 4, 4]


def test_chunk_partial_tail_and_short_doc(spark):
    df = _docs(spark, ["a b c d e", "x", ""])
    out = chunk_documents(df, chunk_size=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # 5 tokens, stride 3: ceil(4/3)=2 chunks; tail has 2 tokens
    assert rows[(0, 0)]["chunk_text"] == "a b c d"
    assert rows[(0, 1)]["chunk_text"] == "d e"
    # short and empty docs still yield exactly one chunk
    assert rows[(1, 0)]["chunk_text"] == "x"
    assert rows[(2, 0)]["chunk_text"] == ""
    assert len(rows) == 4


def test_chunk_validation(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, ["a"]), chunk_size=4, overlap=4)


def test_chunk_zero_shuffle_plan(spark):
    df = _docs(spark, ["a b c"] * 5)
    assert shuffle_exchanges(plan_of(chunk_documents(df, 8, 2))) == 0


def test_token_diversity_math(spark):
    # "a a a b": n=4, distinct=2, sum c^2 = 9+1 -> simpson 1-10/16, top 3/4
    df = _docs(spark, ["a a a b"])
    [r] = token_diversity(df).collect()
    assert (r["n_tokens"], r["n_distinct"]) == (4, 2)
    assert r["simpson_diversity"] == pytest.approx(1 - 10 / 16)
    assert r["top_token_ratio"] == pytest.approx(3 / 4)


def _corpus(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_mix_proportions_and_determinism(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    weights = {"s0": 6, "s1": 3, "s2": 1}
    a = mix_corpus(df, "source", weights, ["doc_id"])
    counts = {r["source"]: r["n"] for r in
              a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # binding source is s0 (needs 60%): kept in full, others thresholded
    assert counts["s0"] == 1000
    assert counts["s1"] == pytest.approx(500, abs=80)
    assert counts["s2"] == pytest.approx(167, abs=60)
    # deterministic: second run identical
    b = mix_corpus(df, "source", weights, ["doc_id"])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_mix_drops_unlisted_sources(spark):
    df = _corpus(spark, {"keep": 10, "drop": 10})
    out = mix_corpus(df, "source", {"keep": 1}, ["doc_id"])
    assert {r["source"] for r in out.select("source").distinct().collect()} == {"keep"}
    assert out.count() == 10  # single listed source -> kept whole


def test_mix_validation(spark):
    df = _corpus(spark, {"a": 1})
    with pytest.raises(ValueError, match="integer parts"):
        mix_corpus(df, "source", {"a": 0}, ["doc_id"])
    with pytest.raises(ValueError, match="integer parts"):
        mix_corpus(df, "source", {}, ["doc_id"])


def test_mix_summary_fracs_sum_to_one(spark):
    df = _corpus(spark, {"a": 40, "b": 40})
    out = mix_summary(df, "source", {"a": 1, "b": 1}, ["doc_id"]).collect()
    assert sum(r["achieved_frac"] for r in out) == pytest.approx(1.0)


def test_mix_no_wide_shuffle_of_corpus(spark):
    # the corpus-sized path must be scan+filter with broadcast joins only;
    # the only exchanges allowed are for the tiny counts/min aggregates
    df = _corpus(spark, {"a": 50, "b": 50})
    plan = plan_of(mix_corpus(df, "source", {"a": 1, "b": 1}, ["doc_id"]))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_keep_canonical_clusters(spark):
    from featureform_spark.functions.dedup import keep_canonical

    docs = _docs(spark, ["a", "b", "c", "d", "e"])  # ids 0..4
    # chain 0-1-2 and pair 3-4 -> keep 0, 3; doc ids not in pairs pass
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], ["id_a", "id_b"]
    )
    kept = sorted(
        r["doc_id"] for r in keep_canonical(docs, pairs).collect()
    )
    assert kept == [0, 3]


def test_keep_canonical_untouched_pass_through(spark):
    from featureform_spark.functions.dedup import keep_canonical

    docs = _docs(spark, ["a", "b", "c"])
    pairs = spark.createDataFrame([(0, 1)], ["id_a", "id_b"])
    assert sorted(
        r["doc_id"] for r in keep_canonical(docs, pairs).collect()
    ) == [0, 2]


def test_upsample_whole_epochs_exact(spark):
    from featureform_spark.operators.mixing import upsample_epochs

    df = _corpus(spark, {"a": 10, "b": 10, "c": 10})
    out = upsample_epochs(df, "source", {"a": 3.0, "b": 1.0}, ["doc_id"])
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 30, "b": 10}  # c dropped entirely
    epochs = {r["epoch"] for r in out.filter(F.col("source") == "a")
              .select("epoch").distinct().collect()}
    assert epochs == {0, 1, 2}


def test_upsample_fractional_deterministic(spark):
    from featureform_spark.operators.mixing import upsample_epochs

    df = _corpus(spark, {"a": 400})
    a = upsample_epochs(df, "source", {"a": 1.5}, ["doc_id"])
    n = a.count()
    assert 400 < n < 800 and abs(n - 600) < 80
    b = upsample_epochs(df, "source", {"a": 1.5}, ["doc_id"])
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # sub-1.0 epochs downsample
    half = upsample_epochs(df, "source", {"a": 0.5}, ["doc_id"])
    assert 0 < half.count() < 400
    assert half.select("epoch").distinct().collect()[0]["epoch"] == 0


def test_upsample_validation_and_plan(spark):
    from featureform_spark.operators.mixing import upsample_epochs

    df = _corpus(spark, {"a": 5})
    with pytest.raises(ValueError, match="non-negative"):
        upsample_epochs(df, "source", {"a": -1.0}, ["doc_id"])
    plan = plan_of(upsample_epochs(df, "source", {"a": 2.0}, ["doc_id"]))
    assert shuffle_exchanges(plan) == 0


def test_quality_weighted_sample_props(spark):
    from featureform_spark.operators.mixing import quality_weighted_sample

    rows = [(i, 1.0 if i < 50 else (0.0 if i < 100 else 0.5)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "q"])
    kept = quality_weighted_sample(df, "q", ["id"]).select("id").collect()
    ids = {r["id"] for r in kept}
    assert all(i in ids for i in range(50))          # p=1 -> always kept
    assert all(i not in ids for i in range(50, 100))  # p=0 -> always dropped
    mid = sum(1 for i in ids if i >= 100)
    assert 25 <= mid <= 75                            # p=0.5 on 100 rows
    # deterministic under re-evaluation
    again = {r["id"] for r in quality_weighted_sample(df, "q", ["id"]).select("id").collect()}
    assert ids == again
    # scale=2 keeps everything at q >= 0.5 surely
    scaled = {r["id"] for r in quality_weighted_sample(df, "q", ["id"], scale=2.0).select("id").collect()}
    assert all(i in scaled for i in list(range(50)) + list(range(100, 200)))


def test_sample_k_per_group_exact_counts(spark):
    from featureform_spark.operators.mixing import sample_k_per_group

    rows = [(i, "big" if i < 100 else "small") for i in range(110)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = sample_k_per_group(df, "grp", 20, ["id"])
    sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 20, "small": 10}  # min(k, group size)
    a = {r["id"] for r in out.collect()}
    b = {r["id"] for r in sample_k_per_group(df, "grp", 20, ["id"]).collect()}
    assert a == b  # deterministic
    c = {r["id"] for r in sample_k_per_group(df, "grp", 20, ["id"], seed=7).collect()}
    assert a != c  # seed changes the selection
    import pytest as _pt
    with _pt.raises(ValueError):
        sample_k_per_group(df, "grp", 0, ["id"])


# ------------------------------------------------ temperature mixing


def test_temperature_weights_exact_and_refusals():
    import math

    from featureform_spark.operators.mixing import (
        TEMP_W_SCALE,
        temperature_weights,
    )

    counts = {"a": 10000, "b": 100, "c": 1}
    w = temperature_weights(counts, 0.5)
    assert w == {
        s: int(math.floor(math.sqrt(n) * TEMP_W_SCALE))
        for s, n in counts.items()
    }
    # alpha < 1 compresses the spread: a/c raw ratio 10000x, weight
    # ratio 100x at alpha=0.5, ~10x at 0.25
    assert w["a"] / w["c"] == pytest.approx(100.0, rel=1e-9)
    w25 = temperature_weights(counts, 0.25)
    assert w25["a"] / w25["c"] == pytest.approx(10.0, rel=1e-6)
    with pytest.raises(ValueError, match="0.25/0.5/0.75"):
        temperature_weights(counts, 0.3)
    with pytest.raises(ValueError, match="no sources"):
        temperature_weights({}, 0.5)
    # zero-count sources drop rather than divide-by-zero later
    assert "z" not in temperature_weights({"a": 5, "z": 0}, 0.5)


def test_temperature_mix_shifts_toward_uniform(spark):
    from featureform_spark.operators.mixing import temperature_mix

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = temperature_mix(df, "source", ["doc_id"], alpha=0.5)
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # raw share big:small = 9:1; alpha=0.5 target = sqrt(9000):sqrt(1000)
    # = 3:1. The small source is fully kept (K anchors on it).
    assert got["small"] == pytest.approx(1000, abs=60)
    assert got["big"] / got["small"] == pytest.approx(3.0, rel=0.1)
    # deterministic under repartitioning
    again = temperature_mix(
        df.repartition(13), "source", ["doc_id"], alpha=0.5
    )
    assert sorted(r["doc_id"] for r in mixed.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_iroot_matches_definition():
    from featureform_spark.operators.mixing import _iroot

    import random

    rng = random.Random(7)
    cases = [0, 1, 2, 63, 64, 65, 10**6, 2**64, 2**200 + 12345]
    cases += [rng.getrandbits(180) for _ in range(50)]
    for n in cases:
        for k in (1, 2, 3, 7, 10):
            r = _iroot(n, k)
            assert r**k <= n < (r + 1) ** k, (n, k, r)


def test_temperature_weights_exact_is_floor_by_definition():
    """w = floor(n^(7/10) * 2^20)  <=>  w^10 <= n^7 * 2^200 < (w+1)^10
    — checked straight from the definition, independent of _iroot's
    implementation."""
    from featureform_spark.operators.mixing import (
        temperature_weights_exact,
    )

    counts = {"a": 9000, "b": 1000, "c": 1, "d": 7_777_777_777}
    w = temperature_weights_exact(counts, (7, 10))
    for s, n in counts.items():
        target = n**7 << 200
        assert w[s] ** 10 <= target < (w[s] + 1) ** 10, s

    with pytest.raises(ValueError, match="positive rational"):
        temperature_weights_exact(counts, (0, 10))
    with pytest.raises(ValueError, match="> 8"):
        temperature_weights_exact(counts, (90, 10))


def test_temperature_mix_alpha_07_duckdb_oracle(spark):
    """Verdict r10 task #7 done-criterion: the full alpha=0.7 pipeline
    against a DuckDB oracle. Weight literals are recomputed here from
    the floor definition (not by calling the library), then the oracle
    replays the exact-integer threshold selection of mix_corpus."""
    import duckdb

    from featureform_spark.operators.mixing import temperature_mix

    rows = [(i, "big" if i < 9000 else ("mid" if i < 9800 else "small"))
            for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"])
        for r in temperature_mix(
            df, "source", ["doc_id"], alpha=(7, 10)
        ).collect()
    )

    # independent weight derivation: binary search the floor
    def floor_pow(n, p=7, q=10, scale=20):
        target = n**p << (scale * q)
        lo, hi = 0, 1 << ((n.bit_length() * p) // q + scale + 2)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if mid**q <= target:
                lo = mid
            else:
                hi = mid - 1
        return lo

    counts = {"big": 9000, "mid": 800, "small": 200}
    w = {s: floor_pow(n) for s, n in counts.items()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}')" for i, s in rows)
        + ") t(doc_id, source)"
    )
    wvals = ", ".join(
        f"('{s}', {n}::HUGEINT, {w[s]}::HUGEINT)"
        for s, n in counts.items()
    )
    oracle = con.execute(
        f"""
        WITH w(source, n, w) AS (VALUES {wvals}),
        tw AS (SELECT SUM(w)::HUGEINT AS wt FROM w),
        k AS (SELECT MIN(n * tw.wt // w.w) AS k FROM w, tw),
        thr AS (SELECT source,
                       4294967296::HUGEINT * w * k.k // (tw.wt * n) AS t
                FROM w, k, tw)
        SELECT d.doc_id, d.source
        FROM docs d JOIN thr ON d.source = thr.source
        WHERE CAST(('0x' || substr(md5(d.doc_id::VARCHAR || '#42'), 1, 8))
                   AS UBIGINT) < thr.t
        ORDER BY d.doc_id
        """
    ).fetchall()
    assert got == [(r[0], r[1]) for r in oracle]
    assert len(got) > 0


def test_temperature_exact_refuses_huge_denominator():
    from featureform_spark.operators.mixing import temperature_weights_exact

    with pytest.raises(ValueError, match="denominator"):
        temperature_weights_exact({"a": 10}, (1, 500_000))
