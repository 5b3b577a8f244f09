"""Quality signals, PII redaction, and range join semantics on
synthetic inputs richer than the generated documents table (newlines,
bullets, duplicate lines, live PII strings)."""

import datetime as dt

from pyspark.sql import functions as F

from featureform_spark.functions.quality import quality_signals, redact_pii
from featureform_spark.operators.range_join import range_join


def test_quality_signals_repetition_and_shape(spark):
    docs = spark.createDataFrame(
        [
            # 3 lines, two identical after trim; third starts with a bullet
            (1, "aa bb cc\n  aa bb cc  \n- dd ee ff"),
            # single token (bigram guard)
            (2, "hello"),
            # ellipsis line + symbols
            (3, "wait for it...\n$$$ %% @@"),
            # repeated bigram on one line: 6 tokens, 5 bigrams, 2 distinct
            (4, "x y x y x y"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in quality_signals(docs).collect()}

    r1 = rows[1]
    assert abs(r1["dup_line_frac"] - 1 / 3) < 1e-12
    assert abs(r1["bullet_line_frac"] - 1 / 3) < 1e-12

    r2 = rows[2]
    assert r2["n_tokens"] == 1
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["keep"] == 0  # too short

    r3 = rows[3]
    assert abs(r3["ellipsis_line_frac"] - 1 / 2) < 1e-12
    assert r3["symbol_ratio"] > 0.2
    assert r3["keep"] == 0

    assert abs(rows[4]["dup_bigram_frac"] - 3 / 5) < 1e-12


def test_quality_signals_keep_on_clean_doc(spark):
    # fully distinct tokens -> zero repetition, all-alpha words
    text = " ".join(f"wa{i} wb{i} wc{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = quality_signals(docs).collect()[0]
    assert row["keep"] == 1
    assert row["alpha_word_ratio"] == 1.0
    assert row["dup_bigram_frac"] == 0.0


def test_redact_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.1 port 80"),
            (3, "call +1 (415) 555-0100 today"),
            (4, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> port 80"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "clean text with no pii at all"


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_range_join_matches_naive_theta_join(spark):
    events = spark.createDataFrame(
        [(i, _ts(1 + i % 28, i % 24), i % 5) for i in range(200)],
        ["eid", "ets", "key"],
    )
    # intervals of widely varying width, incl. bucket-straddling ones
    intervals = spark.createDataFrame(
        [
            (100 + j, _ts(1 + j % 20), _ts(1 + j % 20 + (j % 3) * 3, 12), j % 5)
            for j in range(40)
        ],
        ["iid", "start", "end", "key"],
    )

    fast = range_join(
        events, intervals, "ets", "start", "end", on=["key"], bucket_seconds=86400
    )
    naive = events.join(
        intervals.withColumnRenamed("key", "k2"),
        on=[
            F.col("key") == F.col("k2"),
            F.col("ets") >= F.col("start"),
            F.col("ets") < F.col("end"),
        ],
    ).select("eid", "iid")

    fast_pairs = sorted((r["eid"], r["iid"]) for r in fast.select("eid", "iid").collect())
    naive_pairs = sorted((r["eid"], r["iid"]) for r in naive.collect())
    assert fast_pairs == naive_pairs
    assert len(fast_pairs) > 0


def test_range_join_exclusive_end_on_bucket_boundary(spark):
    # interval ends exactly at a bucket boundary: the end bucket must not
    # be probed, and a probe exactly at end must not match
    events = spark.createDataFrame(
        [(1, _ts(2)), (2, _ts(1, 12)), (3, _ts(1))], ["eid", "ets"]
    )
    intervals = spark.createDataFrame([(10, _ts(1), _ts(2))], ["iid", "start", "end"])
    got = sorted(
        r["eid"]
        for r in range_join(
            events, intervals, "ets", "start", "end", bucket_seconds=86400
        ).collect()
    )
    assert got == [2, 3]


def test_repetition_signals_exact_fractions(spark):
    """Hand-computed Gopher char fractions on a crafted doc."""
    from featureform_spark.functions.quality import repetition_signals

    # doc a: "x y x y x y" -> bigrams: "x y"(3), "y x"(2)
    #   chars: 3*3 + 2*3 = 15, top = 9 -> top2 = 0.6
    # doc b: no repetition; doc c: 1 token (no bigrams at all)
    df = spark.createDataFrame(
        [
            ("a", "x y x y x y"),
            ("b", "all tokens here are fresh words"),
            ("c", "solo"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in repetition_signals(df).collect()
    }
    assert abs(got["a"]["top2_char_frac"] - 9 / 15) < 1e-12
    # tokens [x,y,x,y,x,y] -> 5-grams: "x y x y x"(1), "y x y x y"(1)
    assert got["a"]["dup5_char_frac"] == 0.0
    assert got["a"]["keep_repetition"] == 0  # top2 0.6 >= 0.20
    # doc b bigram chars: 10+11+8+9+11 = 49, max 11 ("tokens here" /
    # "fresh words" tie on product) -> 11/49; tiny docs legitimately
    # exceed the Gopher thresholds (they are tuned for real documents;
    # the n_tokens >= 10 shape rule handles shorts)
    assert abs(got["b"]["top2_char_frac"] - 11 / 49) < 1e-12
    assert got["c"]["top2_char_frac"] == 0.0
    assert got["c"]["keep_repetition"] == 1
    # a long clean doc passes every threshold
    clean = " ".join(f"word{i:03d}" for i in range(200))
    r = repetition_signals(
        spark.createDataFrame(
            [("e", clean)], "doc_id string, text string"
        )
    ).collect()[0]
    assert r["top2_char_frac"] < 0.20 and r["keep_repetition"] == 1

    # duplicated 5-gram coverage: "a b c d e" twice + unique tail
    df2 = spark.createDataFrame(
        [("d", "a b c d e a b c d e")], "doc_id string, text string"
    )
    r = repetition_signals(df2).collect()[0]
    # 5-grams (6): positions 0..5; "a b c d e" occurs at 0 and 5 ->
    # occ=2, ch=9 -> dup chars 18; total = 18 + 4*9 = 54
    assert abs(r["dup5_char_frac"] - 18 / 54) < 1e-12
    assert r["keep_repetition"] == 0  # dup5 0.33 >= 0.15


def test_readability_hand_computed(spark):
    from featureform_spark.functions.quality import readability

    df = spark.createDataFrame(
        [(0, "the cat sat. it was flat! ok?"),
         (1, "no punctuation here at all"),
         (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability(df).collect()}
    r0 = out[0]
    # words=7, sentence runs=3 ('.','!','?'), vowel groups:
    # e,a,a,i,a,a,o = 7
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (7, 3, 7)
    expect = 206.835 - 1.015 * (7.0 / 3.0) - 84.6 * (7.0 / 7.0)
    assert out[0]["flesch"] == expect
    assert out[1]["n_sentences"] == 1  # floor
    assert out[2]["flesch"] is None and out[2]["n_words"] == 0


def test_code_detect_routes_code_vs_prose(spark):
    from featureform_spark.functions.quality import code_detect

    code = (
        "def f(x):\n    y = [i for i in range(x)];\n    return {z: y}\n"
        "class A:\n    pass"
    )
    prose = (
        "the committee reviewed the proposal in detail and concluded "
        "that the budget was reasonable but the timeline needed more time"
    )
    df = spark.createDataFrame(
        [(0, code), (1, prose), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in code_detect(df).collect()}
    assert out[0]["is_code"] and not out[1]["is_code"]
    assert out[0]["indent_frac"] > 0.3
    assert out[1]["symbol_density"] == 0.0
    assert not out[2]["is_code"] and out[2]["symbol_density"] == 0.0
