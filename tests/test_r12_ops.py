"""Round-12 operators: embedding-space drift (functions/drift.py),
PIT leakage audit (operators/audit.py), per-source dedup scorecard
(functions/dedup.py). Hand-computed fixtures + DuckDB differentials
on the hash-compared surfaces + plan-shape pins for the scale claims.
(The suite rows themselves also run under tests/test_oracle_parity.py
against the full DuckDB oracles.)
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.dedup import dedup_report_by_source
from featureform_spark.functions.drift import (
    drift_report_embedding,
    embedding_compare,
)
from featureform_spark.functions.similarity import hyperplane_signs
from featureform_spark.operators.audit import pit_leakage_audit

DIM, PLANES = 4, 3


def _expected_bucket(vec):
    signs = hyperplane_signs(PLANES, DIM)
    return "".join(
        "1" if float(np.dot(np.asarray(vec), np.asarray(p))) >= 0 else "0"
        for p in signs
    )


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v] if v is not None else None)
         for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_embedding_compare_hand_buckets(spark):
    vecs = [[1, 0, 0, 0], [0, 1, 0, 0], [-1, -1, -1, -1], [2, -3, 1, 0]]
    ref = _emb_df(spark, vecs)
    cur = _emb_df(spark, vecs[:2])
    rows = {
        r["bucket"]: (r["ref_count"], r["cur_count"])
        for r in embedding_compare(
            ref, cur, "embedding", dim=DIM, num_planes=PLANES
        ).collect()
    }
    expect_ref = {}
    for v in vecs:
        b = _expected_bucket(v)
        expect_ref[b] = expect_ref.get(b, 0) + 1
    assert {b: rc for b, (rc, _) in rows.items() if rc} == expect_ref
    assert sum(cc for _, cc in rows.values()) == 2


def test_embedding_compare_null_bucket_and_report(spark):
    vecs = [[1, 0, 0, 0], [0, 1, 0, 0]]
    ref = _emb_df(spark, vecs)
    cur = _emb_df(spark, vecs + [None, None, None])
    rows = {
        r["bucket"]: (r["ref_count"], r["cur_count"])
        for r in embedding_compare(
            ref, cur, "embedding", dim=DIM, num_planes=PLANES
        ).collect()
    }
    assert rows["__null__"] == (0, 3)
    # identical frames -> no drift; negation flips sign buckets -> drift
    same = drift_report_embedding(ref, ref, "embedding", DIM, PLANES)
    assert same == pytest.approx(0.0, abs=1e-12)
    neg = ref.withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    assert drift_report_embedding(ref, neg, "embedding", DIM, PLANES) > 0.25


def test_embedding_compare_matches_bucket_expr(spark):
    """The Arrow kernel used by the drift histogram is bit-identical
    to the pure HOF bucket expression (the DuckDB-oracle semantics)."""
    from featureform_spark.functions.similarity import _as_double, bucket_expr

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(64, DIM)).tolist()
    df = _emb_df(spark, vecs)
    via_expr = {
        r["bucket"]: r["n"]
        for r in df.select(
            bucket_expr(_as_double(F.col("embedding")), DIM, PLANES).alias(
                "bucket"
            )
        ).groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    via_kernel = {
        r["bucket"]: r["ref_count"]
        for r in embedding_compare(
            df, df.limit(0), "embedding", dim=DIM, num_planes=PLANES
        ).collect()
    }
    assert via_kernel == via_expr


def test_embedding_compare_validation(spark):
    df = _emb_df(spark, [[1, 0, 0, 0]])
    with pytest.raises(ValueError, match="num_planes"):
        embedding_compare(df, df, "embedding", dim=DIM, num_planes=0)
    with pytest.raises(ValueError, match="num_planes"):
        embedding_compare(df, df, "embedding", dim=DIM, num_planes=21)
    bad = embedding_compare(df, df, "embedding", dim=7, num_planes=2)
    with pytest.raises(Exception, match="dim"):
        bad.collect()


def _audit_fixture(spark):
    feats = spark.createDataFrame(
        [
            ("e1", "2024-01-01 00:00:01", 10.0),
            ("e1", "2024-01-01 00:00:05", 20.0),
            ("e3", "2024-01-01 00:00:09", 7.0),
            # e4: equal-ts duplicates -> max-value-wins
            ("e4", "2024-01-01 00:00:02", 5.0),
            ("e4", "2024-01-01 00:00:02", 9.0),
        ],
        "entity string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [
            ("e1", "2024-01-01 00:00:03"),  # between features: leak
            ("e1", "2024-01-01 00:00:05"),  # equal ts: visible, no leak
            ("e2", "2024-01-01 00:00:01"),  # no features at all
            ("e4", "2024-01-01 00:00:02"),  # dup features at label ts
            ("e4", "2024-01-01 00:00:01"),  # before both dups
        ],
        "entity string, ts string",
    )
    return labels, feats


def test_pit_leakage_audit_semantics(spark):
    labels, feats = _audit_fixture(spark)
    out = {
        (r["entity"], str(r["label_ts"])): (
            r["pit_value"], r["naive_value"], r["leaked"], r["n_future"]
        )
        for r in pit_leakage_audit(labels, feats).collect()
    }
    assert len(out) == 5
    assert out[("e1", "2024-01-01 00:00:03")] == (10.0, 20.0, 1, 1)
    assert out[("e1", "2024-01-01 00:00:05")] == (20.0, 20.0, 0, 0)
    assert out[("e2", "2024-01-01 00:00:01")] == (None, None, 0, 0)
    assert out[("e4", "2024-01-01 00:00:02")] == (9.0, 9.0, 0, 0)
    assert out[("e4", "2024-01-01 00:00:01")] == (None, 9.0, 1, 2)
    # feature-only entities emit no audit rows
    assert not any(e == "e3" for e, _ in out)


def test_pit_leakage_audit_matches_duckdb_asof(spark):
    """pit_value == a true ASOF LEFT JOIN (DuckDB's native operator)
    on a unique-(entity, ts) feature fixture."""
    rng = np.random.default_rng(11)
    feats = [
        (int(e), int(t), float(rng.integers(0, 100)))
        for e in range(8)
        for t in sorted(rng.choice(1000, size=12, replace=False))
    ]
    labels = [
        (int(e), int(t))
        for e in range(10)
        for t in rng.integers(0, 1100, size=6)
    ]
    fdf = spark.createDataFrame(
        [(e, f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}", v)
         for e, t, v in feats],
        "entity long, ts string, value double",
    )
    ldf = spark.createDataFrame(
        [(e, f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}")
         for e, t in labels],
        "entity long, ts string",
    )
    got = sorted(
        (r["entity"], str(r["label_ts"]), r["pit_value"])
        for r in pit_leakage_audit(ldf, fdf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE f AS SELECT * FROM (VALUES %s) t(entity, ts, value)"
        % ", ".join(
            f"({e}, TIMESTAMP '2024-01-01 00:{t // 60:02d}:{t % 60:02d}', {v})"
            for e, t, v in feats
        )
    )
    con.execute(
        "CREATE TABLE l AS SELECT * FROM (VALUES %s) t(entity, ts)"
        % ", ".join(
            f"({e}, TIMESTAMP '2024-01-01 00:{t // 60:02d}:{t % 60:02d}')"
            for e, t in labels
        )
    )
    want = sorted(
        (e, str(ts), v)
        for e, ts, v in con.execute(
            """SELECT l.entity, l.ts, f.value
               FROM l ASOF LEFT JOIN f
                 ON l.entity = f.entity AND f.ts <= l.ts"""
        ).fetchall()
    )
    assert got == want


def test_pit_leakage_audit_single_shuffle(spark):
    """The whole audit — as-of value, naive value, future count, leak
    flag — rides ONE exchange (the union+window formulation; no
    pre-aggregation, no join)."""
    labels, feats = _audit_fixture(spark)
    plan = (
        pit_leakage_audit(labels, feats)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_dedup_report_by_source_hand_fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "x", "A"),
            (1, "X  ", "A"),   # normalizes to the same fingerprint
            (2, "y", "A"),
            (3, "x", "B"),
            (4, "z", "B"),
            (5, None, "B"),
            (6, None, "B"),    # NULL texts form one __null__ class
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r["source"]: r.asDict()
        for r in dedup_report_by_source(docs).collect()
    }
    a, b = rows["A"], rows["B"]
    assert (a["n_docs"], a["n_unique_texts"]) == (3, 2)
    assert (a["n_dup_docs"], a["n_cross_source_dup"]) == (2, 2)
    assert a["dup_rate"] == pytest.approx(2 / 3)
    assert (b["n_docs"], b["n_unique_texts"]) == (4, 3)
    # x (cross-source) + the two NULL docs dup within B
    assert (b["n_dup_docs"], b["n_cross_source_dup"]) == (3, 1)
    assert b["dup_rate"] == pytest.approx(3 / 4)


def test_dedup_report_no_corpus_window(spark):
    """Scale pin: the rollup is partial-agg groupBys + a
    fingerprint-cardinality join — no Window operator anywhere."""
    docs = spark.createDataFrame(
        [(i, f"t{i % 5}", f"s{i % 2}") for i in range(40)],
        "doc_id long, text string, source string",
    )
    plan = (
        dedup_report_by_source(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_contingency_counts_hand_fixture(spark):
    from featureform_spark.operators.encoding import contingency_counts

    df = spark.createDataFrame(
        [(0.0, "a"), (0.0, "a"), (9.0, "b"), (9.0, None), (None, "b")],
        "x double, y string",
    )
    rows = {
        (r["bin"], r["label"]): r["count"]
        for r in contingency_counts(df, ["x"], "y", bins=2).collect()
    }
    # edges over [0, 9], width 4.5: 0.0 -> bin 0, 9.0 -> clamps to 1
    assert rows == {
        (0, "a"): 2,
        (1, "b"): 1,
        (1, "__null__"): 1,
        (-1, "b"): 1,
    }


def test_mi_report_properties(spark):
    import math

    from featureform_spark.operators.encoding import mi_report

    # y fully determined by x-bin -> MI = H(y) = ln 2 (balanced);
    # z independent of y -> MI ~ 0
    rows = [
        (float(i % 2) * 10.0, float(i % 4 < 2), "pos" if i % 2 else "neg")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "x double, z double, y string")
    mi = mi_report(df, ["x", "z"], "y", bins=2)
    assert mi["x"] == pytest.approx(math.log(2), rel=1e-9)
    assert mi["z"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# training-set provenance + freshness (point_in_time_join(provenance=True))
# ---------------------------------------------------------------------------


def _pit_fixture(spark):
    from featureform_spark.operators.training_set import FeatureInput

    feats = spark.createDataFrame(
        [
            (1, "e1", "2024-01-01 00:00:01", 10.0),
            (2, "e1", "2024-01-01 00:00:05", 20.0),
            (3, "e2", "2024-01-01 00:00:04", None),  # null value: no-write
        ],
        "event_id long, entity string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [
            ("e1", "2024-01-01 00:00:03", 1.0),
            ("e1", "2024-01-01 00:00:05", 2.0),
            ("e2", "2024-01-01 00:00:09", 3.0),
        ],
        "entity string, ts string, value double",
    )
    f = FeatureInput(
        name="f1", df=feats, entity_col="entity", value_col="value",
        ts_col="ts", order_col="event_id",
    )
    return labels, f


def test_pit_provenance_semantics(spark):
    from featureform_spark.operators.training_set import point_in_time_join

    labels, f = _pit_fixture(spark)
    out = {
        (r["entity"], str(r["label_ts"])): (r["f1"], str(r["f1__ts"]))
        for r in point_in_time_join(
            labels, [f], label_ts_col="ts", provenance=True
        ).collect()
    }
    assert out[("e1", "2024-01-01 00:00:03")] == (10.0, "2024-01-01 00:00:01")
    assert out[("e1", "2024-01-01 00:00:05")] == (20.0, "2024-01-01 00:00:05")
    # e2's only feature row has a NULL value -> no-write for BOTH the
    # value and its provenance
    assert out[("e2", "2024-01-01 00:00:09")] == (None, "None")


def test_pit_provenance_does_not_change_values(spark):
    from featureform_spark.operators.training_set import point_in_time_join

    labels, f = _pit_fixture(spark)
    plain = sorted(
        map(tuple, point_in_time_join(labels, [f], label_ts_col="ts").collect())
    )
    prov = sorted(
        map(
            tuple,
            point_in_time_join(labels, [f], label_ts_col="ts", provenance=True)
            .drop("f1__ts")
            .collect(),
        )
    )
    assert prov == plain


def test_pit_provenance_lag_reports_raw_ts(spark):
    from featureform_spark.operators.training_set import (
        FeatureInput,
        point_in_time_join,
    )

    labels, f = _pit_fixture(spark)
    lagged = FeatureInput(
        name="f1", df=f.df, entity_col="entity", value_col="value",
        ts_col="ts", order_col="event_id", lag_seconds=3.0,
    )
    out = {
        (r["entity"], str(r["label_ts"])): (r["f1"], str(r["f1__ts"]))
        for r in point_in_time_join(
            labels, [lagged], label_ts_col="ts", provenance=True
        ).collect()
    }
    # t=1 feature becomes visible at t>=4; provenance still says t=1
    assert out[("e1", "2024-01-01 00:00:03")] == (None, "None")
    assert out[("e1", "2024-01-01 00:00:05")] == (10.0, "2024-01-01 00:00:01")


def test_pit_provenance_segmented_matches_standard(spark):
    from featureform_spark.operators.training_set import point_in_time_join

    labels, f = _pit_fixture(spark)
    std = sorted(
        map(
            tuple,
            point_in_time_join(
                labels, [f], label_ts_col="ts", provenance=True
            ).collect(),
        )
    )
    seg = sorted(
        map(
            tuple,
            point_in_time_join(
                labels, [f], label_ts_col="ts", provenance=True,
                time_bucket="2 seconds",
            ).collect(),
        )
    )
    assert seg == std


def test_freshness_report(spark):
    from featureform_spark.operators.audit import freshness_report
    from featureform_spark.operators.training_set import point_in_time_join

    labels, f = _pit_fixture(spark)
    ts_out = point_in_time_join(
        labels, [f], label_ts_col="ts", provenance=True
    )
    row = freshness_report(ts_out, ["f1"]).collect()[0]
    # staleness: e1@3 -> 2s, e1@5 -> 0s; e2 never matched
    assert row["feature"] == "f1"
    assert row["n_rows"] == 3 and row["n_missing"] == 1
    assert row["min_staleness_us"] == 0
    assert row["max_staleness_us"] == 2_000_000
    assert row["sum_staleness_us"] == 2_000_000
    with pytest.raises(ValueError, match="no feature names"):
        freshness_report(ts_out, [])


def test_horizon_label_semantics(spark):
    from featureform_spark.operators.temporal import horizon_label

    anchors = spark.createDataFrame(
        [(1, "u1", "2024-01-01 00:00:00"),
         (2, "u1", "2024-01-01 02:00:00"),
         (3, "u2", "2024-01-01 00:00:00")],
        "id long, entity string, ts string",
    )
    outcomes = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00"),   # AT the anchor: excluded
         ("u1", "2024-01-01 00:00:01"),   # inside
         ("u1", "2024-01-01 01:00:00"),   # exactly at horizon: counts
         ("u1", "2024-01-01 01:00:01")],  # past horizon for anchor 1
        "entity string, ts string",
    )
    rows = {
        r["id"]: (r["n_outcomes"], r["label"])
        for r in horizon_label(
            anchors, outcomes, 3600
        ).collect()
    }
    assert rows[1] == (2, 1)
    assert rows[2] == (0, 0)   # outcomes all before this anchor
    assert rows[3] == (0, 0)   # no outcomes for u2
    with pytest.raises(ValueError, match="horizon_seconds"):
        horizon_label(anchors, outcomes, 0)


def test_horizon_label_single_shuffle(spark):
    from featureform_spark.operators.temporal import horizon_label

    anchors = spark.createDataFrame(
        [(i, f"u{i % 3}", f"2024-01-01 00:00:{i % 60:02d}")
         for i in range(30)],
        "id long, entity string, ts string",
    )
    plan = (
        horizon_label(anchors, anchors.select("entity", "ts"), 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_schema_compare(spark):
    from featureform_spark.functions.drift import schema_compare

    ref = spark.createDataFrame([(1, "a", 1.0)], "id long, s string, v double")
    cur = spark.createDataFrame(
        [(1, 2, 1.0, "x")], "id long, s int, v double, extra string"
    )
    rows = {r["column"]: r for r in schema_compare(ref, cur)}
    assert rows["id"]["status"] == "unchanged"
    assert rows["s"]["status"] == "type_changed"
    assert (rows["s"]["ref_type"], rows["s"]["cur_type"]) == ("string", "int")
    assert rows["extra"]["status"] == "added"
    assert rows["extra"]["ref_type"] is None
    dropped = schema_compare(ref, cur.drop("v"))
    assert {r["column"]: r["status"] for r in dropped}["v"] == "removed"


def test_sample_negatives(spark):
    from featureform_spark.operators.negatives import sample_negatives

    pos = spark.createDataFrame(
        [(u, it) for u in range(6) for it in range(u)],  # user u owns 0..u-1
        "user_id long, item_id long",
    )
    items = spark.createDataFrame(
        [(i,) for i in range(20)], "item_id long"
    )
    out = sample_negatives(pos.filter("user_id > 0"), items, k=3)
    rows = out.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["neg_rank"], r["item_id"])
        )
    pos_set = {(u, it) for u in range(6) for it in range(u)}
    for u, lst in by_user.items():
        assert len(lst) <= 3
        assert sorted(r for r, _ in lst) == list(range(1, len(lst) + 1))
        for _, it in lst:
            assert (u, it) not in pos_set
    # deterministic across invocations
    again = sample_negatives(pos.filter("user_id > 0"), items, k=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError, match="k must"):
        sample_negatives(pos, items, k=0)


def test_sample_negatives_saturated_user(spark):
    from featureform_spark.operators.negatives import sample_negatives

    items = spark.createDataFrame([(i,) for i in range(4)], "item_id long")
    # the user owns 3 of 4 items: at most one distinct negative exists
    pos = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2)], "user_id long, item_id long"
    )
    out = sample_negatives(pos, items, k=5, oversample=4).collect()
    assert all(r["item_id"] == 3 for r in out)
    assert len(out) <= 1 or all(r["neg_rank"] == 1 for r in out)


def test_horizon_label_matches_interval_join_formulation(spark):
    """Differential: the single-window horizon_label equals the naive
    inequality-join formulation (anchors x outcomes with the time
    bound) on a randomized fixture — the same contract the streaming
    interval join pins against its batch twin."""
    import numpy as np

    from featureform_spark.operators.temporal import horizon_label

    rng = np.random.default_rng(5)
    anchors = spark.createDataFrame(
        [(int(i), f"u{int(rng.integers(0, 6))}",
          f"2024-01-01 00:{int(t) // 60:02d}:{int(t) % 60:02d}")
         for i, t in enumerate(rng.integers(0, 900, size=40))],
        "id long, entity string, ts string",
    )
    outcomes = spark.createDataFrame(
        [(f"u{int(rng.integers(0, 7))}",
          f"2024-01-01 00:{int(t) // 60:02d}:{int(t) % 60:02d}")
         for t in rng.integers(0, 1000, size=60)],
        "entity string, ts string",
    )
    got = sorted(
        (r["id"], r["n_outcomes"], r["label"])
        for r in horizon_label(anchors, outcomes, 120).collect()
    )
    a = anchors.withColumn("_ats", F.col("ts").cast("timestamp"))
    o = outcomes.select(
        F.col("entity").alias("_e"), F.col("ts").cast("timestamp").alias("_ots")
    )
    joined = a.join(
        o,
        (a["entity"] == o["_e"])
        & (o["_ots"] > a["_ats"])
        & (o["_ots"] <= a["_ats"] + F.expr("INTERVAL 120 SECONDS")),
        "left",
    )
    want = sorted(
        (r["id"], r["n"], int(r["n"] > 0))
        for r in joined.groupBy("id")
        .agg(F.sum(F.col("_ots").isNotNull().cast("long")).alias("n"))
        .collect()
    )
    assert got == want
