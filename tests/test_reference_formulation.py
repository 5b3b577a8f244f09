"""The reference's literal PIT formulation (left join on inequality +
dedup window, provider/spark.go:105-248) vs our union+window operator:
identical results on real data. This is the J1/J2/J3 equivalence claim
as an executable fact — kept as a test, not production code, because the
inequality join it uses is the scale anti-pattern we designed away."""

from collections import Counter

from pyspark.sql import Window
from pyspark.sql import functions as F

from featureform_spark.operators.training_set import FeatureInput, point_in_time_join
from featureform_spark.sources.testdata import load_table


def reference_style_pit(label, feats):
    """N left joins on (entity, f.ts <= l.ts) + ROW_NUMBER dedup."""
    out = label.select(
        F.col("user_id").alias("entity"),
        F.col("value").alias("label"),
        F.col("ts").alias("label_ts"),
        F.col("event_id").alias("label_id"),
    )
    for f in feats:
        fdf = f.df.select(
            F.col("user_id").alias("f_entity"),
            F.col("value").alias(f.name),
            F.col("ts").alias(f"{f.name}_ts"),
            F.col("event_id").alias(f"{f.name}_ord"),
        )
        out = out.join(
            fdf,
            (out["entity"] == fdf["f_entity"])
            & (fdf[f"{f.name}_ts"] <= out["label_ts"]),
            "left",
        ).drop("f_entity")
        w = Window.partitionBy("label_id").orderBy(
            F.col(f"{f.name}_ts").desc_nulls_last(),
            F.col(f"{f.name}_ord").desc_nulls_last(),
        )
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", f"{f.name}_ts", f"{f.name}_ord")
        )
    return out.select("entity", *[f.name for f in feats], "label", "label_ts")


def test_union_window_equals_reference_formulation(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    label = events.filter(F.col("event_type") == "purchase")
    feats = [
        FeatureInput(
            name=f"f_{t}",
            df=events.filter(F.col("event_type") == t),
            entity_col="user_id", value_col="value",
            ts_col="ts", order_col="event_id",
        )
        for t in ("click", "error")
    ]
    ours = point_in_time_join(label, feats, "user_id", "value", "ts")
    ref = reference_style_pit(label, feats)
    a = Counter(map(tuple, ours.select("entity", "f_click", "f_error", "label", "label_ts").collect()))
    b = Counter(map(tuple, ref.collect()))
    assert a == b
