"""salted_join: row-identical to the plain join, restricted to the join
shapes where right-side replication is sound."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.operators.skew import salted_join


def _skewed(spark):
    # 90% of fact rows share one hot key
    rows = [(1 if i % 10 else i % 5 + 2, f"v{i}") for i in range(2000)]
    return spark.createDataFrame(rows, "k int, payload string")


def _dim(spark):
    return spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 5)], "k int, attr string"
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, how):
    fact, dim = _skewed(spark), _dim(spark)
    plain = fact.join(dim, "k", how)
    salted = salted_join(fact, dim, "k", num_salts=8, how=how)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_rejects_right_shapes(spark):
    with pytest.raises(ValueError, match="swap operands"):
        salted_join(_skewed(spark), _dim(spark), "k", how="full")


def test_salted_join_spreads_hot_key(spark):
    fact, dim = _skewed(spark), _dim(spark)
    out = salted_join(fact, dim, "k", num_salts=8, how="inner")
    # same hot key appears under multiple salts pre-drop: verify via
    # internal column by rebuilding the salted side
    salted = fact.withColumn("_s", F.floor(F.rand(42) * 8).cast("int"))
    n_salts = (salted.filter(F.col("k") == 1)
               .select("_s").distinct().count())
    assert n_salts > 1          # the hot key really is spread
    assert out.count() == fact.join(dim, "k").count()
