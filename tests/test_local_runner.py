"""The no-Spark local runner (plans/local_runner.py, U4): the same
transformation strings and pickled DF functions the Spark engine runs
must produce identical rows through DuckDB + pandas — pinning backend
equivalence the way the reference's pandas runner mirrors its Spark
runner (offline_store_pandas_runner.py vs offline_store_spark_runner.py)."""

import os

import pandas as pd
import pytest

from featureform_spark.plans.local_runner import (
    execute_df_job,
    execute_sql_job,
)


@pytest.fixture()
def orders_path(sf_dir):
    return os.path.join(sf_dir, "orders.parquet")


@pytest.fixture()
def customer_path(sf_dir):
    return os.path.join(sf_dir, "customer.parquet")


SQL = """
SELECT o_custkey AS entity,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS cnt
FROM source_0 GROUP BY o_custkey
"""


def test_sql_job_without_spark(tmp_path, orders_path):
    out = execute_sql_job(str(tmp_path / "o"), SQL, [orders_path])
    assert out.endswith(".parquet") and os.path.exists(out)
    got = pd.read_parquet(out)
    src = pd.read_parquet(orders_path)
    assert len(got) == src["o_custkey"].nunique()
    assert set(got.columns) == {"entity", "total", "cnt"}
    assert got["cnt"].sum() == len(src)


def test_sql_job_matches_spark_engine(spark, tmp_path, orders_path):
    """Backend equivalence: one transformation string, two engines,
    identical rows."""
    out = execute_sql_job(str(tmp_path / "eq"), SQL, [orders_path])
    local = pd.read_parquet(out).sort_values("entity").reset_index(drop=True)
    sdf = spark.read.parquet(orders_path)
    sdf.createOrReplaceTempView("source_0")
    via_spark = (
        spark.sql(SQL).toPandas().sort_values("entity").reset_index(drop=True)
    )
    assert len(local) == len(via_spark)
    assert (local["entity"].values == via_spark["entity"].values).all()
    assert (local["cnt"].values == via_spark["cnt"].values).all()
    assert (abs(local["total"].values - via_spark["total"].values) < 1e-9).all()


def test_sql_job_template_substitution(tmp_path, orders_path, customer_path):
    """{{name.variant}} templates bind positionally, same as the Spark
    engine's source_i convention."""
    sql = """
    SELECT c.c_custkey AS k, COUNT(o.o_orderkey) AS n
    FROM {{customer.default}} c
    LEFT JOIN {{orders.v1}} o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """
    out = execute_sql_job(
        str(tmp_path / "t"), sql, [customer_path, orders_path]
    )
    got = pd.read_parquet(out)
    cust = pd.read_parquet(customer_path)
    orders = pd.read_parquet(orders_path)
    assert len(got) == len(cust)
    assert got["n"].sum() == len(orders)


def test_df_job_with_pickled_transport(tmp_path, orders_path):
    """A DF function shipped as the registry's dill transport blob runs
    identically to the in-process callable (the reference unpickles
    transformation.pkl the same way)."""
    from featureform_spark.plans.transport import serialize_function

    def fn(orders):
        out = orders.groupby("o_orderstatus", as_index=False).agg(
            n=("o_orderkey", "count")
        )
        return out.sort_values("o_orderstatus").reset_index(drop=True)

    out1 = execute_df_job(str(tmp_path / "a"), fn, [orders_path])
    out2 = execute_df_job(
        str(tmp_path / "b"), serialize_function(fn), [orders_path]
    )
    a, b = pd.read_parquet(out1), pd.read_parquet(out2)
    assert a.equals(b)
    assert a["n"].sum() == len(pd.read_parquet(orders_path))


def test_csv_sources(tmp_path, orders_path):
    csv = str(tmp_path / "orders.csv")
    pd.read_parquet(orders_path)[["o_orderkey", "o_custkey"]].head(100).to_csv(
        csv, index=False
    )
    out = execute_sql_job(
        str(tmp_path / "c"),
        "SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS d FROM source_0",
        [csv],
    )
    got = pd.read_parquet(out)
    assert got["n"][0] == 100
