"""Driver-style oracle parity: every suite query vs its DuckDB oracle.

Mimics the driver's CORRECTNESS check: run the Spark query and the oracle
SQL on the same parquet tables, then compare row count, column-name set,
and exact values (column-name-sorted, row-sorted) — exact, not
approximate, because the driver hash-compares.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from featureform_spark.sources.testdata import TABLES
from featureform_spark.suite import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_object_dtype(s):
            # dates come back as datetime.date objects from both engines
            df[c] = s
    return df.sort_values(by=list(df.columns), kind="mergesort", na_position="last").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no SQL oracle declared)")
    oracle_df = duck.execute(ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a, b = normalize(spark_df), normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            mismatch = ~(
                (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
                | (av == bv)
            )
        else:
            an, bn = pd.isna(a[c]), pd.isna(b[c])
            mismatch = ~((an & bn) | (a[c].fillna("§null§") == b[c].fillna("§null§")))
        bad = np.flatnonzero(np.asarray(mismatch))
        assert bad.size == 0, (
            f"{name}.{c}: {bad.size} mismatching values, first rows: "
            f"{a.iloc[bad[:3]].to_dict('records')} vs {b.iloc[bad[:3]].to_dict('records')}"
        )
