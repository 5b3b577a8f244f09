"""Simulate the grading driver: import __spark_entry__ with a vanilla
SparkSession, smoke entry(), then run every queries() entry against its
oracle_sql() via DuckDB (row count + column names + sorted-row hash).

Usage: python scripts/verify_driver_contract.py [sf_dir] [query ...]
(trailing args restrict the run to the named queries)
"""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

df = E.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema={df.schema.simpleString()}")
assert n >= 0

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s): pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s): pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s): pdf[c] = s.astype("int64")
    if len(pdf) == 0:
        return "EMPTY:" + ",".join(sorted(pdf.columns))
    rows = sorted(pdf.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

qs, oracles = E.queries(), E.oracle_sql()
only = set(sys.argv[2:])
if only:
    unknown = only - set(qs)
    assert not unknown, f"unknown queries: {sorted(unknown)}"
    qs = {k: v for k, v in qs.items() if k in only}
fails = []
for name in sorted(qs):
    sdf = qs[name](spark, SF).toPandas()
    if name not in oracles:
        print(f"{name}: rows-only ({len(sdf)})"); continue
    odf = con.execute(oracles[name]).df()
    hs, ho = value_hash(sdf), value_hash(odf)
    ok = len(sdf) == len(odf) and sorted(sdf.columns) == sorted(odf.columns) and hs == ho
    print(f"{name}: rows {len(sdf)}/{len(odf)} cols_match={sorted(sdf.columns)==sorted(odf.columns)} hash_match={hs==ho}")
    if not ok: fails.append(name)
print("RESULT:", "ALL MATCH" if not fails else f"FAILED: {fails}")
