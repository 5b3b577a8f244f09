"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (PIT training set) at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full suite from
``featureform_spark.suite`` — every implemented operator from SURVEY.md §2
paired with a DuckDB-runnable oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from featureform_spark.suite import all_oracles, all_queries  # noqa: E402


def _ensure_conf(spark: SparkSession) -> None:
    # testdata parquet uses TIMESTAMP(NANOS); loaders convert (see
    # featureform_spark/sources/testdata.py)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # naive µs parquet must land as TimestampType (UTC session tz), not NTZ
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_conf(spark)
    return all_queries()["training_set_pit"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = all_queries()

    def wrap(fn):
        def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_conf(spark)
            return fn(spark, sf_dir)

        return inner

    return {name: wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
