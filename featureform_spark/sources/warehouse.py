"""Warehouse connector option mapping (S6/S7): Snowflake and BigQuery.

The reference hands each warehouse its vendor Spark-connector option set
(provider/scripts/spark/offline_store_spark_runner.py:990-1031):
Snowflake `format("snowflake")` with sfURL/sfUser/sfPassword/
sfWarehouse/sfDatabase/sfSchema/dbtable; BigQuery `format("bigquery")`
with credentials/parentProject/viewsEnabled/table. This module
reproduces that mapping — validation included — as pure functions, and
gates the actual ``load()`` on the vendor jar being present (same
posture as ``read_jdbc``). The option builders are contract-tested
without a warehouse; the read path raises an actionable error when the
connector jar is absent.

Scale note: both vendor connectors parallelize server-side (Snowflake
result-set partitioning, BigQuery storage-read streams), so unlike the
generic JDBC hook no manual range partitioning is needed — pushdown of
filters/projections is the connector's job and happens automatically
when the plan is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def snowflake_options(credentials: dict, database: str, schema: str, table: str) -> dict:
    """Exact option set for ``format("snowflake")``
    (offline_store_spark_runner.py:992-1000)."""
    required = ["sfURL", "sfUser", "sfPassword", "sfWarehouse"]
    missing = [c for c in required if not credentials.get(c)]
    if missing:
        raise ValueError(
            f"Missing required Snowflake credentials: {', '.join(missing)}"
        )
    if not table or not table.strip():
        raise ValueError("Snowflake table name cannot be empty")
    return {
        "sfURL": credentials["sfURL"],
        "sfUser": credentials["sfUser"],
        "sfPassword": credentials["sfPassword"],
        "sfWarehouse": credentials["sfWarehouse"],
        "sfDatabase": database,
        "sfSchema": schema,
        "dbtable": table,
    }


def bigquery_options(credentials: dict, table: str) -> dict:
    """Exact option set for ``format("bigquery")``
    (offline_store_spark_runner.py:1005-1026), including the reference's
    required-credential validation and fully-qualified table id."""
    required = ["bqProjectId", "bqDatasetId", "bqCreds"]
    missing = [c for c in required if not credentials.get(c)]
    if missing:
        raise ValueError(
            f"Missing required BigQuery credentials: {', '.join(missing)}"
        )
    if not table or not table.strip():
        raise ValueError("BigQuery table name cannot be empty")
    proj, dataset = credentials["bqProjectId"], credentials["bqDatasetId"]
    return {
        "credentials": credentials["bqCreds"],
        "parentProject": proj,
        "viewsEnabled": "true",
        "table": f"{proj}.{dataset}.{table}",
    }


def _gated_load(spark: SparkSession, fmt: str, options: dict) -> DataFrame:
    try:
        return spark.read.format(fmt).options(**options).load()
    except Exception as e:
        raise RuntimeError(
            f"reading via format({fmt!r}) requires the vendor Spark "
            "connector jar on the classpath"
        ) from e


def read_snowflake(
    spark: SparkSession, credentials: dict, database: str, schema: str, table: str
) -> DataFrame:
    return _gated_load(
        spark, "snowflake", snowflake_options(credentials, database, schema, table)
    )


def read_bigquery(spark: SparkSession, credentials: dict, table: str) -> DataFrame:
    return _gated_load(spark, "bigquery", bigquery_options(credentials, table))


def snowflake_jdbc_url(credentials: dict, database: str, schema: str) -> str:
    """Snowflake JDBC url from the same credential dict the vendor
    connector takes — `jdbc:snowflake://<sfURL>/?db=...&schema=...`."""
    host = credentials["sfURL"].removeprefix("https://").removeprefix("http://")
    return (
        f"jdbc:snowflake://{host}/?db={database}&schema={schema}"
        f"&warehouse={credentials['sfWarehouse']}"
        f"&user={credentials['sfUser']}&password={credentials['sfPassword']}"
    )


def register_jdbc_catalog(
    spark: SparkSession,
    name: str,
    url: str,
    driver: str = "",
    options: dict | None = None,
) -> None:
    """Register a warehouse as a DSv2 JDBC CATALOG — the read path
    where Spark's aggregate/limit/filter pushdown all reach the remote
    SQL (``spark.table(f"{name}.<schema>.<table>")`` /
    ``spark.sql(...)``). ``spark.read.format("jdbc")`` is the V1
    relation: filters push down but aggregates run Spark-side; at
    warehouse scale a ``GROUP BY`` over a fact table must execute
    remotely, which only the catalog path
    (JDBCTableCatalog, pushDownAggregate/pushDownLimit) provides.
    Integration-tested against embedded Derby
    (tests/test_jdbc_derby.py); vendor warehouses differ only in
    url/driver."""
    prefix = f"spark.sql.catalog.{name}"
    spark.conf.set(
        prefix,
        "org.apache.spark.sql.execution.datasources.v2.jdbc."
        "JDBCTableCatalog",
    )
    spark.conf.set(f"{prefix}.url", url)
    if driver:
        spark.conf.set(f"{prefix}.driver", driver)
    spark.conf.set(f"{prefix}.pushDownAggregate", "true")
    spark.conf.set(f"{prefix}.pushDownLimit", "true")
    for k, v in (options or {}).items():
        spark.conf.set(f"{prefix}.{k}", str(v))


def read_snowflake_jdbc(
    spark: SparkSession,
    credentials: dict,
    database: str,
    schema: str,
    table: str,
    partition_column: str = "",
    num_partitions: int = 0,
) -> DataFrame:
    """Snowflake over the GENERIC JDBC path — fallback when the vendor
    Spark connector jar is absent but the (much smaller) Snowflake JDBC
    driver is on the classpath. Routes through ``read_jdbc``, whose
    range-partitioned fan-out and pushdown are integration-tested for
    real against Derby (tests/test_jdbc_derby.py); only the url/driver
    pair differs here."""
    # reuse the vendor-path validation so both paths reject alike
    snowflake_options(credentials, database, schema, table)
    from featureform_spark.registry import JDBCLocation
    from featureform_spark.sources.readers import read_jdbc

    loc = JDBCLocation(
        url=snowflake_jdbc_url(credentials, database, schema),
        table=table,
        partition_column=partition_column,
        num_partitions=num_partitions,
        driver="net.snowflake.client.jdbc.SnowflakeDriver",
    )
    return read_jdbc(spark, loc)
