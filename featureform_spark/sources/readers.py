"""Source readers: location → DataFrame.

Covers the reference runner's source dispatch (S1-S8,
offline_store_spark_runner.py:961-1061): parquet/csv file scans with
recursive lookup, catalog tables (Delta/Iceberg, gated on the connector
being present), Spark-catalog tables, Kafka streams, and directly
registered DataFrames. Schema inference follows the reference (csv
header=true); parquet carries its own schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from featureform_spark.registry import (
    CatalogLocation,
    DataFrameLocation,
    DeltaliteLocation,
    FileLocation,
    JDBCLocation,
    Location,
    Registry,
    SQLLocation,
    StreamLocation,
)


def read_file(spark: SparkSession, path: str, file_format: str = "parquet") -> DataFrame:
    """S1/S2: recursive, corrupt-tolerant file scan."""
    reader = spark.read.option("recursiveFileLookup", "true").option(
        "ignoreCorruptFiles", "true"
    )
    if file_format == "parquet":
        return reader.parquet(path)
    if file_format == "csv":
        return reader.option("header", "true").option("inferSchema", "true").csv(path)
    if file_format == "json":
        return reader.json(path)
    raise ValueError(f"unsupported file format: {file_format}")


def read_location(spark: SparkSession, loc: Location | dict, registry: Registry | None = None) -> DataFrame:
    """Dispatch a typed location to the right Spark reader."""
    if isinstance(loc, dict):
        loc = _from_dict(loc)
    if isinstance(loc, FileLocation):
        from featureform_spark.sources.writers import latest_version_dir

        path = latest_version_dir(loc.path)
        return read_file(spark, path, loc.file_format)
    if isinstance(loc, CatalogLocation):
        return spark.read.format(loc.table_format).table(loc.table)
    if isinstance(loc, DeltaliteLocation):
        from featureform_spark.sources.deltalite import DeltaliteTable

        return DeltaliteTable(spark, loc.path).snapshot(loc.version)
    if isinstance(loc, SQLLocation):
        return spark.table(loc.table)
    if isinstance(loc, StreamLocation):
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", loc.bootstrap_servers)
            .option("subscribe", loc.topic)
            .load()
        )
    if isinstance(loc, JDBCLocation):
        return read_jdbc(spark, loc)
    if isinstance(loc, DataFrameLocation):
        if registry is None:
            raise ValueError("DataFrameLocation requires the owning registry")
        return registry.dataframe(loc.view)
    raise TypeError(f"unknown location: {loc!r}")


def read_jdbc(spark: SparkSession, loc: JDBCLocation) -> DataFrame:
    """S6/S7: warehouse tables over Spark's JDBC source.

    With ``partition_column``/``num_partitions`` the read fans out as N
    range-bounded parallel queries (bounds probed with one min/max query)
    instead of one single-threaded cursor — mandatory at warehouse scale.
    Filters and projections push down into the remote SQL automatically.
    Gated: needs the vendor's JDBC driver jar on the classpath.
    """
    reader = spark.read.format("jdbc").option("url", loc.url).option(
        "dbtable", loc.table
    )
    if loc.partition_column and loc.num_partitions:
        bounds_df = (
            spark.read.format("jdbc")
            .option("url", loc.url)
            .option(
                "dbtable",
                f"(SELECT MIN({loc.partition_column}) AS lo, "
                f"MAX({loc.partition_column}) AS hi FROM {loc.table}) b",
            )
            .load()
        )
        row = bounds_df.first()
        reader = (
            reader.option("partitionColumn", loc.partition_column)
            .option("lowerBound", str(row["lo"]))
            .option("upperBound", str(row["hi"]))
            .option("numPartitions", str(loc.num_partitions))
        )
    try:
        return reader.load()
    except Exception as e:  # driver jar missing → actionable message
        raise RuntimeError(
            f"reading JDBC table {loc.table!r} requires the vendor JDBC "
            "driver jar on the Spark classpath"
        ) from e


def _from_dict(d: dict) -> Location:
    from featureform_spark.registry import _LOCATION_KINDS

    kind = d.get("kind", "file")
    cls = _LOCATION_KINDS[kind]
    return cls(**{k: v for k, v in d.items() if k != "kind"})
