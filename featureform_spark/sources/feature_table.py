"""Wide feature table with schema-evolving upsert (S14 analog).

The reference maintains one wide (entity, ts, feature_1..N) Iceberg table
per entity type: create-if-absent, ``ALTER TABLE ADD COLUMNS`` per new
feature, then ``MERGE INTO ... WHEN MATCHED UPDATE / NOT MATCHED INSERT``
(offline_store_spark_runner.py:688-765). Without a table format in this
container the same semantics is expressed as a versioned parquet snapshot:
upsert = full-outer join on entity + coalesce, written as a new
timestamped version dir (readers always resolve the newest — the
reference's own versioning scheme, S9).

On a cluster with Delta/Iceberg available, ``upsert_feature`` would emit
``MERGE INTO`` instead of the rewrite — the join shape is identical; the
table format only changes *how much* of the table is rewritten (Delta
rewrites matched files, this rewrites all). The API is kept format-
agnostic for that swap.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featureform_spark.sources.writers import latest_version_dir, write_versioned


class WideFeatureTable:
    """(entity, feature_1..N) snapshot with MERGE-style feature upsert."""

    def __init__(self, spark: SparkSession, path: str, entity_col: str = "entity"):
        self.spark = spark
        self.path = path
        self.entity_col = entity_col

    def snapshot(self) -> DataFrame | None:
        p = Path(self.path)
        if not p.exists():
            return None
        latest = latest_version_dir(self.path)
        if latest == self.path and not any(p.glob("*.parquet")):
            return None
        return self.spark.read.parquet(latest)

    def upsert_feature(
        self,
        feature_name: str,
        mat: DataFrame,
        entity_col: str = "entity",
        value_col: str = "value",
    ) -> DataFrame:
        """MERGE a materialization in as column ``feature_name``.

        - new entities → inserted (other features null);
        - existing entities → feature value updated;
        - new feature name → column added (schema evolution);
        - entities absent from ``mat`` keep their previous value.
        """
        incoming = mat.select(
            F.col(entity_col).alias(self.entity_col),
            F.col(value_col).alias("__new_value"),
        )
        current = self.snapshot()
        if current is None:
            merged = incoming.withColumnRenamed("__new_value", feature_name)
        else:
            joined = current.join(incoming, self.entity_col, "outer")
            feature_cols = [c for c in current.columns if c != self.entity_col]
            keep = [
                F.col(c) for c in feature_cols if c != feature_name
            ]
            updated = (
                F.coalesce(F.col("__new_value"), F.col(feature_name))
                if feature_name in feature_cols
                else F.col("__new_value")
            ).alias(feature_name)
            merged = joined.select(F.col(self.entity_col), *keep, updated)
        write_versioned(merged, self.path)
        return self.snapshot()
