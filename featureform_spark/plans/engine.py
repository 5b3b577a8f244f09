"""Engine: resolves registry resources into DataFrames and runs the
generated query patterns over them.

This collapses the reference's coordinator→provider→spark-submit pipeline
(SURVEY §3: client/apply → coordinator tasks → SparkExecutor → runner)
into direct in-process calls on one SparkSession. Transformations resolve
recursively (a transformation can be the input of another — the reference's
chained-transformation tests, provider/offline_test.go:2882).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from featureform_spark.operators.materialize import materialize_latest
from featureform_spark.operators.training_set import FeatureInput, point_in_time_join
from featureform_spark.plans.templates import substitute_template
from featureform_spark.registry import (
    FeatureVariant,
    LabelVariant,
    LagFeature,
    Registry,
    SourceVariant,
    TrainingSetVariant,
)
from featureform_spark.sources.readers import read_location


class Engine:
    def __init__(self, spark: SparkSession, registry: Registry | None = None):
        self.spark = spark
        self.registry = registry or Registry()
        self._cache: dict[str, DataFrame] = {}
        self._resolving: list[str] = []

    # -- source resolution ---------------------------------------------------

    def source_df(self, ref: str) -> DataFrame:
        """Resolve ``name.variant`` to a DataFrame (recursively for
        transformations). Results are cached per engine instance: the plan
        (not the data) is reused, so Catalyst still sees one tree."""
        if "." not in ref:
            ref = f"{ref}.default"
        if ref in self._cache:
            return self._cache[ref]
        if ref in self._resolving:
            cycle = " -> ".join(self._resolving + [ref])
            raise ValueError(f"cyclic transformation reference: {cycle}")
        src = self.registry.get("source", ref)
        assert isinstance(src, SourceVariant)
        self._resolving.append(ref)
        try:
            df = self._resolve_source(src)
        finally:
            self._resolving.pop()
        self._cache[ref] = df
        return df

    def expectations_report(self, ref: str) -> DataFrame:
        """Run the rules registered against a source
        (Registry.register_expectations) — one scan, per-rule report
        (see functions/expectations.expect)."""
        from featureform_spark.functions.expectations import expect

        rules = self.registry.expectations(ref)
        if not rules:
            raise ValueError(f"no expectations registered for {ref!r}")
        return expect(self.source_df(ref), rules)

    def enforce_expectations(self, ref: str) -> None:
        """The publish gate: raises ExpectationError naming every
        failed rule before a materialize/training-set write proceeds.
        Sources with no registered rules pass silently (validation is
        opt-in, matching the reference's P3 shape-only default)."""
        from featureform_spark.functions.expectations import enforce

        rules = self.registry.expectations(ref)
        if rules:
            enforce(self.source_df(ref), rules)

    def invalidate_plans(self) -> None:
        """Drop cached source plans so the next resolution re-lists files
        and re-builds transformations — required by DYNAMIC refresh
        (streaming/scheduler.py): a cached plan pins its parquet file
        index, so appends to a source directory are invisible until the
        plan is rebuilt."""
        self._cache.clear()

    def _resolve_source(self, src: SourceVariant) -> DataFrame:
        if src.location is not None:
            return read_location(self.spark, src.location, self.registry)
        if src.sql is not None:
            sql, refs = substitute_template(src.sql)
            for i, ref in enumerate(refs):
                self.source_df(ref).createOrReplaceTempView(f"source_{i}")
            out = self.spark.sql(sql)
            _validate_output(out)
            return out
        if src.fn_name is not None:
            fn = self.registry.function(src.fn_name)
            inputs = [self.source_df(ref) for ref in src.inputs]
            out = fn(*inputs)
            _validate_output(out)
            return out
        raise ValueError(f"source {src.name}.{src.variant} has no location/sql/fn")

    # -- generated query patterns --------------------------------------------

    def materialize(self, feature_ref: str) -> DataFrame:
        feat = self.registry.get("feature", feature_ref)
        assert isinstance(feat, FeatureVariant)
        df = self.source_df(feat.source)
        mat = materialize_latest(
            df,
            feat.entity_column,
            feat.value_column,
            feat.timestamp_column,  # "" normalized to None at register
        )
        # enforce the declared value type (reference casts via its
        # ValueConverter plane, fftypes/value_converter.go)
        from pyspark.sql import functions as F

        from featureform_spark import types as fftypes

        spark_type = fftypes.parse(feat.value_type).to_spark()
        return mat.withColumn("value", F.col("value").cast(spark_type))

    def _feature_input(
        self,
        ref: str,
        lag: LagFeature | None = None,
        entity_to_label_col: dict[str, str] | None = None,
    ) -> FeatureInput:
        feat = self.registry.get("feature", ref)
        assert isinstance(feat, FeatureVariant)
        name = lag.column_name() if lag else ref.replace(".", "_")
        label_entity_col = (
            entity_to_label_col.get(feat.entity) if entity_to_label_col else None
        )
        return FeatureInput(
            name=name,
            df=self.source_df(feat.source),
            entity_col=feat.entity_column,
            value_col=feat.value_column,
            ts_col=feat.timestamp_column,
            lag_seconds=lag.lag_seconds if lag else 0.0,
            label_entity_col=label_entity_col,
        )

    def training_set(self, ts_ref: str, dedup: bool = True, sort_by_ts: bool = False) -> DataFrame:
        ts = self.registry.get("training_set", ts_ref)
        assert isinstance(ts, TrainingSetVariant)
        label = self.registry.get("label", ts.label)
        assert isinstance(label, LabelVariant)
        # J10: multi-entity labels map each feature's entity namespace to
        # its own label column (metadata.proto EntityMappings :372-381)
        mapping: dict[str, str] = {
            m["entity"]: m["column"] for m in label.entity_mappings
        }
        label_entity_col = label.entity_column or (
            next(iter(mapping.values())) if mapping else ""
        )
        # the primary label column needs no per-feature override
        entity_to_label_col = {
            e: c for e, c in mapping.items() if c != label_entity_col
        }
        inputs = [
            self._feature_input(ref, entity_to_label_col=entity_to_label_col)
            for ref in ts.features
        ]
        for lag_dict in ts.lag_features:
            lag = LagFeature(**lag_dict)
            inputs.append(
                self._feature_input(lag.feature, lag, entity_to_label_col)
            )
        out = point_in_time_join(
            self.source_df(label.source),
            inputs,
            label_entity_col=label_entity_col,
            label_value_col=label.value_column,
            label_ts_col=label.timestamp_column,
            dedup=dedup,
            sort_by_ts=sort_by_ts,
        )
        if ts.ondemand_features:
            # r12: resolve declared on-demand features at BUILD time —
            # the batch mapInPandas scorer over the PIT output (zero
            # added shuffle; the reference runs these only at serve
            # time, register.py:4292-4360). Precomputed refs resolve
            # to their PIT output columns (ref -> name_variant), plus
            # the label/label_ts columns for fns scoring against the
            # target.
            from featureform_spark.serving.ondemand_batch import (
                ondemand_batch,
            )

            feature_cols = {ref: ref.replace(".", "_") for ref in ts.features}
            for lag_dict in ts.lag_features:
                lag = LagFeature(**lag_dict)
                feature_cols[lag.column_name()] = lag.column_name()
            out = ondemand_batch(
                self.registry,
                out,
                ts.ondemand_features,
                feature_cols=feature_cols,
            )
        return out

    def batch_features(self, feature_refs: Iterable[str]) -> DataFrame:
        """Align latest values of N features on entity.

        Features sharing (source, entity_column, timestamp_column) are
        computed in ONE scan+shuffle via filtered aggregates (J7-style
        source dedup, generalized); only distinct source groups pay a
        union branch.
        """
        from pyspark.sql import functions as F

        refs = list(feature_refs)
        groups: dict[tuple, list[tuple[str, FeatureVariant]]] = {}
        for ref in refs:
            feat = self.registry.get("feature", ref)
            assert isinstance(feat, FeatureVariant)
            key = (feat.source, feat.entity_column, feat.timestamp_column)
            groups.setdefault(key, []).append((ref.replace(".", "_"), feat))

        frames: list[DataFrame] = []
        for (source, entity_col, ts_col), members in groups.items():
            df = self.source_df(source)
            ts_expr = (
                F.coalesce(F.col(ts_col).cast("timestamp"),
                           F.lit("1970-01-01").cast("timestamp"))
                if ts_col
                else F.lit("1970-01-01").cast("timestamp")
            )
            # non-deterministic ord must be projected BEFORE the agg
            # (Spark rejects it inside aggregate expressions)
            projected = df.select(
                F.col(entity_col).alias("entity"),
                *[
                    F.struct(
                        ts_expr.alias("ts"),
                        F.monotonically_increasing_id().alias("ord"),
                        F.col(feat.value_column).alias("value"),
                    ).alias(f"_p_{name}")
                    for name, feat in members
                ],
            )
            frames.append(
                projected.groupBy("entity").agg(
                    *[
                        F.max(f"_p_{name}").getField("value").alias(name)
                        for name, _ in members
                    ]
                )
            )
        result = frames[0]
        for frame in frames[1:]:
            result = result.join(frame, "entity", "outer")
        return result

    def create_training_set(
        self, ts_ref: str, output_dir: str | None = None
    ) -> DataFrame:
        """ST4: honor the training-set type (snowflake_queries.go:61-107).

        - VIEW → registered temp view over the lazy plan;
        - DYNAMIC → the lazy DataFrame itself (Spark-native "target lag
          0": every action re-evaluates against current sources);
        - STATIC → materialized versioned-parquet snapshot, read back.
        """
        ts = self.registry.get("training_set", ts_ref)
        assert isinstance(ts, TrainingSetVariant)
        df = self.training_set(ts_ref)
        if ts.ts_type == "view":
            view = f"__ff_ts_{ts.name}_{ts.variant}"
            df.createOrReplaceTempView(view)
            return self.spark.table(view)
        if ts.ts_type == "dynamic":
            return df
        if ts.ts_type == "static":
            if output_dir is None:
                raise ValueError("static training set requires output_dir")
            from featureform_spark.sources.writers import latest_version_dir, write_versioned

            write_versioned(df, output_dir)
            return self.spark.read.parquet(latest_version_dir(output_dir))
        raise ValueError(f"unknown training-set type: {ts.ts_type}")


def _validate_output(df) -> None:
    """P3: a transformation must return a non-None DataFrame."""
    if df is None or not isinstance(df, DataFrame):
        raise TypeError(f"transformation must return a DataFrame, got {type(df)}")
