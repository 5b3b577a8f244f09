from featureform_spark.streaming.incremental import (
    IncrementalMaterializer,
    stream_materialize,
    windowed_aggregate,
)

__all__ = ["IncrementalMaterializer", "stream_materialize", "windowed_aggregate"]
