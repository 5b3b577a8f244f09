from featureform_spark.operators.materialize import materialize_latest, with_row_index, iterate_segment
from featureform_spark.operators.training_set import point_in_time_join, FeatureInput
from featureform_spark.operators.batch_features import batch_features
from featureform_spark.operators.split import train_test_split, hash_bucket
from featureform_spark.operators.asof import asof_join, sessionize
from featureform_spark.operators.skew import salted_join

__all__ = [
    "asof_join",
    "sessionize",
    "salted_join",
    "materialize_latest",
    "with_row_index",
    "iterate_segment",
    "point_in_time_join",
    "FeatureInput",
    "batch_features",
    "train_test_split",
    "hash_bucket",
]
