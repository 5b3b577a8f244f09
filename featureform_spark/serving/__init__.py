from featureform_spark.serving.dataset import Dataset
from featureform_spark.serving.online import InMemoryOnlineStore, materialize_to_online

__all__ = ["Dataset", "InMemoryOnlineStore", "materialize_to_online"]
