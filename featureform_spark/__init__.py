"""featureform_spark — a PySpark-native feature-store / analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
featureform/featureform (the reference at /root/reference, studied for
behavior only), re-expressed Spark-first:

- the four generated query patterns (materialization, point-in-time
  training sets, batch features, train/test split) as DataFrame operators
  built on single-shuffle aggregations and window passes;
- the pass-through transformation surface (SQL templates with
  ``{{name.variant}}`` refs, Python DataFrame functions) over a
  variant-versioned resource registry;
- a serving plane (dataset iterators, online lookup, vector top-k);
- LLM-training-data operators (dedup via exact/minhash-LSH/simhash,
  similarity search, text analysis, multimodal column plumbing).

Everything is plain PySpark DataFrame API — Catalyst does the planning.
"""

from featureform_spark.session import get_spark
from featureform_spark.registry import Registry

__version__ = "0.1.0"

__all__ = ["get_spark", "Registry", "__version__"]
