"""Feature server facade: the reference's serving API surface
(serving/serving.go FeatureServe/TrainingData) as one in-process object.

Combines:
- precomputed features: online-store point lookups (V1/V3);
- on-demand features: registered Python callables evaluated at serve
  time with (params, entity) like the reference's CLIENT_COMPUTED mode
  (U2, register.py:4292-4360);
- vector features: nearest() top-k (V4);
- training data: Dataset iterator over a training set (V5).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from featureform_spark.plans.engine import Engine
from featureform_spark.serving.dataset import Dataset
from featureform_spark.serving.online import InMemoryOnlineStore, materialize_to_online


class FeatureServer:
    def __init__(self, engine: Engine, store: InMemoryOnlineStore | None = None):
        self.engine = engine
        self.store = store or InMemoryOnlineStore()
        self._deployed: set[str] = set()

    # -- deployment ----------------------------------------------------------

    def deploy_feature(self, feature_ref: str) -> int:
        """Materialize + copy to the online store; returns chunk count."""
        mat = self.engine.materialize(feature_ref)
        chunks = materialize_to_online(mat, self.store, feature_ref)
        self._deployed.add(feature_ref)
        return chunks

    def deploy_vectors(self, name: str, df: DataFrame,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        self.store.register_vectors(name, df, id_col, vec_col)

    # -- serving --------------------------------------------------------------

    def serve(
        self,
        features: list[str],
        entity: Any,
        params: dict[str, Any] | None = None,
    ) -> list[Any]:
        """Order-preserving multi-feature serve; ``ondemand/name.variant``
        refs run their registered Python function with
        (params, entity, <precomputed values so far>)."""
        out: list[Any] = []
        for ref in features:
            if ref.startswith("ondemand/"):
                fn = self.engine.registry.function(ref)
                out.append(fn(params or {}, entity, list(out)))
            else:
                if ref not in self._deployed:
                    raise KeyError(f"feature {ref} not deployed; call deploy_feature")
                out.append(self.store.get(ref, entity))
        return out

    def nearest(self, name: str, vector: list[float], k: int) -> list[tuple[Any, float]]:
        return self.store.nearest(name, vector, k)

    def training_data(self, ts_ref: str) -> Dataset:
        return Dataset(self.engine.training_set(ts_ref))
