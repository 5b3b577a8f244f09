"""Pickled-function transport for DataFrame transformations.

The reference ships client-defined transformation functions across the
submit boundary as dill pickles: the client serializes the function, the
Spark runner downloads the blob, rehydrates it, and calls it on the
resolved source DataFrames (reference:
provider/scripts/spark/offline_store_spark_runner.py:1139-1257 —
``download → dill.loads → func(*sources)``). In-process registration is
this engine's documented default, but a migrating user may hold pickled
transformation blobs; this module is that wire format.

Serializer: ``dill`` when importable, else ``pyspark.cloudpickle`` —
which pyspark itself uses to ship closures to executors, so it is always
present wherever this engine runs and handles the same closure/lambda
cases dill does. Blobs are tagged with the serializer so rehydration
picks the right loader.
"""

from __future__ import annotations

from collections.abc import Callable

_DILL_TAG = b"FFSPKL1:dill:"
_CLOUD_TAG = b"FFSPKL1:cloudpickle:"


def _dill():
    try:
        import dill

        return dill
    except ImportError:
        return None


def serialize_function(fn: Callable) -> bytes:
    """Function → self-describing pickle blob (closures included)."""
    dill = _dill()
    if dill is not None:
        return _DILL_TAG + dill.dumps(fn, recurse=True)
    from pyspark import cloudpickle

    return _CLOUD_TAG + cloudpickle.dumps(fn)


def load_function(blob: bytes) -> Callable:
    """Rehydrate a blob from ``serialize_function`` or a raw reference-
    style dill pickle (untagged — the reference writes bare dill bytes)."""
    if blob.startswith(_DILL_TAG):
        dill = _dill()
        if dill is None:
            raise RuntimeError("blob was serialized with dill, which is not installed")
        return dill.loads(blob[len(_DILL_TAG):])
    if blob.startswith(_CLOUD_TAG):
        from pyspark import cloudpickle

        return cloudpickle.loads(blob[len(_CLOUD_TAG):])
    # untagged: reference-runner bare dill blob; dill pickles load with
    # plain pickle machinery only if dill is importable, so try it first
    dill = _dill()
    if dill is not None:
        return dill.loads(blob)
    import pickle

    return pickle.loads(blob)


def roundtrip(fn: Callable) -> Callable:
    """serialize → load, the full submit-boundary trip in one call."""
    return load_function(serialize_function(fn))
