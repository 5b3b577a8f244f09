"""Value-type system: scalar + vector types mapped onto Spark SQL types.

Mirrors the reference's type model (provider/types/value_type.go:30-103 —
scalars plus a single nested VectorType for embeddings) but expressed as
Spark SQL types. No decimal/interval/map/struct in the resource model; all
columns nullable (the reference encodes nullability via pointer types).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import types as T


class ScalarType(str, Enum):
    NIL = "nil"
    INT = "int"
    INT8 = "int8"
    INT16 = "int16"
    INT32 = "int32"
    INT64 = "int64"
    FLOAT32 = "float32"
    FLOAT64 = "float64"
    STRING = "string"
    BOOL = "bool"
    TIMESTAMP = "timestamp"
    DATETIME = "datetime"

    def to_spark(self) -> T.DataType:
        return _SCALAR_TO_SPARK[self]


_SCALAR_TO_SPARK: dict[ScalarType, T.DataType] = {
    ScalarType.NIL: T.NullType(),
    ScalarType.INT: T.LongType(),
    ScalarType.INT8: T.ByteType(),
    ScalarType.INT16: T.ShortType(),
    ScalarType.INT32: T.IntegerType(),
    ScalarType.INT64: T.LongType(),
    ScalarType.FLOAT32: T.FloatType(),
    ScalarType.FLOAT64: T.DoubleType(),
    ScalarType.STRING: T.StringType(),
    ScalarType.BOOL: T.BooleanType(),
    ScalarType.TIMESTAMP: T.TimestampType(),
    ScalarType.DATETIME: T.TimestampType(),
}

_SPARK_TO_SCALAR: dict[type, ScalarType] = {
    T.ByteType: ScalarType.INT8,
    T.ShortType: ScalarType.INT16,
    T.IntegerType: ScalarType.INT32,
    T.LongType: ScalarType.INT64,
    T.FloatType: ScalarType.FLOAT32,
    T.DoubleType: ScalarType.FLOAT64,
    T.StringType: ScalarType.STRING,
    T.BooleanType: ScalarType.BOOL,
    T.TimestampType: ScalarType.TIMESTAMP,
    T.DateType: ScalarType.DATETIME,
    T.NullType: ScalarType.NIL,
}


@dataclass(frozen=True)
class VectorType:
    """Embedding type: fixed-dimension float vector.

    The reference's only nested type (value_type.go:99-103).
    """

    scalar: ScalarType = ScalarType.FLOAT32
    dimension: int = 0
    is_embedding: bool = True

    def to_spark(self) -> T.DataType:
        return T.ArrayType(self.scalar.to_spark())


ValueType = ScalarType | VectorType


def from_spark(dt: T.DataType) -> ValueType:
    """Infer an engine ValueType from a Spark SQL type."""
    if isinstance(dt, T.ArrayType):
        elem = from_spark(dt.elementType)
        if not isinstance(elem, ScalarType):
            raise TypeError(f"unsupported nested array type: {dt}")
        return VectorType(scalar=elem, dimension=0, is_embedding=False)
    scalar = _SPARK_TO_SCALAR.get(type(dt))
    if scalar is None:
        raise TypeError(f"unsupported Spark type for resource model: {dt}")
    return scalar


def parse(name: str | ValueType) -> ValueType:
    if isinstance(name, (ScalarType, VectorType)):
        return name
    return ScalarType(name)
