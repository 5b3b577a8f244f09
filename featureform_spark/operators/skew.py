"""Skew-resistant equi-join via key salting.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on by
default in our session) handles most sort-merge skew at runtime, but it
can't help when the skewed side must co-group with a replicated build
side (e.g. a hot entity holding 10% of a 100 TB fact table joined to a
medium dimension too big to broadcast). ``salted_join`` is the explicit
fallback: split each hot key into ``num_salts`` sub-keys on the fact
side, replicate the dimension row once per sub-key, and join on
``(key, salt)`` so the hot key's rows spread over ``num_salts``
reducers instead of one straggler.

The segmented PIT join (``operators/training_set.point_in_time_join``
with ``time_bucket=``) is the time-aware sibling of this for as-of
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__ff_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str] | str,
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` (the big, hot-keyed side) to ``other`` on ``on``.

    Each skewed-side row gets a uniform salt in ``[0, num_salts)``;
    ``other`` is exploded ``num_salts``× (it must be the smaller side —
    its shuffle volume multiplies by the salt count). Row-level results
    are identical to the unsalted join; only the physical distribution
    changes. Supported ``how``: inner / left / left_semi / left_anti —
    shapes where replicating the right side cannot manufacture or drop
    rows. For right/full joins, salt the other operand instead.
    """
    if how not in {"inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}"
            " — swap operands so the skewed side is on the left"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        _SALT, F.floor(F.rand(seed) * num_salts).cast("int")
    )
    replicated = other.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted.join(replicated, keys + [_SALT], how).drop(_SALT)
