"""Property-based (hypothesis) tests for the theta sketch and Puffin
container: estimator invariants, union algebra, and
deserialize-never-crashes-uncontrolled robustness."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from featureform_spark.sources.puffin_stats import (
    MAX_THETA,
    ThetaSketch,
    murmur3_x64_128,
    read_puffin,
)

values = st.lists(
    st.one_of(
        st.integers(min_value=-(2**70), max_value=2**70),
        st.text(max_size=30),
        st.floats(allow_nan=True, allow_infinity=True),
        st.binary(max_size=20),
        st.booleans(),
        st.none(),
    ),
    max_size=300,
)


@given(values)
@settings(max_examples=50, deadline=None)
def test_exact_mode_equals_python_distinct(vals):
    """Below capacity the sketch IS the distinct count under the
    documented canonicalization (None excluded, bool≡int, -0.0≡0.0,
    one NaN, str≡its utf-8 bytes)."""
    sk = ThetaSketch(lg_k=12)
    sk.update_all(vals)
    from featureform_spark.sources.puffin_stats import _canonical_bytes

    truth = {_canonical_bytes(v) for v in vals if v is not None}
    assert sk.is_exact()
    assert sk.estimate() == float(len(truth))


@given(values, values)
@settings(max_examples=30, deadline=None)
def test_union_commutes_and_roundtrips(a_vals, b_vals):
    a1, b1 = ThetaSketch(lg_k=6), ThetaSketch(lg_k=6)
    a1.update_all(a_vals)
    b1.update_all(b_vals)
    a2 = ThetaSketch.deserialize(a1.serialize(), lg_k=6)
    b2 = ThetaSketch.deserialize(b1.serialize(), lg_k=6)
    ab, ba = ThetaSketch(lg_k=6), ThetaSketch(lg_k=6)
    ab.union(a1)
    ab.union(b1)
    ba.union(b2)
    ba.union(a2)
    assert ab._set == ba._set and ab.theta == ba.theta


@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=5000, unique=True))
@settings(max_examples=20, deadline=None)
def test_estimate_is_sane_past_capacity(keys):
    sk = ThetaSketch(lg_k=5)  # k=32: force estimation mode quickly
    for v in keys:
        sk.update(v)
    est = sk.estimate()
    assert est >= sk.retained  # theta ≤ 1 can only scale counts UP
    assert sk.retained <= 32
    if sk.theta < MAX_THETA:
        # retained hashes all below theta, ordered serialization holds
        data = sk.serialize()
        back = ThetaSketch.deserialize(data, lg_k=5)
        assert back.estimate() == est


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_deserialize_rejects_garbage_controlled(blob):
    """Arbitrary bytes either parse (if they happen to be valid) or
    raise ValueError/struct.error — never hang, never corrupt."""
    try:
        ThetaSketch.deserialize(blob)
    except (ValueError, struct.error):
        pass


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_read_puffin_rejects_garbage_controlled(tmp_path_factory, blob):
    p = str(tmp_path_factory.mktemp("fz") / "f.stats")
    with open(p, "wb") as f:
        f.write(blob)
    try:
        read_puffin(p)
    except (ValueError, struct.error, KeyError, TypeError):
        pass


@given(st.binary(max_size=64), st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_murmur_collision_free_on_distinct_smallish(a, b):
    if a != b:
        assert murmur3_x64_128(a, 9001) != murmur3_x64_128(b, 9001)
    else:
        assert murmur3_x64_128(a, 9001) == murmur3_x64_128(b, 9001)
