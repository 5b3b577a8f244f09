"""Property-based semantics checks (hypothesis): the engine operators
must agree with a naive Python reference implementation on arbitrary
small inputs — this covers the edge-case lattice (duplicate timestamps,
missing timestamps, unseen entities, empty features) far beyond the
hand-written truth tables.

Example counts are kept small: each example is a Spark job.
"""

from collections import Counter
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from featureform_spark.operators.materialize import materialize_latest
from featureform_spark.operators.training_set import FeatureInput, point_in_time_join

EPOCH0 = datetime(1970, 1, 1)
BASE = datetime(2021, 1, 1)

entities = st.sampled_from(["a", "b", "c"])
# None = missing timestamp; ints become BASE + days
ts_days = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
values = st.integers(min_value=-5, max_value=5)

rows_strategy = st.lists(st.tuples(entities, values, ts_days), max_size=8)

SCHEMA = "entity string, value long, ts timestamp, ord long"


def to_spark_rows(rows):
    return [
        (e, v, None if d is None else BASE + timedelta(days=d), i)
        for i, (e, v, d) in enumerate(rows)
    ]


def eff_ts(d, default):
    return default if d is None else BASE + timedelta(days=d)


def naive_latest(rows):
    best = {}
    for i, (e, v, d) in enumerate(rows):
        key = (eff_ts(d, EPOCH0), i)
        if e not in best or key > best[e][0]:
            best[e] = (key, v)
    return {e: (v, k[0]) for e, (k, v) in best.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_materialize_matches_naive(spark, rows):
    df = spark.createDataFrame(to_spark_rows(rows), SCHEMA)
    got = {
        r["entity"]: (r["value"], r["ts"])
        for r in materialize_latest(df, "entity", "value", "ts", "ord").collect()
    }
    assert got == naive_latest(rows)


def naive_pit(label_rows, feat_rows, lag_days=0):
    out = []
    for le, lv, ld in label_rows:
        lts = eff_ts(ld, datetime(9999, 12, 31))
        best = None
        for i, (fe, fv, fd) in enumerate(feat_rows):
            if fe != le:
                continue
            fts = eff_ts(fd, EPOCH0) + timedelta(days=lag_days)
            if fts <= lts:
                key = (fts, i)
                if best is None or key > best[0]:
                    best = (key, fv)
        out.append((le, None if best is None else best[1], lv))
    return Counter(out)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(label_rows=rows_strategy, feat_rows=rows_strategy)
def test_pit_join_matches_naive(spark, label_rows, feat_rows):
    label = spark.createDataFrame(to_spark_rows(label_rows), SCHEMA)
    feat = FeatureInput(
        name="f", df=spark.createDataFrame(to_spark_rows(feat_rows), SCHEMA),
        entity_col="entity", value_col="value", ts_col="ts", order_col="ord",
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts")
    got = Counter((r["entity"], r["f"], r["label"]) for r in out.collect())
    assert got == naive_pit(label_rows, feat_rows)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(label_rows=rows_strategy, feat_rows=rows_strategy,
       lag=st.integers(min_value=1, max_value=3))
def test_pit_lag_matches_naive(spark, label_rows, feat_rows, lag):
    label = spark.createDataFrame(to_spark_rows(label_rows), SCHEMA)
    feat = FeatureInput(
        name="f", df=spark.createDataFrame(to_spark_rows(feat_rows), SCHEMA),
        entity_col="entity", value_col="value", ts_col="ts", order_col="ord",
        lag_seconds=lag * 86400.0,
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts")
    got = Counter((r["entity"], r["f"], r["label"]) for r in out.collect())
    assert got == naive_pit(label_rows, feat_rows, lag_days=lag)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(label_rows=rows_strategy, feat_rows=rows_strategy)
def test_pit_label_no_ts_matches_naive(spark, label_rows, feat_rows):
    """Label without a timestamp column → features as of +infinity."""
    label = spark.createDataFrame(to_spark_rows(label_rows), SCHEMA)
    feat = FeatureInput(
        name="f", df=spark.createDataFrame(to_spark_rows(feat_rows), SCHEMA),
        entity_col="entity", value_col="value", ts_col="ts", order_col="ord",
    )
    out = point_in_time_join(label, [feat], "entity", "value", None)
    got = Counter((r["entity"], r["f"], r["label"]) for r in out.collect())
    expected = naive_pit([(e, v, None) for e, v, _ in label_rows], feat_rows)
    assert got == expected


def test_split_assignment_is_pure_function_of_key(spark):
    import hashlib

    from featureform_spark.operators.split import threshold_hex, with_split_column

    df = spark.range(500).selectExpr("id")
    out = {r["id"]: r["is_test"]
           for r in with_split_column(df, ["id"], 0.2, seed=9).collect()}
    thr = threshold_hex(0.2)
    for i in range(500):
        h = hashlib.md5(f"{i}#9".encode()).hexdigest()[:8]
        assert out[i] == (1 if h < thr else 0)


def test_exact_split_counts_and_determinism(spark):
    """Exact-count contract (provider/clickhouse.go:1299-1305): the test
    set is EXACTLY int(total * frac) rows, and assignment equals the
    hash-rank computed independently in Python."""
    import hashlib

    from featureform_spark.operators.split import train_test_split_exact

    n, frac = 503, 0.3          # 503 * 0.3 = 150.9 → exactly 150 test rows
    df = spark.range(n).selectExpr("id")
    out = {r["id"]: r["is_test"]
           for r in train_test_split_exact(df, ["id"], frac, seed=7).collect()}
    assert sum(out.values()) == int(n * frac) == 150

    ranked = sorted(range(n), key=lambda i: hashlib.md5(f"{i}#7".encode()).hexdigest())
    expect_test = set(ranked[: int(n * frac)])
    for i in range(n):
        assert out[i] == (1 if i in expect_test else 0)

    # deterministic under re-partitioning
    out2 = {r["id"]: r["is_test"]
            for r in train_test_split_exact(
                df.repartition(13), ["id"], frac, seed=7).collect()}
    assert out2 == out


# --------------------------------------------------------------------------
# round-3 ops: session_window ≡ sessionize grouping; PQ partition-invariance
# --------------------------------------------------------------------------

_event_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # entity
        st.integers(min_value=0, max_value=7200),         # seconds offset
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_event_rows)
def test_session_window_groups_match_sessionize(spark, rows):
    """For ANY event set, the native session_window partitions events
    into exactly the same (entity, session) groups as the gap-arithmetic
    sessionize operator (both use merge-while-gap<=g semantics)."""
    from pyspark.sql import functions as F

    from featureform_spark.operators.asof import sessionize

    base = datetime(2024, 1, 1)
    data = [
        (i, e, base + timedelta(seconds=s)) for i, (e, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, entity long, ts timestamp")
    gap = 600  # 10 min

    native = (
        df.groupBy("entity", F.session_window("ts", f"{gap} seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("entity", "n")
    )
    native_sizes = sorted((r.entity, r.n) for r in native.collect())

    ours = (
        sessionize(df, "entity", "ts", gap, order_col="event_id")
        .groupBy("entity", "session_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("entity", "n")
    )
    ours_sizes = sorted((r.entity, r.n) for r in ours.collect())
    assert native_sizes == ours_sizes


def test_pq_encode_partition_invariant(spark, sf_dir):
    """Codes must not depend on physical row layout — repartitioning the
    corpus yields identical (id, codes)."""
    from featureform_spark.functions.quantization import pq_encode, pq_train
    from featureform_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_train(emb, dim=64, m=8, ksub=16)
    a = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, cb, dim=64, m=8).collect()
    }
    cb2 = pq_train(emb.repartition(7), dim=64, m=8, ksub=16)
    b = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb.repartition(5), cb2, dim=64, m=8).collect()
    }
    assert a == b


# ---------------------------------------------------------------- avro codec


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=-(2**62), max_value=2**62),
                "name": st.text(max_size=40),
                "score": st.floats(allow_nan=False, allow_infinity=False),
                "tags": st.lists(st.text(max_size=8), max_size=5),
                "props": st.dictionaries(
                    st.text(min_size=1, max_size=6),
                    st.integers(min_value=-(2**31), max_value=2**31),
                    max_size=4,
                ),
                "blob": st.one_of(st.none(), st.binary(max_size=20)),
            }
        ),
        max_size=30,
    ),
    st.sampled_from(["null", "deflate"]),
)
@settings(max_examples=40, deadline=None)
def test_avro_container_roundtrip_property(records, codec):
    """write_container → read_container is identity for arbitrary
    records over the full type surface the Iceberg metadata path uses
    (long/string/double/array/map/union-null/bytes)."""
    import os
    import tempfile

    from featureform_spark.sources.avro_codec import (
        read_container,
        write_container,
    )

    schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "blob", "type": ["null", "bytes"]},
        ],
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_container(p, schema, records, codec=codec)
        got_schema, got = read_container(p)
    assert got_schema == schema
    assert got == records


@given(
    st.one_of(
        st.tuples(st.just("int"), st.integers(-(2**31), 2**31 - 1)),
        st.tuples(st.just("long"), st.integers(-(2**63), 2**63 - 1)),
        st.tuples(
            st.just("double"),
            st.floats(allow_nan=False, allow_infinity=False),
        ),
        st.tuples(st.just("string"), st.text(max_size=60)),
        st.tuples(st.just("boolean"), st.booleans()),
    )
)
@settings(max_examples=60, deadline=None)
def test_iceberg_bound_roundtrip_property(tv):
    """encode_bound → decode_bound is identity across the single-value
    binary serialization (Iceberg spec)."""
    from featureform_spark.sources.iceberg_protocol import (
        decode_bound,
        encode_bound,
    )

    t, v = tv
    assert decode_bound(t, encode_bound(t, v)) == v


# ---------------------------------------------------------------------------
# deletion-vector roaring codec (sources/dv_bitmap.py)
# ---------------------------------------------------------------------------

_dv_positions = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=200_000),       # dense-ish lows
        st.integers(min_value=0, max_value=2**40),         # multi-bucket
    ),
    max_size=300,
)


@given(positions=_dv_positions)
@settings(max_examples=200, deadline=None)
def test_dv_roaring_roundtrip_property(positions):
    """encode→decode is identity on the position SET for arbitrary
    mixes of array containers, bitmap containers, and 32-bit buckets."""
    import numpy as np

    from featureform_spark.sources.dv_bitmap import (
        decode_rbm_array,
        encode_rbm_array,
    )

    arr = np.array(sorted(set(positions)), dtype=np.uint64)
    assert np.array_equal(decode_rbm_array(encode_rbm_array(arr)), arr)


@given(data=st.binary(min_size=0, max_size=64).map(lambda b: b + b"\x00" * ((-len(b)) % 4)))
@settings(max_examples=200, deadline=None)
def test_z85_roundtrip_property(data):
    from featureform_spark.sources.dv_bitmap import z85_decode, z85_encode

    enc = z85_encode(data)
    assert len(enc) == len(data) // 4 * 5
    assert z85_decode(enc) == data


@given(
    positions=st.lists(
        st.integers(min_value=0, max_value=2**33), max_size=50
    ),
    flip=st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=50, deadline=None)
def test_dv_file_framing_rejects_corruption(tmp_path_factory, positions, flip):
    """A framed DV whose payload is bit-flipped must fail the CRC, not
    decode to silently-wrong deleted rows."""
    import struct
    import zlib

    import numpy as np

    from featureform_spark.sources.dv_bitmap import (
        DvFormatError,
        encode_rbm_array,
        read_dv_from_file,
    )

    blob = encode_rbm_array(np.array(sorted(set(positions)), dtype=np.uint64))
    framed = (
        b"\x01"
        + struct.pack(">I", len(blob))
        + blob
        + struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF)
    )
    p = tmp_path_factory.mktemp("dv") / "dv.bin"
    p.write_bytes(framed)
    assert read_dv_from_file(str(p), 1, len(blob)) == blob
    corrupt = bytearray(framed)
    corrupt[5 + (flip % len(blob))] ^= 0xA5
    p.write_bytes(bytes(corrupt))
    with pytest.raises(DvFormatError):
        read_dv_from_file(str(p), 1, len(blob))


# ---------------------------------------------------------------------------
# dedup_substrings vs a naive Python reference
# ---------------------------------------------------------------------------

words = st.sampled_from(["x", "y", "z"])
docs_strategy = st.lists(
    st.lists(words, max_size=10).map(lambda ws: " ".join(ws)),
    min_size=1,
    max_size=4,
)


def _py_dedup_substrings(texts, L):
    """Naive reference: mark every non-first occurrence of each
    duplicated L-token rolling shingle; remove covered tokens."""
    toks = [[w for w in t.split(" ") if w] for t in texts]
    occ = {}
    for d, ts in enumerate(toks):
        for p in range(len(ts) - L + 1):
            occ.setdefault(" ".join(ts[p : p + L]), []).append((d, p))
    removed = [set() for _ in toks]
    for positions in occ.values():
        if len(positions) > 1:
            for d, p in positions[1:]:  # positions already (doc, pos) asc
                removed[d].update(range(p, p + L))
    out = []
    for d, ts in enumerate(toks):
        kept = [w for i, w in enumerate(ts) if i not in removed[d]]
        out.append((" ".join(kept), len(kept), len(ts)))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy, L=st.integers(min_value=1, max_value=3))
def test_dedup_substrings_matches_reference(spark, docs, L):
    from featureform_spark.functions.dedup import dedup_substrings

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_tokens"])
        for r in dedup_substrings(df, min_tokens=L).collect()
    }
    expect = _py_dedup_substrings(docs, L)
    for d in range(len(docs)):
        assert got[d] == expect[d], (d, docs, L)
