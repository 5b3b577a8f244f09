"""Connected components, tf-idf, and stratified sampling unit tests on
shapes the suite's generated data doesn't cover (long chains, stars,
multi-component graphs)."""

from pyspark.sql import functions as F

from featureform_spark.functions.graph import connected_components
from featureform_spark.functions.text import tf_idf
from featureform_spark.operators.split import stratified_sample


def _clusters(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_cc_two_components(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges_fast(spark):
    # path 0-1-...-20: pointer compression must converge well under the
    # diameter (simple propagation would need 20 rounds)
    edges = [(i, i + 1) for i in range(20)]
    got = _clusters(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 21


def test_cc_star_and_self_loop(spark):
    got = _clusters(spark, [(5, 1), (5, 2), (5, 3), (7, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7}


def test_tfidf_ranks_rare_terms_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare1"),
            (2, "common rare2"),
            (3, "common common common"),
        ],
        ["doc_id", "text"],
    )
    out = tf_idf(docs, top_k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # at equal tf, the rare terms (df=1) outscore 'common' (df=3);
    # doc 3 has only 'common'
    assert top[1] == "rare1"
    assert top[2] == "rare2"
    assert top[3] == "common"
    r1 = {r["doc_id"]: r for r in out}[1]
    assert r1["df_docs"] == 1 and r1["tf"] == 1
    assert abs(r1["score"] - 1 * (3 + 1.0) / (1 + 1.0)) < 1e-12


def test_tfidf_tie_break_term_asc(spark):
    docs = spark.createDataFrame([(1, "zz aa")], ["doc_id", "text"])
    out = tf_idf(docs, top_k=1).collect()
    assert out[0]["term"] == "aa"


def test_stratified_sample_deterministic_and_bounded(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "g"])
    s1 = stratified_sample(df, "g", {"a": 0.3}, ["k"], seed=9)
    s2 = stratified_sample(df, "g", {"a": 0.3}, ["k"], seed=9)
    got1 = sorted(r["k"] for r in s1.collect())
    got2 = sorted(r["k"] for r in s2.collect())
    assert got1 == got2  # pure function of (key, seed)
    assert all(k % 2 == 0 for k in got1)  # stratum 'b' dropped (frac 0)
    assert 0.2 < len(got1) / 1000 < 0.4  # ~30% of the 1000 'a' rows


def test_stratified_sample_fraction_one_keeps_all(spark):
    """ADVICE r01: frac >= 1.0 must keep the WHOLE stratum (the naive
    9-char hex threshold kept only hashes starting with '0')."""
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "g"])
    out = stratified_sample(df, "g", {"a": 1.0, "b": 0.0}, ["k"], seed=9)
    got = sorted(r["k"] for r in out.collect())
    assert got == [k for k in range(200) if k % 2 == 0]


def test_threshold_hex_clamps():
    from featureform_spark.operators.split import threshold_hex

    assert threshold_hex(1.0) == "g"
    assert threshold_hex(1.5) == "g"
    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(-0.1) == "00000000"
    assert threshold_hex(0.5) == "80000000"


def test_connected_components_string_ids(spark):
    """ADVICE r01: convergence must not rely on numeric label sums —
    string node ids NULLed the decimal cast and broke the loop after
    one iteration, silently returning unconverged clusters."""
    from featureform_spark.functions.graph import connected_components

    # a chain long enough to need >1 round: a-b-c-d-e-f, plus x-y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("x", "y")],
        ["src", "dst"],
    )
    out = {r["id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert {out[n] for n in "abcdef"} == {"a"}
    assert {out[n] for n in "xy"} == {"x"}


def test_cc_distributed_path_matches_union_find(spark):
    """Force the distributed label-propagation loop
    (small_graph_threshold=0) and assert identical components to the
    driver union-find fast path on an awkward shape (chain + star +
    singleton-pair + cycle)."""
    from featureform_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 30)]            # long chain
        + [(100, 100 + i) for i in range(1, 8)]       # star
        + [(200, 201)]                                # pair
        + [(300, 301), (301, 302), (302, 300)],       # cycle
        "src long, dst long",
    )
    fast = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    dist = {
        (r["id"], r["cluster_id"])
        for r in connected_components(
            edges, small_graph_threshold=0
        ).collect()
    }
    assert fast == dist
    assert ({(i, 0) for i in range(31)}) <= fast
