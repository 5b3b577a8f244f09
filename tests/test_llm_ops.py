"""Behavioral tests for the LLM-data-pipeline operators: planted
duplicates must be found, distinct content must not collide."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signature,
    simhash,
)
from featureform_spark.functions.similarity import (
    ann_topk_lsh,
    cosine_topk,
    hyperplane_lsh_buckets,
)
from featureform_spark.functions.text import language_id, text_stats

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one token changed
OTHER = (
    "completely different content about spark execution engines and "
    "distributed shuffle strategies for petabyte scale analytics jobs"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, NEAR), (2, OTHER), (3, BASE)],
        "doc_id long, text string",
    )


def test_dedup_exact_groups_identical(spark, docs):
    out = dedup_exact(docs).collect()
    groups = {r["keep_id"]: r["dup_count"] for r in out}
    assert groups[0] == 2  # docs 0 and 3 identical, keep min id
    assert groups[1] == 1 and groups[2] == 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.2).collect()
    }
    assert pairs[(0, 3)] == 1.0          # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5  # near dup
    assert not any(2 in p for p in pairs)  # unrelated never pairs


def test_minhash_signature_identical_for_identical_docs(spark, docs):
    sigs = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(24))
            for r in minhash_signature(docs).collect()}
    assert sigs[0] == sigs[3]
    assert sigs[0] != sigs[2]


def test_simhash_near_dup_small_hamming(spark, docs):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fps[0] == fps[3]
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    assert ham(fps[0], fps[1]) <= 6      # near dup → close fingerprints
    assert ham(fps[0], fps[2]) > 6       # distinct → far


def test_cosine_topk_self_first(spark):
    vecs = [(i, [float(i == j) for j in range(8)]) for i in range(8)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = cosine_topk(df, [1.0, 0, 0, 0, 0, 0, 0, 0.1], k=3).collect()
    assert out[0]["vec_id"] == 0 and out[0]["score"] > 0.9


def test_lsh_bucket_groups_similar(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    perturbed = [x + rng.gauss(0, 0.01) for x in base]
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(0, base), (1, perturbed), (2, far)],
        "vec_id long, embedding array<float>",
    )
    buckets = {r["vec_id"]: r["bucket"] for r in
               hyperplane_lsh_buckets(df, dim=16, num_planes=8).collect()}
    assert buckets[0] == buckets[1]
    assert buckets[0] != buckets[2]
    ann = ann_topk_lsh(df, base, k=2, num_planes=8)
    got = [r["vec_id"] for r in ann.collect()]
    assert got[0] == 0 and 2 not in got


def test_ivf_full_probe_equals_exact(spark):
    """Probing every cell must reduce IVF to exact brute-force top-k."""
    import random

    from featureform_spark.functions.similarity import ivf_topk

    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = [r["vec_id"] for r in
             cosine_topk(df, [float(x) for x in vecs[5][1]], k=5).collect()]
    full = ivf_topk(df, query_id=5, k=5, num_centroids=4, nprobe=4)
    assert [r["vec_id"] for r in full.collect()] == exact


def test_ivf_probe_subset_contains_query(spark):
    """nprobe < num_centroids: the query's own cell is always probed, so
    the query vector itself must rank first."""
    import random

    from featureform_spark.functions.similarity import ivf_topk

    rng = random.Random(13)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = ivf_topk(df, query_id=7, k=3, num_centroids=8, nprobe=2).collect()
    assert out[0]["vec_id"] == 7 and out[0]["score"] > 0.999


def test_text_stats_ranges(spark, docs):
    out = {r["doc_id"]: r for r in text_stats(docs).collect()}
    for r in out.values():
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_distinct_tokens"] <= r["n_tokens"]
    assert out[0]["stopword_ratio"] > out[2]["stopword_ratio"]


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [(0, "the cat is of the house and it is big"),
         (1, "el gato es de la casa y es grande"),
         (2, "xyzzy plugh qwerty")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "und"


def test_lang_id_model_beats_heuristic(spark):
    """Held-out sentences (not in the training fixtures) across five of
    the model languages: the trained char-trigram NB must classify all of
    them; the marker heuristic has no Italian markers and misses
    marker-free phrasing, so NB accuracy is strictly higher."""
    from featureform_spark.functions.langid_model import lang_id_model

    eval_rows = [
        (0, "en", "she opened the window and looked at the bright morning sky"),
        (1, "en", "nobody remembered where that narrow path finally ended"),
        (2, "es", "abrio la ventana y miro el cielo brillante de la manana"),
        (3, "es", "nadie recordaba donde terminaba finalmente aquel camino estrecho"),
        (4, "fr", "elle a ouvert la fenetre et regarde le ciel clair du matin"),
        (5, "fr", "personne ne savait ou ce chemin etroit finissait vraiment"),
        (6, "de", "sie oeffnete das fenster und sah den hellen morgenhimmel"),
        (7, "de", "niemand wusste wo dieser schmale weg wirklich endete"),
        (8, "it", "apri la finestra e guardo il cielo luminoso del mattino"),
        (9, "it", "nessuno ricordava dove finiva davvero quel sentiero stretto"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in eval_rows], ["doc_id", "text"]
    )
    truth = {i: lang for i, lang, _ in eval_rows}
    nb = {r["doc_id"]: r["lang_pred"] for r in lang_id_model(df).collect()}
    heur = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    nb_acc = sum(nb[i] == truth[i] for i in truth) / len(truth)
    heur_acc = sum(heur[i] == truth[i] for i in truth) / len(truth)
    assert nb_acc == 1.0
    assert nb_acc > heur_acc


def test_lang_id_model_multilingual_held_out(spark):
    """Held-out accuracy over the FULL 15-language model (round-9
    widening: +pt nl sv da fi pl tr ro ca id): two unseen sentences per
    language, all 30 must classify correctly — including the
    notoriously-confusable pairs (sv/da, es/pt/ca)."""
    from featureform_spark.functions.langid_model import (
        LANG_FIXTURES,
        lang_id_model,
    )

    held = {
        "en": ["the old man closed the door and walked slowly toward the market",
               "nobody remembered where that narrow path finally ended"],
        "es": ["el hombre viejo cerro la puerta y camino despacio hacia el mercado",
               "nadie recordaba donde terminaba finalmente aquel camino estrecho"],
        "fr": ["le vieil homme a ferme la porte et marche lentement vers le marche",
               "personne ne savait ou ce chemin etroit finissait vraiment"],
        "de": ["der alte mann schloss die tuer und ging langsam zum markt",
               "niemand wusste wo dieser schmale weg wirklich endete"],
        "it": ["il vecchio chiuse la porta e cammino lentamente verso il mercato",
               "nessuno ricordava dove finiva davvero quel sentiero stretto"],
        "pt": ["o velho fechou a porta e caminhou devagar em direcao ao mercado",
               "ninguem lembrava onde aquele caminho estreito finalmente terminava"],
        "nl": ["de oude man sloot de deur en liep langzaam naar de markt",
               "niemand wist waar dat smalle pad eigenlijk eindigde"],
        "sv": ["den gamle mannen stangde dorren och gick langsamt mot marknaden",
               "ingen visste var den smala stigen egentligen slutade"],
        "da": ["den gamle mand lukkede doren og gik langsomt mod markedet",
               "ingen vidste hvor den smalle sti egentlig endte"],
        "fi": ["vanha mies sulki oven ja kaveli hitaasti kohti toria",
               "kukaan ei tiennyt missa kapea polku oikeastaan paattyi"],
        "pl": ["stary czlowiek zamknal drzwi i poszedl powoli w strone rynku",
               "nikt nie wiedzial gdzie ta waska sciezka naprawde sie konczyla"],
        "tr": ["cocuklar sabahlari okula giderken kitaplar hakkinda konusuyorlar",
               "kimse o dar yolun gercekte nerede bittigini bilmiyordu"],
        "ro": ["batranul a inchis usa si a mers incet spre piata",
               "nimeni nu stia unde se termina cu adevarat acea poteca ingusta"],
        "ca": ["el vell va tancar la porta i va caminar a poc a poc cap al mercat",
               "ningu no sabia on acabava realment aquell cami estret"],
        "id": ["orang tua itu menutup pintu dan berjalan perlahan menuju pasar",
               "tidak ada yang tahu di mana jalan sempit itu sebenarnya berakhir"],
    }
    assert set(held) == set(LANG_FIXTURES)
    for lang, sents in held.items():
        for s in sents:
            assert s not in LANG_FIXTURES[lang]
    rows = [
        (i, lang, s)
        for i, (lang, s) in enumerate(
            (lang, s) for lang in sorted(held) for s in held[lang]
        )
    ]
    df = spark.createDataFrame(
        [(i, s) for i, _, s in rows], ["doc_id", "text"]
    )
    pred = {r["doc_id"]: r["lang_pred"] for r in lang_id_model(df).collect()}
    wrong = [(i, lang, pred[i]) for i, lang, _ in rows if pred[i] != lang]
    assert not wrong, wrong


def test_lang_id_model_unknown_margin(spark):
    """The explicit unknown class: with a per-trigram log-odds margin,
    out-of-model text (gibberish, source code) whose best-vs-runner-up
    gap is a coin flip routes to 'und', while confidently-classified
    prose keeps its label. margin=0 (default) disables the rule, and
    nb_score stays the best-language score either way (auditable)."""
    from featureform_spark.functions.langid_model import lang_id_model

    rows = [
        (0, "the old man closed the door and walked slowly toward the market"),
        (1, "vanha mies sulki oven ja kaveli hitaasti kohti toria"),
        (2, "xq zvb kkj qqw pzx vxk jjq wxz qkp zzv"),
        (3, "def frobnicate(x): return x * 42 + offset[3]"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["lang_pred"], r["nb_score"])
        for r in lang_id_model(df, unknown_margin=0.02).collect()
    }
    assert out[0][0] == "en"
    assert out[1][0] == "fi"
    assert out[2][0] == "und" and out[2][1] < 0.0  # score stays auditable
    assert out[3][0] == "und"
    # default margin=0: the coin-flip winner comes back (not 'und')
    base = {
        r["doc_id"]: r["lang_pred"] for r in lang_id_model(df).collect()
    }
    assert base[2] != "und" and base[3] != "und"
    assert base[0] == "en" and base[1] == "fi"


def test_lang_id_model_fold_evaluates_once_under_filter(spark):
    """Plan guard for the Generate barrier: a filter on lang_pred must
    NOT re-inline the per-trigram fold into its predicate (predicate
    pushdown substitution cost 38 s vs 4 s at sf0.1). The optimized
    plan keeps one Generate and exactly one aggregate(...) fold."""
    from featureform_spark.functions.langid_model import lang_id_model
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "the weather is good")], "doc_id long, text string"
    )
    filtered = (
        lang_id_model(df, kernel=False)
        .filter(F.col("lang_pred") == "en")
        .select("doc_id")
    )
    # raise the toString field cap: truncation ('... N more fields')
    # could hide a duplicated fold and falsely pass the guard
    prev = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try:
        plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev)
    assert "more fields" not in plan
    assert plan.count("aggregate(") == 1, plan
    assert "Generate" in plan


def test_lang_id_model_edge_cases(spark):
    from featureform_spark.functions.langid_model import lang_id_model

    df = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "the weather is good and the garden is quiet")],
        "doc_id long, text string",
    )
    from featureform_spark.functions.langid_model import train_char_ngram_nb

    out = {r["doc_id"]: (r["lang_pred"], r["nb_score"]) for r in lang_id_model(df).collect()}
    assert out[0] == ("und", 0.0)  # no trigrams at all
    assert out[1][0] in {"und", *train_char_ngram_nb()["langs"]}  # ' ab ' has trigrams
    assert out[2][0] == "en" and out[2][1] < 0.0


def test_langid_kernel_bit_identical(spark, sf_dir):
    """The Arrow scoring kernel (default path) must reproduce the
    interpreted HOF fold to the last ulp on real corpus text — same
    quantized weights folded in the same order, exact equality on both
    lang_pred and the 6dp-rounded score."""
    from featureform_spark.functions.langid_model import lang_id_model
    from featureform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    hof = {
        r["doc_id"]: (r["lang_pred"], r["nb_score"])
        for r in lang_id_model(docs, kernel=False).collect()
    }
    ker = {
        r["doc_id"]: (r["lang_pred"], r["nb_score"])
        for r in lang_id_model(docs, kernel=True).collect()
    }
    assert hof == ker


def test_langid_kernel_udf_evaluates_once_under_filter(spark):
    """The kernel-path analog of the Generate barrier guard: filtering
    on lang_pred must leave exactly ONE Python UDF evaluation in the
    optimized plan (the filter stays above the ArrowEvalPython node
    rather than re-inlining the scorer into its predicate)."""
    from featureform_spark.functions.langid_model import lang_id_model
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "the weather is good")], "doc_id long, text string"
    )
    filtered = (
        lang_id_model(df, kernel=True)
        .filter(F.col("lang_pred") == "en")
        .select("doc_id")
    )
    prev = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try:
        plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev)
    assert "more fields" not in plan
    assert plan.count("_score(") == 1, plan


def test_quality_model_separates_heldout(spark):
    """The trained classifier must separate HELD-OUT prose from
    boilerplate (not just its training fixtures) and agree with its
    pure-python training-time twin bit-for-bit."""
    from featureform_spark.functions.quality_model import (
        _py_features,
        quality_model_score,
        train_quality_model,
    )

    heldout = [
        (0, 1, "the long road through the forest finally opened onto a "
               "field of tall grass where the children had built a small "
               "wooden bridge over the stream"),
        (1, 1, "careful observation over many seasons showed that the "
               "birds returned to the same nesting sites and raised "
               "their young in the same order each year"),
        (2, 0, "sale sale sale buy buy buy cheap cheap cheap now now now"),
        (3, 0, "link link link click click click free free free"),
        (4, 0, ""),  # empty: all-zero features -> bias only
    ]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in heldout], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["quality_logit"], r["keep"])
           for r in quality_model_score(df).collect()}
    for i, label, _t in heldout[:4]:
        assert out[i][1] == (label == 1), (i, out[i])
    m = train_quality_model()
    for i, _label, t in heldout:
        x = _py_features(t)
        # fold in the engine's order: ((((b + w0x0) + w1x1) + ...)
        expect = m["b"]
        for w, xi in zip(m["w"], x):
            expect = expect + w * xi
        assert out[i][0] == expect  # bit-exact, no tolerance
    assert out[4][1] is False  # empty doc: negative bias


def test_dedup_blocks_first_occurrence_wins(spark):
    from featureform_spark.functions.dedup import dedup_blocks

    rows = [
        (1, "a b c d"),       # block "a b" and "c d" (B=2)
        (2, "a b x y"),       # "a b" duplicates doc 1 -> dropped
        (3, "c d c d"),       # within-doc repeat: second "c d" dropped too
        (4, ""),              # empty doc keeps its row
        (5, "a b"),           # fully duplicated -> text_clean == ""
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_blocks"])
        for r in dedup_blocks(df, block_tokens=2).collect()
    }
    assert out[1] == ("a b c d", 2, 2)
    assert out[2] == ("x y", 1, 2)
    assert out[3] == ("", 0, 2)        # both "c d" blocks lose to doc 1
    assert out[4] == ("", 0, 0)
    assert out[5] == ("", 0, 1)


def test_dedup_blocks_partial_tail_block(spark):
    from featureform_spark.functions.dedup import dedup_blocks

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    row = dedup_blocks(df, block_tokens=2).first()
    assert row["n_blocks"] == 2 and row["text_clean"] == "a b c"
    with pytest.raises(ValueError):
        dedup_blocks(df, block_tokens=0)


def test_dedup_substrings_catches_straddling_duplicates(spark):
    """A duplicated span NOT aligned to block boundaries: dedup_blocks
    (fixed 8-token blocks) misses it entirely, dedup_substrings
    (rolling shingles) removes the later copy and keeps the first."""
    from featureform_spark.functions.dedup import dedup_blocks, dedup_substrings

    span = " ".join(f"w{i}" for i in range(12))  # 12 shared tokens
    rows = [
        (1, "p0 p1 p2 " + span + " p3"),  # span at offset 3
        (2, span + " q0 q1"),             # same span at offset 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    blocks = {
        r["doc_id"]: r["n_kept"] for r in dedup_blocks(df, 8).collect()
    }
    # block-quantized form sees no duplicate 8-token block (misaligned)
    assert blocks[1] == 2 and blocks[2] == 2  # all blocks kept
    out = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_tokens"])
        for r in dedup_substrings(df, min_tokens=8).collect()
    }
    # doc 1 is the first occurrence -> untouched
    assert out[1] == ("p0 p1 p2 " + span + " p3", 16, 16)
    # doc 2 loses the 12 straddling tokens, keeps its unique tail
    assert out[2] == ("q0 q1", 2, 14)


def test_dedup_substrings_within_doc_and_edge_cases(spark):
    from featureform_spark.functions.dedup import dedup_substrings

    span = " ".join(f"t{i}" for i in range(8))
    rows = [
        (1, span + " mid " + span),  # within-doc repeat: 2nd copy removed
        (2, "short text only"),      # under min_tokens: untouched
        (3, ""),                     # empty doc keeps its row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_tokens"])
        for r in dedup_substrings(df, min_tokens=8).collect()
    }
    assert out[1] == (span + " mid", 9, 17)
    assert out[2] == ("short text only", 3, 3)
    assert out[3] == ("", 0, 0)
    with pytest.raises(ValueError):
        dedup_substrings(df, min_tokens=0)


def test_dedup_substrings_hash_shuffle_equivalent(spark, sf_dir):
    """The 100-TB hash-narrow shuffle variant (xxhash64 shingle keys)
    must produce the exact result of the full-text form on real
    document data."""
    from featureform_spark.functions.dedup import dedup_substrings
    from featureform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["doc_id"]: (r["text_clean"], r["n_kept"])
        for r in dedup_substrings(docs, min_tokens=8).collect()
    }
    hashed = {
        r["doc_id"]: (r["text_clean"], r["n_kept"])
        for r in dedup_substrings(docs, min_tokens=8, hash_shuffle=True).collect()
    }
    assert hashed == exact


def test_multiprobe_lsh_superset_of_single_probe(spark, sf_dir):
    from featureform_spark.functions.similarity import ann_topk_lsh
    from featureform_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    single = ann_topk_lsh(emb, qvec, k=1000, num_planes=8)
    multi = ann_topk_lsh(emb, qvec, k=1000, num_planes=8, hamming_radius=1)
    s_ids = {r.vec_id for r in single.collect()}
    m_ids = {r.vec_id for r in multi.collect()}
    assert s_ids <= m_ids          # probe set only grows
    assert len(m_ids) > len(s_ids)  # and actually recovers more candidates


def test_ivf_lloyd_refined_path(spark, sf_dir):
    from featureform_spark.functions.similarity import ivf_topk
    from featureform_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, 0, k=10, num_centroids=8, nprobe=2, lloyd_iters=1)
    rows = out.collect()
    assert len(rows) == 10
    assert rows[0].vec_id == 0  # the query itself is its own nearest
    again = ivf_topk(emb, 0, k=10, num_centroids=8, nprobe=2, lloyd_iters=1)
    assert [(r.vec_id, r.score) for r in again.collect()] == [
        (r.vec_id, r.score) for r in rows
    ]


def test_hard_negatives_labels_differ_and_rank_bounded(spark, sf_dir):
    from featureform_spark.functions.similarity import hard_negatives
    from featureform_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, dim=64, k=3, num_planes=8).collect()
    assert out, "bucketed candidates should yield at least some pairs"
    per_anchor = {}
    for r in out:
        assert labels[r.anchor_id] != labels[r.negative_id]
        assert 1 <= r.rank <= 3
        per_anchor.setdefault(r.anchor_id, []).append(r)
    for rows in per_anchor.values():
        cos = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)  # rank order == similarity order


def test_pandas_kernels_bit_identical(spark, sf_dir):
    """The Arrow kernels must reproduce the HOF fold expressions to the
    last ulp — exact float equality, not approx."""
    from pyspark.sql import functions as F

    from featureform_spark.functions.similarity import (
        _as_double,
        bucket_expr,
        bucket_pandas,
        cosine_expr,
        cosine_pandas,
        dot_expr,
        dot_pandas,
        norm_expr,
        norm_pandas,
    )
    from featureform_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("a")
    ).withColumn("b", F.reverse(F.col("a")))

    got = df.select(
        "vec_id",
        dot_expr(F.col("a"), F.col("b")).alias("dot_h"),
        dot_pandas()(F.col("a"), F.col("b")).alias("dot_p"),
        cosine_expr(F.col("a"), F.col("b")).alias("cos_h"),
        cosine_pandas()(F.col("a"), F.col("b")).alias("cos_p"),
        norm_expr(F.col("a")).alias("n_h"),
        norm_pandas()(F.col("a")).alias("n_p"),
        bucket_expr(F.col("a"), 64, 8).alias("b_h"),
        bucket_pandas(64, 8)(F.col("a")).alias("b_p"),
    ).collect()
    assert len(got) > 0
    for r in got:
        assert r["dot_h"] == r["dot_p"]
        assert r["cos_h"] == r["cos_p"]
        assert r["n_h"] == r["n_p"]
        assert r["b_h"] == r["b_p"]


def test_dedup_sentences_semantics(spark):
    """First occurrence kept, order preserved, counts right — on text
    WITH real sentence separators."""
    from featureform_spark.functions.text import dedup_sentences

    df = spark.createDataFrame(
        [
            (1, "buy now. great deal. buy now. limited time. great deal"),
            (2, "unique one. unique two"),
            (3, "same. same. same"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedup_sentences(df, sep=". ").collect()
    }
    assert got[1]["clean_text"] == "buy now. great deal. limited time"
    assert got[1]["n_sentences"] == 5 and got[1]["n_removed"] == 2
    assert got[2]["clean_text"] == "unique one. unique two"
    assert got[2]["n_removed"] == 0
    assert got[3]["clean_text"] == "same"
    assert got[3]["n_removed"] == 2


def test_cross_doc_line_dedup_exact(spark):
    """Handcrafted corpus: the shared footer (3 docs) goes, unique
    bodies stay in order, within-doc repeats of surviving lines are
    untouched, and a fully-boilerplate doc comes back empty."""
    from featureform_spark.functions.dedup import cross_doc_line_dedup

    df = spark.createDataFrame(
        [
            ("a", "alpha one. FOOTER. alpha two"),
            ("b", "beta one. beta one. FOOTER"),
            ("c", "gamma. FOOTER. gamma"),
            ("d", "FOOTER"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in cross_doc_line_dedup(df, min_docs=3).collect()
    }
    assert got["a"]["clean_text"] == "alpha one. alpha two"
    assert got["a"]["n_lines"] == 3 and got["a"]["n_removed"] == 1
    # within-doc repeat of a NON-boilerplate line survives twice
    assert got["b"]["clean_text"] == "beta one. beta one"
    # so does a repeat around the removed footer
    assert got["c"]["clean_text"] == "gamma. gamma"
    # fully-boilerplate doc: present, empty, all removed
    assert got["d"]["clean_text"] == ""
    assert got["d"]["n_lines"] == 1 and got["d"]["n_removed"] == 1
    # below threshold nothing is touched
    unchanged = cross_doc_line_dedup(df, min_docs=5)
    assert unchanged.filter(F.col("n_removed") > 0).count() == 0


def test_script_profile_exact(spark):
    from featureform_spark.functions.text import script_profile

    df = spark.createDataFrame(
        [("a", "abc привет 12"), ("b", "数据"), ("c", "")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    a = got["a"]
    assert a["n_chars"] == 13
    assert abs(a["latin_ratio"] - 3 / 13) < 1e-12
    assert abs(a["cyrillic_ratio"] - 6 / 13) < 1e-12
    assert abs(a["digit_ratio"] - 2 / 13) < 1e-12
    assert a["keep_latin"] == 0
    assert got["b"]["cjk_ratio"] == 1.0
    assert got["c"]["n_chars"] == 0 and got["c"]["latin_ratio"] == 0.0


def test_corpus_clean_base_single_scan_plan(spark):
    """corpus_clean_v2's filter stage must be a single-pass
    projection+filter: NO Join anywhere in the optimized plan (the
    models compose as expression-form scorers, not doc_id semi-joins)
    and exactly ONE Arrow kernel evaluation (the lang predictor's two
    textual references deduplicate into one ArrowEvalPython)."""
    from featureform_spark.suite_llm import _corpus_clean_base

    df = spark.createDataFrame(
        [(0, "the weather is good and the garden is quiet today"),
         (1, "sale sale sale buy buy buy cheap cheap cheap now")],
        "doc_id long, text string",
    )
    base = _corpus_clean_base(df)
    prev = spark.conf.get("spark.sql.debug.maxToStringFields", "25")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try:
        plan = base._jdf.queryExecution().optimizedPlan().toString()
    finally:
        spark.conf.set("spark.sql.debug.maxToStringFields", prev)
    assert "more fields" not in plan
    assert "Join" not in plan, plan
    assert plan.count("_score(") == 1, plan


def test_corpus_clean_base_matches_joined_composition(spark):
    """The single-scan base must keep exactly the docs the r7
    join-composition kept: quality keep AND lang_pred == 'en'."""
    from pyspark.sql import functions as F

    from featureform_spark.functions.langid_model import lang_id_model
    from featureform_spark.functions.quality_model import quality_model_score
    from featureform_spark.suite_llm import _corpus_clean_base

    rows = [
        (0, "the history of the old town is written in its streets and "
            "the stories people tell about the market square"),
        (1, "cheap cheap cheap deal deal deal sale sale sale now now"),
        (2, "el rapido zorro marron salta sobre el perro perezoso y corre "
            "hacia el bosque donde encuentra un rio tranquilo"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keep = quality_model_score(df).filter(F.col("keep")).select("doc_id")
    en = lang_id_model(df).filter(F.col("lang_pred") == "en").select("doc_id")
    joined = sorted(
        r["doc_id"]
        for r in df.join(keep, "doc_id").join(en, "doc_id").collect()
    )
    single = sorted(r["doc_id"] for r in _corpus_clean_base(df).collect())
    assert single == joined
    assert 0 in single and 1 not in single and 2 not in single


def test_code_detect_oracle_nontrivial_on_code_symbols(spark, tmp_path):
    """The code_detect DuckDB oracle must agree with the Spark operator
    on documents that actually CONTAIN code symbols (the sf corpora
    happen to be symbol-free, which once masked a vacuous oracle whose
    regex placeholders never substituted)."""
    import duckdb
    import pandas as pd

    from featureform_spark.suite import all_oracles

    ORACLES = all_oracles()

    rows = [
        (0, "def f(x):\n    return {x: [1, 2]};\n    y = x < 3;"),
        (1, "plain prose with no code symbols at all just words"),
        (2, "for (i = 0; i < 10; i++) { a[i] = b[i]; }\n\tdone();"),
        (3, ""),
        (4, "numbers 123 456 789 but prose"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sql = ORACLES["code_detect"]
    assert "{_sym}" not in sql and "{_brc}" not in sql
    assert "[{}();=" in sql  # the real character class substituted in
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = (
        con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    )

    from featureform_spark.functions.quality import code_detect

    got = (
        code_detect(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["is_code"].tolist() == oracle["is_code"].tolist()
    assert bool(got["is_code"][0]) and bool(got["is_code"][2])
    assert not bool(got["is_code"][1]) and not bool(got["is_code"][3])
    for col in ("symbol_density", "brace_density", "digit_ratio",
                "indent_frac"):
        assert got[col].tolist() == oracle[col].tolist(), col


def test_text_normalize_unicode_whitespace_parity(spark, tmp_path):
    """Regression for the \\s semantics gap: Python's \\s is
    Unicode-aware (NBSP, U+2028, ...) while DuckDB's RE2 \\s is
    ASCII-only and omits \\v. Both engines now spell the whitespace
    class as the explicit ASCII set and trim only ' ', so documents
    containing Unicode whitespace hash identically cross-engine."""
    import duckdb
    import pandas as pd

    from featureform_spark.suite_llm import text_normalize_q
    from featureform_spark.suite import all_oracles

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "plain  ascii\t\n collapse",
                "nbsp stays  one word",      # U+00A0 untouched
                " line sep  and 　ideo", # U+2028/U+3000
                "vertical\x0btab\x0bruns",             # \v in the class
                "  lead trail  ",
            ],
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [1] * 5,
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    got = (
        text_normalize_q(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = (
        con.execute(all_oracles()["text_normalize"] + " ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    assert got["h"].tolist() == want["h"].tolist()
    assert got["n_norm"].tolist() == want["n_norm"].tolist()
    # NBSP preserved (neither engine's class touches it)
    assert " " not in "".join(got["h"])  # sanity: hashes are hex
