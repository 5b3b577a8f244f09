"""LLM-training-data suite entries: dedup, text analysis, similarity.

Oracle SQL is generated programmatically so the md5-based determinism
tricks (lexicographic min-md5 minhash, md5-hex-digit simhash bits,
Python-precomputed hyperplane signs, list_prepend(0.0) to mirror Spark's
fold init) stay in exact lockstep with the Spark implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featureform_spark.functions.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signature,
    simhash,
)
from featureform_spark.functions.similarity import (
    cosine_topk,
    hyperplane_lsh_buckets,
    hyperplane_signs,
)
from featureform_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    doc_fingerprint,
    language_id,
    text_stats,
)
from featureform_spark.sources.testdata import load_table
from featureform_spark.suite import query

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _sql_in(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           LENGTH(t) AS n_norm,
           md5(t) AS h
    FROM (
      SELECT doc_id,
             trim(regexp_replace(nfc_normalize(text),
                                 '[ \t\n\r\f\v]+', ' ', 'g'), ' ')
               AS t
      FROM documents
    )
    """,
)
def text_normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC text normalization — the canonical preprocessing
    stage before any hash-based dedup (decomposed accents, fullwidth
    forms, and mixed whitespace must hash identically or near-dup
    clusters silently fragment). One Arrow kernel per batch
    (unicodedata.normalize is the same Unicode algorithm DuckDB's
    nfc_normalize implements, so md5s are bit-identical
    cross-engine); whitespace runs collapse + trim inside the same
    kernel. Both engines spell the whitespace class as the explicit
    ASCII set [ \\t\\n\\r\\f\\v] — Python's \\s is Unicode-aware and
    RE2's \\s omits \\v, so a shared literal class is the only
    spelling with identical semantics — and both trim ONLY the
    ASCII space left by the collapse (Python .strip() would also
    eat NBSP/U+2028 that neither regex touches)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _norm_fn(s):
        import re
        import unicodedata

        ws = re.compile(r"[ \t\n\r\f\v]+")
        return s.map(
            lambda t: ws.sub(" ", unicodedata.normalize("NFC", t)).strip(" ")
            if t is not None
            else None
        )

    _norm = pandas_udf(_norm_fn, T.StringType())
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _norm(F.col("text")).alias("t")
    ).select(
        "doc_id",
        F.length("t").alias("n_norm"),
        F.md5(F.col("t").cast("binary")).alias("h"),
    )


@query(
    "text_stats",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks)::BIGINT AS n_tokens,
           len(list_distinct(toks))::BIGINT AS n_distinct_tokens,
           length(text)::BIGINT AS n_chars_actual,
           length(replace(text, ' ', ''))::DOUBLE / len(toks)::DOUBLE AS avg_token_len,
           len(list_filter(toks, x -> x IN ({_sql_in(STOPWORDS)})))::DOUBLE
               / len(toks)::DOUBLE AS stopword_ratio,
           least(len(toks)::DOUBLE / 50.0, 1.0) * 0.4
             + (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE) * 0.4
             + (len(list_filter(toks, x -> x IN ({_sql_in(STOPWORDS)})))::DOUBLE
                / len(toks)::DOUBLE) * 0.2 AS quality_score
    FROM t
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load_table(spark, sf_dir, "documents"))


def _lang_id_oracle() -> str:
    langs = list(LANG_MARKERS)
    scores = ",\n           ".join(
        f"len(list_filter(toks, x -> x IN ({_sql_in(LANG_MARKERS[l])})))::BIGINT AS score_{l}"
        for l in langs
    )
    # same precedence as the Spark loop: earlier language wins ties,
    # later language needs strictly greater score
    cases = []
    for i, l in enumerate(langs):
        conds = [f"score_{l} > 0"]
        conds += [f"score_{l} > score_{p}" for p in langs[:i]]
        conds += [f"score_{l} >= score_{n}" for n in langs[i + 1 :]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{l}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
           {scores}
    FROM t)
    SELECT doc_id, {', '.join(f'score_{l}' for l in langs)}, {case_sql} AS lang_pred
    FROM s
    """


@query("lang_id", _lang_id_oracle())
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


def _lang_id_model_oracle() -> str:
    from featureform_spark.functions.langid_model import train_char_ngram_nb

    m = train_char_ngram_nb()
    langs = m["langs"]

    def arr(vals) -> str:
        return "[" + ",".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"

    for g in m["logp"]:
        assert "'" not in g, f"trigram needs SQL escaping: {g!r}"
    # two-level map (first char -> sub-map), mirroring the Spark side:
    # map subscripts are linear key scans in both engines, so bucketing
    # by first char turns ~1000 compares/lookup into ~30
    by_first: dict[str, list] = {}
    for g, lps in m["logp"].items():
        by_first.setdefault(g[0], []).append((g, lps))
    maplit = (
        "MAP {"
        + ",".join(
            f"'{c}': MAP {{"
            + ",".join(f"'{g}': {arr(lps)}" for g, lps in by_first[c])
            + "}"
            for c in sorted(by_first)
        )
        + "}"
    )
    priors = arr([m["prior"][lang] for lang in langs])
    floors = arr([m["floor"][lang] for lang in langs])
    lang_arr = "[" + ",".join(f"'{lang}'" for lang in langs) + "]"
    addv = (
        "["
        + ",".join(f"a[{i + 1}]+x[{i + 1}]" for i in range(len(langs)))
        + "]"
    )
    # the map literal MUST be hoisted into a one-row CTE: inlined in
    # the lambda, DuckDB rebuilds the ~1000-entry map once per list
    # element (measured 243 s -> 0.4 s at sf0.01)
    return f"""
    WITH mdl AS (SELECT {maplit} AS mp),
    t AS (SELECT doc_id,
                 ' ' || trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                 || ' ' AS s
               FROM documents),
    g AS (SELECT doc_id,
            CASE WHEN length(s) >= 3
                 THEN list_transform(range(1, length(s) - 1),
                                     i -> s[i:i+2])
                 ELSE []::VARCHAR[] END AS tris
          FROM t),
    sc AS (SELECT doc_id, len(tris) AS nt,
             list_reduce(list_prepend({priors},
               list_transform(tris,
                 t -> coalesce(((mdl.mp[t[1:1]])[1][t])[1], {floors}))),
               (a, x) -> {addv}) AS scores
           FROM g, mdl)
    SELECT doc_id,
      CASE WHEN nt = 0 THEN 'und'
           ELSE {lang_arr}[list_position(scores, list_max(scores))]
      END AS lang_pred,
      CASE WHEN nt = 0 THEN 0.0
           ELSE round(scores[list_position(scores, list_max(scores))], 6)
      END AS nb_score
    FROM sc
    """


@query("lang_id_model", _lang_id_model_oracle())
def lang_id_model_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained char-trigram Naive Bayes language ID (the CCNet-style
    upgrade over lang_id's marker heuristic; fastText is the public
    standard). Scoring runs the Arrow kernel by default: the
    JVM-normalized padded string ships to a pandas UDF that folds the
    6dp-quantized log-probs via dict lookups in the exact fold order —
    bit-identical to the kernel=False all-JVM map-literal fold (both
    asserted) and ~2x faster than the interpreted HOF evaluator. No
    shuffle either way — a narrow projection. The oracle inlines the
    same weights and folds them in the same left-to-right order
    (list_reduce), so sums are bit-identical IEEE doubles."""
    from featureform_spark.functions.langid_model import lang_id_model

    return lang_id_model(load_table(spark, sf_dir, "documents"))


@query(
    "readability",
    f"""
    SELECT doc_id,
           len({_TOKS})::BIGINT AS n_words,
           greatest(len(regexp_extract_all(text, '[.!?]+'))::DOUBLE, 1.0)::BIGINT
             AS n_sentences,
           len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
             AS n_syllables,
           CASE WHEN len({_TOKS}) > 0 THEN
             206.835
             - 1.015 * (len({_TOKS})::DOUBLE
                        / greatest(len(regexp_extract_all(text, '[.!?]+'))::DOUBLE, 1.0))
             - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))::DOUBLE
                       / len({_TOKS})::DOUBLE)
           END AS flesch
    FROM documents
    """,
)
def readability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading ease: counts and ratios of counts only —
    pure IEEE arithmetic, bit-identical across engines (no libm). One
    codegen projection."""
    from featureform_spark.functions.quality import readability

    return readability(load_table(spark, sf_dir, "documents"))


_CODE_SYM = "[{}();=\\[\\]<>]"
_CODE_BRC = "[{};]"


@query(
    "code_detect",
    # NOT an f-string: an f-prefix would render '{{_sym}}' down to
    # '{_sym}' before the .replace ran, leaving the oracle matching the
    # literal text '{_sym}' (i.e. verifying nothing on symbol-free
    # corpora). tests/test_llm_ops.py exercises the oracle on docs that
    # DO contain code symbols.
    """
    WITH b AS (
      SELECT doc_id,
             length(text)::DOUBLE AS n,
             len(regexp_extract_all(text, '{_sym}'))::DOUBLE AS sym,
             len(regexp_extract_all(text, '{_brc}'))::DOUBLE AS brc,
             len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS dig,
             string_split(text, chr(10)) AS lines
      FROM documents)
    SELECT doc_id,
           CASE WHEN n > 0 THEN sym / n ELSE 0.0 END AS symbol_density,
           CASE WHEN n > 0 THEN brc / n ELSE 0.0 END AS brace_density,
           CASE WHEN n > 0 THEN dig / n ELSE 0.0 END AS digit_ratio,
           CASE WHEN n > 0 THEN
             len(list_filter(lines,
                 x -> regexp_matches(x, '^(    |\t)')))::DOUBLE
             / greatest(len(lines)::DOUBLE, 1.0)
           ELSE 0.0 END AS indent_frac,
           (CASE WHEN n > 0 THEN sym / n ELSE 0.0 END) > 0.05
           AND (CASE WHEN n > 0 THEN brc / n ELSE 0.0 END) > 0.01
             AS is_code
    FROM b
    """.replace("{_sym}", _CODE_SYM).replace("{_brc}", _CODE_BRC),
)
def code_detect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing (the stage that sends code-looking docs
    to a code-data path): symbol/brace/digit densities + indented-line
    fraction, all counts and ratios of counts — bit-exact across
    engines. One codegen projection."""
    from featureform_spark.functions.quality import code_detect

    return code_detect(load_table(spark, sf_dir, "documents"))


def _quality_model_oracle() -> str:
    from featureform_spark.functions.quality_model import (
        STOPWORDS,
        train_quality_model,
    )

    m = train_quality_model()
    w = [repr(float(x)) for x in m["w"]]
    b = repr(float(m["b"]))
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    logit = (
        f"{b} + {w[0]}*len_norm + {w[1]}*distinct_ratio"
        f" + {w[2]}*stop_ratio + {w[3]}*avg_norm"
    )
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    f AS (SELECT doc_id,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE least(len(toks)::DOUBLE / 50.0, 1.0) END AS len_norm,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE len(list_distinct(toks))::DOUBLE
                      / len(toks)::DOUBLE END AS distinct_ratio,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE len(list_filter(toks, x -> x IN ({stops})))::DOUBLE
                      / len(toks)::DOUBLE END AS stop_ratio,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE least((list_reduce(list_prepend(0.0,
                        list_transform(toks, x -> length(x)::DOUBLE)),
                        (a, b) -> a + b) / len(toks)::DOUBLE) / 10.0,
                      1.0) END AS avg_norm
          FROM t)
    SELECT doc_id,
           ({logit}) AS quality_logit,
           ({logit}) > 0 AS keep
    FROM f
    """


@query("quality_model", _quality_model_oracle())
def quality_model_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained model-based quality scoring (the DCLM/FineWeb-style
    stage after rule filters): logistic regression trained on in-repo
    good-prose/boilerplate fixtures, scored as ONE narrow codegen
    projection — quantized weight literals, fixed-order dot product,
    no Python, no shuffle. The logit (not the sigmoid) is emitted so
    both engines produce bit-identical doubles (libm exp may differ in
    the last ulp); keep = logit > 0 is the same decision boundary."""
    from featureform_spark.functions.quality_model import quality_model_score

    return quality_model_score(load_table(spark, sf_dir, "documents"))


@query(
    "doc_fingerprint",
    "SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS dup_count
    FROM documents GROUP BY md5(lower(trim(text)))
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents"))


_SHINGLES_CTE = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(0, len(toks) - 2),
               i -> array_to_string(toks[i+1:i+3], ' ')))) AS shingle
      FROM t)
"""

_NUM_HASHES = 24
# 8 bands × 3 rows: s-curve threshold ≈ 0.5; r=2 floods the verify join
# with false candidates on shared-vocabulary corpora (see dedup.py)
_BANDS = 8


def _hex_to_int_sql(start: int) -> str:
    """BIGINT from 8 hex chars of column ``h`` starting at 1-based
    ``start`` — DuckDB's portable stand-in for Spark's conv(x, 16, 10)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(h, {start + j}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def _sig_cols() -> str:
    h1, h2 = _hex_to_int_sql(1), _hex_to_int_sql(9)
    return ",\n             ".join(
        f"min(({h1} + {i} * {h2}) % 2147483647) AS sig_{i}"
        for i in range(_NUM_HASHES)
    )


_SIG_CTE = f"""
    hx AS (SELECT doc_id, md5(shingle) AS h FROM sh),
    sig AS (SELECT doc_id,
             {_sig_cols()}
            FROM hx GROUP BY doc_id)
"""


@query(
    "minhash_signature",
    f"""
    WITH {_SHINGLES_CTE},
    {_SIG_CTE}
    SELECT * FROM sig
    """,
)
def minhash_signature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signature(load_table(spark, sf_dir, "documents"))


def _minhash_pairs_cte(threshold: float) -> str:
    """CTE chain ending in ``lsh_pairs(id_a, id_b, jaccard)`` — shared by
    the pair query and the keep-canonical closure oracle."""
    rows = _NUM_HASHES // _BANDS
    band_exprs = []
    for b in range(_BANDS):
        parts = " || '|' || ".join(
            f"CAST(sig_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_exprs.append(f"'{b}:' || md5({parts})")
    return f"""
    {_SHINGLES_CTE},
    {_SIG_CTE},
    buckets AS (SELECT doc_id, unnest([{', '.join(band_exprs)}]) AS bucket FROM sig),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM buckets l JOIN buckets r ON l.bucket = r.bucket AND l.doc_id < r.doc_id),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS n_inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b),
    lsh_pairs AS (
      SELECT i.id_a, i.id_b,
             i.n_inter::DOUBLE / (sa.n + sb.n - i.n_inter)::DOUBLE AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.n_inter::DOUBLE / (sa.n + sb.n - i.n_inter)::DOUBLE >= {threshold})
    """


def _minhash_pairs_oracle(threshold: float) -> str:
    return f"""
    WITH {_minhash_pairs_cte(threshold)}
    SELECT id_a, id_b, jaccard FROM lsh_pairs
    """


@query("minhash_lsh_dedup", _minhash_pairs_oracle(0.01))
def minhash_lsh_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # threshold 0.01 ⇒ output = every LSH candidate pair with its exact
    # Jaccard (this corpus has no true near-dups — max pair j ≈ 0.04 —
    # so a dedup-level threshold would make the oracle compare vacuous).
    # Banding pinned explicitly (r11): the oracle SQL bakes in 24/8, so
    # this row must stay sf-independent; the auto-sized twin is
    # minhash_lsh_dedup_auto.
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        num_hashes=24,
        bands=8,
        jaccard_threshold=0.01,
    )


@query("minhash_lsh_dedup_auto", _minhash_pairs_oracle(0.01))
def minhash_lsh_dedup_auto_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-sized banding (lsh_autosize): num_hashes/bands derived from
    the corpus row count. At every driver/parity sf the derivation's
    floors reproduce the pinned (24, 8) — so the SAME oracle applies
    exactly — while at bench scale (x100: 500k docs) it re-sizes to
    (64, 16) to hold the false-candidate rate flat. The point of the
    row: the auto path is continuously correctness-checked at the scale
    where it coincides with the pinned design point."""
    return minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"), jaccard_threshold=0.01
    )


@query(
    "jaccard_vs_doc0",
    f"""
    WITH {_SHINGLES_CTE},
    q AS (SELECT shingle FROM sh WHERE doc_id = 0),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    qsize AS (SELECT count(*) AS nq FROM q),
    inter AS (
      SELECT s.doc_id, count(*) AS ni
      FROM sh s JOIN q ON s.shingle = q.shingle
      WHERE s.doc_id <> 0
      GROUP BY s.doc_id)
    SELECT i.doc_id,
           i.ni::DOUBLE / (z.n + qs.nq - i.ni)::DOUBLE AS jaccard
    FROM inter i JOIN sizes z ON z.doc_id = i.doc_id, qsize qs
    """,
)
def jaccard_vs_doc0_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone exact n-gram Jaccard against one probe document —
    linear in corpus size via an inverted-index join on the probe's
    shingle set (broadcast at scale). Docs with zero overlap excluded."""
    from featureform_spark.functions.dedup import _exploded_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = _exploded_shingles(docs, "doc_id", "text", 3)
    # probe shingles from the one probe doc only — not a full-corpus
    # explode + filter (the probe set is what gets broadcast)
    q = _exploded_shingles(
        docs.filter(F.col("doc_id") == 0), "doc_id", "text", 3
    ).select("shingle")
    nq = q.count()
    # single pass: broadcast left-join marks probe hits, then ONE groupBy
    # yields both |doc| and |doc ∩ probe| — the corpus is exploded and
    # shuffled once, not twice (shingles are per-doc distinct, so the
    # 1:≤1 join cannot multiply rows)
    return (
        sh.filter(F.col("doc_id") != 0)
        .join(F.broadcast(q.withColumn("_hit", F.lit(1))), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.count("_hit").alias("ni"))
        .filter(F.col("ni") > 0)
        .select(
            "doc_id",
            (
                F.col("ni").cast("double")
                / (F.col("n") + F.lit(nq) - F.col("ni")).cast("double")
            ).alias("jaccard"),
        )
    )


def _simhash_oracle(bits: int = 32) -> str:
    sums = ",\n             ".join(
        f"SUM(((instr('0123456789abcdef', substring(h, {j + 1}, 1)) - 1) % 2) * 2 - 1) AS v_{j}"
        for j in range(bits)
    )
    concat = " || ".join(
        f"(CASE WHEN v_{j} >= 0 THEN '1' ELSE '0' END)" for j in range(bits)
    )
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    h AS (SELECT doc_id, md5(token) AS h FROM tok),
    s AS (SELECT doc_id,
             {sums}
          FROM h GROUP BY doc_id)
    SELECT doc_id, {concat} AS simhash FROM s
    """


@query("simhash_dedup", _simhash_oracle())
def simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_DIM = 64
# fold shapes mirror Spark's F.aggregate(..., 0.0, (a,x) -> a+x) exactly:
# list_prepend(0.0, products) makes DuckDB's no-init list_reduce identical
_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, {n}), "
    "i -> {a}[i] * {b}[i])), (acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform({a}, x -> x * x)), "
    "(acc, x) -> acc + x))"
)


def _topk_oracle(k: int = 10) -> str:
    dot = _DOT.format(n=_DIM + 1, a="v", b="qv")
    nv = _NORM.format(a="v")
    nq = _NORM.format(a="qv")
    return f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT vec_id,
             {dot} / ({nv} * {nq}) AS score
      FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings) e, q)
    SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT {k}
    """


@query("embedding_topk", _topk_oracle())
def embedding_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select("embedding")
    return cosine_topk(emb, qdf, k=10)


@query(
    "token_count",
    r"""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from featureform_spark.functions.text import token_counts

    return token_counts(load_table(spark, sf_dir, "documents"))


def _bucket_case_sql(var: str, num_planes: int) -> str:
    signs = hyperplane_signs(num_planes, _DIM)
    bits = []
    for p in range(num_planes):
        arr = "[" + ", ".join(f"{s:.1f}" for s in signs[p]) + "]"
        proj = _DOT.format(n=_DIM + 1, a=var, b=arr)
        bits.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits)


def _near_dup_oracle(num_planes: int = 8, threshold: float = 0.2) -> str:
    dot = _DOT.format(n=_DIM + 1, a="l.v", b="r.v")
    nl = _NORM.format(a="l.v")
    nr = _NORM.format(a="r.v")
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    b AS (SELECT vec_id, v, {_bucket_case_sql('v', num_planes)} AS bucket FROM e),
    pairs AS (
      SELECT l.vec_id AS id_a, r.vec_id AS id_b,
             {dot} / ({nl} * {nr}) AS cosine
      FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id)
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= {threshold}
    """


@query("embedding_near_dup", _near_dup_oracle())
def embedding_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from featureform_spark.functions.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), dim=_DIM,
        num_planes=8, cosine_threshold=0.2,
    )


@query("embedding_near_dup_auto", _near_dup_oracle())
def embedding_near_dup_auto_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-sized bucket space (lsh_autosize.auto_num_planes): planes
    derived from the vector count. Floor-8 reproduces the pinned
    design point at every driver/parity sf (<= 4k vectors), so the
    pinned oracle applies exactly; at x100 scale (200k vectors) the
    same call picks 14 planes — the knob the r10 verdict measured at
    41.9s -> 6.9s with recall 1.0."""
    from featureform_spark.functions.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), dim=_DIM,
        cosine_threshold=0.2,
    )


@query(
    "corpus_clean",
    f"""
    WITH stats AS (
      SELECT doc_id, lang, source,
             len({_TOKS})::BIGINT AS n_tokens,
             len(list_distinct({_TOKS}))::DOUBLE / len({_TOKS})::DOUBLE AS diversity,
             md5(lower(trim(text))) AS fingerprint
      FROM documents),
    kept AS (
      SELECT * FROM stats WHERE n_tokens >= 30 AND diversity >= 0.3),
    dedup AS (
      SELECT fingerprint, min(doc_id) AS doc_id FROM kept GROUP BY fingerprint)
    SELECT k.doc_id, k.lang, k.source, k.n_tokens
    FROM kept k JOIN dedup d ON k.doc_id = d.doc_id
    """,
)
def corpus_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data pipeline: quality filter → exact dedup →
    cleaned corpus (the shape of a real pretraining-data job)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    stats = docs.select(
        "doc_id", "lang", "source",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks).cast("double")).alias("diversity"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
    )
    kept = stats.filter((F.col("n_tokens") >= 30) & (F.col("diversity") >= 0.3))
    keep_ids = kept.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return kept.join(keep_ids, ["fingerprint", "doc_id"]).select(
        "doc_id", "lang", "source", "n_tokens"
    )


def _ann_topk_oracle(num_planes: int = 8, k: int = 10) -> str:
    dot = _DOT.format(n=_DIM + 1, a="v", b="qv")
    nv = _NORM.format(a="v")
    nq = _NORM.format(a="qv")
    return f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> x::DOUBLE) AS qv,
             {_bucket_case_sql("list_transform(embedding, x -> x::DOUBLE)", num_planes)} AS qbucket
      FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
             {_bucket_case_sql("list_transform(embedding, x -> x::DOUBLE)", num_planes)} AS bucket
      FROM embeddings),
    s AS (
      SELECT vec_id, {dot} / ({nv} * {nq}) AS score
      FROM e, q WHERE e.bucket = q.qbucket)
    SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT {k}
    """


@query("embedding_ann_topk", _ann_topk_oracle())
def embedding_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: probe only the query's LSH bucket, then exact
    top-k inside it."""
    from featureform_spark.functions.similarity import ann_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ann_topk_lsh(emb, qvec, k=10, num_planes=8)


def _knn_vote_oracle(k: int = 10) -> str:
    dot = _DOT.format(n=_DIM + 1, a="v", b="qv")
    nv = _NORM.format(a="v")
    nq = _NORM.format(a="qv")
    return f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT vec_id, {dot} / ({nv} * {nq}) AS score
      FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings WHERE vec_id <> 0) e, q),
    topk AS (
      SELECT vec_id FROM s ORDER BY score DESC, vec_id LIMIT {k})
    SELECT e.label AS predicted_label, count(*) AS n_votes
    FROM topk t JOIN embeddings e ON t.vec_id = e.vec_id
    GROUP BY e.label
    ORDER BY n_votes DESC, e.label
    LIMIT 1
    """


@query("knn_label_vote", _knn_vote_oracle())
def knn_label_vote_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification over the embedding column: the
    serving-side 'predict from neighbors' pattern, end-to-end in one
    plan (exact top-k → label join → vote)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select("embedding")
    topk = cosine_topk(emb.filter(F.col("vec_id") != 0), qdf, k=10)
    return (
        topk.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy(F.col("label").alias("predicted_label"))
        .agg(F.count("*").alias("n_votes"))
        .orderBy(F.col("n_votes").desc(), F.col("predicted_label"))
        .limit(1)
    )


def _ivf_topk_oracle(num_centroids: int = 16, nprobe: int = 4, k: int = 10) -> str:
    cos_vc = (
        _DOT.format(n=_DIM + 1, a="v", b="cv")
        + " / (" + _NORM.format(a="v") + " * " + _NORM.format(a="cv") + ")"
    )
    cos_cq = (
        _DOT.format(n=_DIM + 1, a="cv", b="qv")
        + " / (" + _NORM.format(a="cv") + " * " + _NORM.format(a="qv") + ")"
    )
    cos_vq = (
        _DOT.format(n=_DIM + 1, a="v", b="qv")
        + " / (" + _NORM.format(a="v") + " * " + _NORM.format(a="qv") + ")"
    )
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {num_centroids}),
    a AS (SELECT vec_id, v, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY {cos_vc} DESC, cid) AS rn
          FROM e, c),
    asn AS (SELECT vec_id, v, cid AS cell FROM a WHERE rn = 1),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    probe AS (SELECT cid AS cell FROM c, q
              ORDER BY {cos_cq} DESC, cid LIMIT {nprobe}),
    s AS (SELECT vec_id, {cos_vq} AS score
          FROM asn JOIN probe USING (cell), q)
    SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT {k}
    """


@query("embedding_ivf_topk", _ivf_topk_oracle())
def embedding_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic md5-sampled coarse quantizer, nearest-cell
    assignment, nprobe-cell probe, exact cosine inside probed cells."""
    from featureform_spark.functions.similarity import ivf_topk

    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0, k=10, num_centroids=16, nprobe=4,
    )


_HEXV = "(strpos('0123456789abcdef', substr(md5(text), {a}, 1)) - 1)"


@query(
    "media_features",
    f"""
    SELECT doc_id AS media_id,
           length(text)::BIGINT AS n_bytes,
           md5(text) AS content_hash,
           list_sum(list_transform(range(1, length(text) + 1),
                                   i -> ord(substr(text, i, 1))))::DOUBLE
             / length(text)::DOUBLE AS byte_mean,
           CAST(16 + ({_HEXV.format(a=1)} * 16 + {_HEXV.format(a=2)}) % 64 AS INT) AS width,
           CAST(16 + ({_HEXV.format(a=3)} * 16 + {_HEXV.format(a=4)}) % 64 AS INT) AS height
    FROM documents
    """,
)
def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing under oracle check: documents' text bytes as
    opaque binary content driven through the Arrow mapInPandas feature
    extractor with the deterministic fake decoder. The ASCII corpus
    makes the byte-level stats SQL-reproducible."""
    from featureform_spark.functions.multimodal import (
        deterministic_fake_decoder,
        extract_media_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )
    return extract_media_features(media, deterministic_fake_decoder)


@query(
    "media_decode_real",
    """
    SELECT doc_id AS media_id,
           CAST(16 + doc_id % 48 AS INT) AS width,
           CAST(16 + (doc_id * 7) % 48 AS INT) AS height,
           CAST(54 + ((3 * (16 + doc_id % 48) + 3) // 4) * 4
                     * (16 + (doc_id * 7) % 48) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def media_decode_real_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode: synthesize a valid 24-bit BMP per document
    (functions/media_codecs.py, pure numpy), then recover width/height by
    genuinely parsing the BMP header inside the Arrow mapInPandas
    extractor. The oracle derives the same dims from doc_id metadata and
    checks n_bytes against the BMP row-padding formula — proving the
    encoder wrote a spec-correct file and the decoder actually read it.
    """
    from featureform_spark.functions.media_codecs import synth_bmp
    from featureform_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        real_decoder,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def make_media(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        synth_bmp(16 + int(i) % 48, 16 + (int(i) * 7) % 48, int(i))
                        for i in ids
                    ],
                    "media_type": "image",
                    "metadata": [{} for _ in ids],
                }
            )

    media = docs.mapInPandas(make_media, MEDIA_SCHEMA)
    feats = extract_media_features(media, decoder=real_decoder)
    return feats.select("media_id", "width", "height", "n_bytes")


def _lsh_bucket_oracle(num_planes: int = 16) -> str:
    signs = hyperplane_signs(num_planes, _DIM)
    bits = []
    for p in range(num_planes):
        arr = "[" + ", ".join(f"{s:.1f}" for s in signs[p]) + "]"
        proj = _DOT.format(n=_DIM + 1, a="v", b=f"{arr}")
        bits.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    concat = " || ".join(bits)
    return f"""
    SELECT vec_id, {concat} AS bucket
    FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings) e
    """


@query("embedding_lsh_buckets", _lsh_bucket_oracle())
def embedding_lsh_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hyperplane_lsh_buckets(
        load_table(spark, sf_dir, "embeddings"), dim=_DIM, num_planes=16
    )


# ---------------------------------------------------------------------------
# quality filtering + PII redaction (functions/quality.py)
# ---------------------------------------------------------------------------

_LINES = (
    "list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),"
    " l -> l <> '')"
)

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks, {_LINES} AS lines
  FROM documents
), b AS (
  SELECT doc_id, text, toks, lines,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS bigrams
  FROM t
), s AS (
  SELECT doc_id,
    len(toks)::BIGINT AS n_tokens,
    CASE WHEN len(lines) > 0
         THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)::DOUBLE
         ELSE 0.0 END AS dup_line_frac,
    CASE WHEN len(bigrams) > 0
         THEN 1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams)::DOUBLE
         ELSE 0.0 END AS dup_bigram_frac,
    CASE WHEN length(text) > 0
         THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
              / length(text)::DOUBLE
         ELSE 0.0 END AS symbol_ratio,
    CASE WHEN len(toks) > 0
         THEN len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]')))::DOUBLE
              / len(toks)::DOUBLE
         ELSE 0.0 END AS alpha_word_ratio,
    CASE WHEN len(lines) > 0
         THEN len(list_filter(lines, l -> regexp_matches(l, '^[-*•]')))::DOUBLE
              / len(lines)::DOUBLE
         ELSE 0.0 END AS bullet_line_frac,
    CASE WHEN len(lines) > 0
         THEN len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$')))::DOUBLE
              / len(lines)::DOUBLE
         ELSE 0.0 END AS ellipsis_line_frac,
    CASE WHEN len(toks) > 0
         THEN list_sum(list_transform(toks, tk -> length(tk)))::DOUBLE
              / len(toks)::DOUBLE
         ELSE 0.0 END AS mean_word_len
  FROM b
)
SELECT doc_id, n_tokens, dup_line_frac, dup_bigram_frac, symbol_ratio,
       alpha_word_ratio, bullet_line_frac, ellipsis_line_frac, mean_word_len,
       CAST(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
                  AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
                  AND symbol_ratio < 0.2 AND alpha_word_ratio > 0.6
                  AND dup_line_frac < 0.5 AND dup_bigram_frac < 0.5
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
"""


@query("quality_signals", _QUALITY_ORACLE)
def quality_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from featureform_spark.functions.quality import quality_signals

    return quality_signals(load_table(spark, sf_dir, "documents"))


def _pii_oracle() -> str:
    from featureform_spark.functions.quality import EMAIL_RE, IPV4_RE, PHONE_RE

    synth = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR) || "
        "'.7 call +1 202 555 01' || CAST(doc_id % 10 AS VARCHAR)"
    )
    return f"""
    WITH t AS (SELECT doc_id, {synth} AS text FROM documents)
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(text,
        '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{IPV4_RE}', '<IP>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM t
    """


@query("pii_redact", _pii_oracle())
def pii_redact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The docs table has no live PII, so both sides append the same
    synthetic email/IP/phone suffix before scrubbing — the redaction
    regexes are exercised on every row."""
    from featureform_spark.functions.quality import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 202 555 01"),
            (F.col("doc_id") % 10).cast("string"),
        ).alias("text"),
    )
    return redact_pii(docs).select("doc_id", F.col("text").alias("redacted"))


# ---------------------------------------------------------------------------
# tf-idf, dedup clustering, stratified sampling
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*)::BIGINT AS df_docs FROM tf GROUP BY term
    ), n AS (
      SELECT count(*)::BIGINT AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs,
             tf.tf::DOUBLE * (n.n_docs + 1.0) / (dfq.df_docs + 1.0) AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf::DOUBLE * (n.n_docs + 1.0)
                                         / (dfq.df_docs + 1.0) DESC,
                                         tf.term ASC) AS rn
      FROM tf JOIN dfq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df_docs, score FROM scored WHERE rn <= 3
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from featureform_spark.functions.text import tf_idf

    return tf_idf(load_table(spark, sf_dir, "documents"), top_k=3)


@query(
    "dedup_clusters",
    """
    WITH RECURSIVE edges AS (
      SELECT d1.doc_id AS a, d2.doc_id AS b
      FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      WHERE d1.doc_id % 10 < 3
    ), sym AS (
      SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges
    ), reach(id, r) AS (
      SELECT a AS id, a AS r FROM sym
      UNION
      SELECT s.a AS id, reach.r FROM sym s JOIN reach ON reach.id = s.b
    )
    SELECT id AS doc_id, MIN(r)::BIGINT AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group clustering: deterministic synthetic near-dup
    chains (doc i ~ doc i+1 when i%10<3 -> components of <=4 docs) fed
    through the generic connected-components operator; the oracle
    computes the same transitive closure with a recursive CTE."""
    from featureform_spark.functions.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    right = docs.select(F.col("doc_id").alias("b"))
    edges = (
        docs.filter(F.col("doc_id") % 10 < 3)
        .select(F.col("doc_id").alias("a"))
        .join(right, F.col("b") == F.col("a") + 1)
    )
    out = connected_components(edges, "a", "b")
    return out.select(F.col("id").alias("doc_id"), "cluster_id")


@query(
    "stratified_sample",
    """
    SELECT event_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR) || '#7'), 1, 8) <
          CASE event_type
            WHEN 'click' THEN '80000000'
            WHEN 'view' THEN '19999999'
            ELSE '00000000' END
    """,
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: 50% of clicks, 10% of views,
    0% of everything else — md5-keyed so any engine reproduces the
    exact row set."""
    from featureform_spark.operators.split import stratified_sample

    events = load_table(spark, sf_dir, "events")
    return stratified_sample(
        events,
        "event_type",
        {"click": 0.5, "view": 0.1},
        key_cols=["event_id"],
        seed=7,
    ).select("event_id", "event_type")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 8
# deterministic benchmark/corpus split both engines can recompute
_BENCH_PRED = "doc_id % 23 = 0"

_NGRAMS_CTE = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - {_DECON_N} + 2, 1)),
                   i -> array_to_string(toks[i:i + {_DECON_N - 1}], ' ')
                 ))) AS ngram
          FROM t)
"""


@query(
    "decontaminate",
    f"""
    WITH {_NGRAMS_CTE},
    bg AS (SELECT DISTINCT ngram FROM g WHERE {_BENCH_PRED}),
    hits AS (
      SELECT g.doc_id, count(*) AS n_overlap
      FROM g JOIN bg USING (ngram)
      WHERE NOT ({_BENCH_PRED.replace('doc_id', 'g.doc_id')})
      GROUP BY g.doc_id)
    SELECT c.doc_id,
           COALESCE(h.n_overlap, 0)::BIGINT AS n_overlap,
           (COALESCE(h.n_overlap, 0) > 0)::BIGINT AS contaminated
    FROM (SELECT doc_id FROM documents WHERE NOT ({_BENCH_PRED})) c
    LEFT JOIN hits h USING (doc_id)
    """,
)
def decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 23 == 0 act as the
    held-out eval set; every other doc is scored by how many of its
    distinct 8-grams appear in that set. Broadcast benchmark n-grams →
    corpus side never shuffles its explode."""
    from featureform_spark.functions.decontaminate import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    corpus = docs.filter(F.col("doc_id") % 23 != 0)
    return decontaminate(corpus, bench, n=_DECON_N)


@query(
    "contamination_top_ngrams",
    f"""
    WITH {_NGRAMS_CTE},
    bg AS (SELECT DISTINCT ngram FROM g WHERE {_BENCH_PRED})
    SELECT g.ngram, count(*)::BIGINT AS n_docs
    FROM g JOIN bg USING (ngram)
    WHERE NOT ({_BENCH_PRED.replace('doc_id', 'g.doc_id')})
    GROUP BY g.ngram
    ORDER BY n_docs DESC, g.ngram
    LIMIT 20
    """,
)
def contamination_top_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit companion to `decontaminate`: which benchmark n-grams leak
    most; TakeOrderedAndProject over the small hit set, no global sort."""
    from featureform_spark.functions.decontaminate import contamination_ngrams

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    corpus = docs.filter(F.col("doc_id") % 23 != 0)
    return contamination_ngrams(corpus, bench, n=_DECON_N, top_k=20)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512
_PACK_BUCKETS = 4
_PACK_STRIDE = (1 << 40) // _PACK_BUDGET


def _md5_bucket_sql(n: int) -> str:
    d1 = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1"
    d2 = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1"
    return f"((({d1}) * 16 + ({d2})) % {n})"


_PACK_CTE = f"""
    t AS (SELECT doc_id,
                 len({_TOKS})::BIGINT AS n_tokens,
                 {_md5_bucket_sql(_PACK_BUCKETS)}::INT AS bucket
          FROM documents),
    p AS (SELECT doc_id, bucket, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0)::BIGINT AS pack_offset
          FROM t),
    packed AS (SELECT doc_id, bucket, n_tokens, pack_offset,
                      (bucket::BIGINT * {_PACK_STRIDE}
                       + pack_offset // {_PACK_BUDGET})::BIGINT AS pack_id
               FROM p)
"""


def _packed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from featureform_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"size(filter(split(text, ' '), x -> x != ''))").cast("long").alias("n_tokens")
    )
    md5_bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int") % _PACK_BUCKETS
    return pack_sequences(
        docs,
        budget=_PACK_BUDGET,
        n_buckets=_PACK_BUCKETS,
        bucket_expr=md5_bucket,
    )


@query(
    "sequence_packing",
    f"""
    WITH {_PACK_CTE}
    SELECT doc_id, bucket, n_tokens, pack_offset, pack_id FROM packed
    """,
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing into 512-token training packs: docs
    hash-bucketed (md5 here so the oracle reproduces the layout), one
    per-bucket running-sum window = one shuffle, no global sort."""
    return _packed_docs(spark, sf_dir).select(
        "doc_id", "bucket", "n_tokens", "pack_offset", "pack_id"
    )


@query(
    "packing_efficiency",
    f"""
    WITH {_PACK_CTE}
    SELECT pack_id, count(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS n_tokens,
           (SUM(n_tokens)::DOUBLE / {_PACK_BUDGET}) AS fill_ratio
    FROM packed GROUP BY pack_id
    """,
)
def packing_efficiency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack fill report over the packed layout (map-side partial
    agg; pack count is corpus_tokens/512, tiny vs the corpus)."""
    from featureform_spark.operators.packing import packing_efficiency

    return packing_efficiency(_packed_docs(spark, sf_dir), budget=_PACK_BUDGET)


# ---------------------------------------------------------------------------
# chunking / diversity / corpus mixing
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_OVERLAP = 32, 8
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP


@query(
    "doc_chunks",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         c AS (SELECT doc_id, toks,
                      (greatest(len(toks) - {_CHUNK_OVERLAP}, 1)
                       + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE} AS nc
               FROM t),
         x AS (SELECT doc_id, toks, unnest(range(nc)) AS i FROM c)
    SELECT doc_id, i::BIGINT AS chunk_id,
           len(toks[(i*{_CHUNK_STRIDE}+1)::INT : (i*{_CHUNK_STRIDE}+{_CHUNK_SIZE})::INT])::BIGINT
             AS n_chunk_tokens,
           array_to_string(
             toks[(i*{_CHUNK_STRIDE}+1)::INT : (i*{_CHUNK_STRIDE}+{_CHUNK_SIZE})::INT], ' ')
             AS chunk_text
    FROM x
    """,
)
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks (RAG / context-window prep):
    zero-shuffle posexplode + slice, integer-exact chunk-count math."""
    from featureform_spark.functions.chunking import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"),
        chunk_size=_CHUNK_SIZE,
        overlap=_CHUNK_OVERLAP,
    )


@query(
    "token_diversity",
    f"""
    WITH e AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
         c AS (SELECT doc_id, t, count(*)::BIGINT AS c FROM e GROUP BY doc_id, t)
    SELECT doc_id,
           SUM(c)::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_distinct,
           1.0::DOUBLE - SUM(c*c)::DOUBLE / (SUM(c)::DOUBLE * SUM(c)::DOUBLE)
             AS simpson_diversity,
           MAX(c)::DOUBLE / SUM(c)::DOUBLE AS top_token_ratio
    FROM c GROUP BY doc_id
    """,
)
def token_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson lexical diversity + top-token repetition ratio —
    transcendental-free so the oracle hash-matches bit-exactly."""
    from featureform_spark.functions.text import token_diversity

    return token_diversity(load_table(spark, sf_dir, "documents"))


@query(
    "ngram_lm_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                                       i -> [toks[i], toks[i + 1]])) AS bg
          FROM t),
    e AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2 FROM g),
    docbg AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS n_occ
              FROM e GROUP BY doc_id, w1, w2),
    docw AS (SELECT doc_id, w1, SUM(n_occ)::BIGINT AS d_w1
             FROM docbg GROUP BY doc_id, w1),
    cbg AS (SELECT w1, w2, SUM(n_occ)::BIGINT AS c_bg
            FROM docbg GROUP BY w1, w2),
    cw AS (SELECT w1, SUM(c_bg)::BIGINT AS c_w1 FROM cbg GROUP BY w1),
    j AS (SELECT db.doc_id, db.n_occ, cbg.c_bg, cw.c_w1, dw.d_w1
          FROM docbg db
          JOIN cbg USING (w1, w2)
          JOIN cw USING (w1)
          JOIN docw dw ON db.doc_id = dw.doc_id AND db.w1 = dw.w1)
    SELECT doc_id,
           SUM(n_occ)::BIGINT AS n_bigrams,
           SUM(n_occ * (c_bg - n_occ))::BIGINT AS xdoc_bigram_support,
           SUM(n_occ * (c_w1 - d_w1))::BIGINT AS xdoc_context_support,
           CASE WHEN SUM(n_occ * (c_w1 - d_w1)) > 0
                THEN SUM(n_occ * (c_bg - n_occ))::DOUBLE
                     / SUM(n_occ * (c_w1 - d_w1))::DOUBLE
                ELSE 0.0 END AS lm_fit_score
    FROM j GROUP BY doc_id
    """,
)
def ngram_lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit bigram-LM quality score (CCNet/Gopher perplexity-filter
    family), leave-one-out so self-induced transitions don't self-score;
    transcendental-free: exact int64 support sums, one final IEEE
    division — see functions/lm.py for the 100 TB plan shape."""
    from featureform_spark.functions.lm import ngram_lm_score

    return ngram_lm_score(load_table(spark, sf_dir, "documents"))


_MIX_WEIGHTS = {"src0": 5, "src1": 3, "src2": 2}
_MIX_W_TOTAL = sum(_MIX_WEIGHTS.values())


def _mix_cte() -> str:
    src_in = ", ".join(f"'{s}'" for s in _MIX_WEIGHTS)
    w_case = " ".join(f"WHEN '{s}' THEN {w}" for s, w in _MIX_WEIGHTS.items())
    md5_u32 = (
        "CAST(('0x' || substr(md5(doc_id::VARCHAR || '#42'), 1, 8)) AS BIGINT)"
    )
    return f"""
    c AS (SELECT source, count(*)::HUGEINT AS n FROM documents
          WHERE source IN ({src_in}) GROUP BY source),
    w AS (SELECT source, n, (CASE source {w_case} END)::HUGEINT AS w FROM c),
    k AS (SELECT MIN(n * {_MIX_W_TOTAL} // w) AS k FROM w),
    thr AS (SELECT source, 4294967296::HUGEINT * w * k // ({_MIX_W_TOTAL} * n) AS t
            FROM w, k),
    mixed AS (SELECT d.doc_id, d.source
              FROM documents d JOIN thr ON d.source = thr.source
              WHERE {md5_u32} < thr.t)
    """


@query(
    "corpus_mix",
    f"WITH {_mix_cte()} SELECT doc_id, source FROM mixed",
)
def corpus_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture downsampling to 5:3:2 source proportions;
    exact-integer thresholds so DuckDB re-derives the identical set."""
    from featureform_spark.operators.mixing import mix_corpus

    return mix_corpus(
        load_table(spark, sf_dir, "documents"),
        "source",
        _MIX_WEIGHTS,
        ["doc_id"],
    ).select("doc_id", "source")


@query(
    "corpus_mix_summary",
    f"""
    WITH {_mix_cte()},
    kept AS (SELECT source, count(*)::BIGINT AS n_kept FROM mixed GROUP BY source)
    SELECT source, n_kept,
           n_kept::DOUBLE / (SELECT SUM(n_kept) FROM kept)::DOUBLE AS achieved_frac
    FROM kept
    """,
)
def corpus_mix_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achieved-mixture report over the mixed corpus."""
    from featureform_spark.operators.mixing import mix_summary

    return mix_summary(
        load_table(spark, sf_dir, "documents"),
        "source",
        _MIX_WEIGHTS,
        ["doc_id"],
    )


# ---------------------------------------------------------------------------
# canonical near-dup removal + epoch upsampling
# ---------------------------------------------------------------------------


_KEEP_CANONICAL_ORACLE = f"""
    WITH RECURSIVE {_minhash_pairs_cte(0.01)},
    sym AS (SELECT id_a AS a, id_b AS b FROM lsh_pairs
            UNION ALL SELECT id_b, id_a FROM lsh_pairs),
    reach(id, r) AS (
      SELECT a AS id, a AS r FROM sym
      UNION
      SELECT s.a AS id, reach.r FROM sym s JOIN reach ON reach.id = s.b),
    labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    losers AS (SELECT id FROM labels WHERE id <> cluster_id)
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN losers ON d.doc_id = losers.id
    WHERE losers.id IS NULL
    """


@query("dedup_keep_canonical", _KEEP_CANONICAL_ORACLE)
def dedup_keep_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal: LSH candidate pairs -> transitive
    clusters -> keep each cluster's min-id member; untouched docs pass
    through. The oracle replays the full pipeline (same md5 minhash
    lockstep) plus a recursive-CTE closure."""
    from featureform_spark.functions.dedup import keep_canonical, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    # banding pinned (r11): the recursive-CTE oracle bakes in 24/8;
    # dedup_keep_canonical_auto is the auto-sized twin
    pairs = minhash_lsh_pairs(
        docs, num_hashes=24, bands=8, jaccard_threshold=0.01
    )
    return keep_canonical(docs, pairs).select("doc_id", "source")


@query("dedup_keep_canonical_auto", _KEEP_CANONICAL_ORACLE)
def dedup_keep_canonical_auto_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-sized twin of dedup_keep_canonical (floors reproduce 24/8
    at every driver/parity sf so the same recursive-CTE oracle applies;
    re-sizes at bench scale — see lsh_autosize)."""
    from featureform_spark.functions.dedup import keep_canonical, minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.01)
    return keep_canonical(docs, pairs).select("doc_id", "source")


_EPOCHS = {"src0": 2.5, "src1": 0.5, "src3": 1.0}


def _upsample_oracle() -> str:
    from featureform_spark.operators.split import threshold_hex

    src_in = ", ".join(f"'{s}'" for s in _EPOCHS)
    whole = " ".join(f"WHEN '{s}' THEN {int(e)}" for s, e in _EPOCHS.items())
    thr = " ".join(
        f"WHEN '{s}' THEN '{threshold_hex(e - int(e))}'" for s, e in _EPOCHS.items()
    )
    return f"""
    WITH r AS (
      SELECT doc_id, source,
             (CASE source {whole} END)
             + CASE WHEN substr(md5(doc_id::VARCHAR || '#42'), 1, 8)
                         < (CASE source {thr} END)
                    THEN 1 ELSE 0 END AS n_rep
      FROM documents WHERE source IN ({src_in}))
    SELECT doc_id, source, unnest(range(n_rep))::BIGINT AS epoch
    FROM r WHERE n_rep > 0
    """


@query("upsample_epochs", _upsample_oracle())
def upsample_epochs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch upsampling (src0 x2.5, src1 x0.5, src3 x1.0,
    rest dropped): floor(e) full repeats + a deterministic md5-selected
    extra; zero-shuffle narrow explode."""
    from featureform_spark.operators.mixing import upsample_epochs

    return upsample_epochs(
        load_table(spark, sf_dir, "documents"), "source", _EPOCHS, ["doc_id"]
    ).select("doc_id", "source", "epoch")


# ---------------------------------------------------------------------------
# exact substring-block dedup
# ---------------------------------------------------------------------------

_BLOCK_B = 8


@query(
    "dedup_blocks",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         b AS (SELECT doc_id, toks,
                      unnest(range((n + {_BLOCK_B - 1})//{_BLOCK_B})) AS bid
               FROM n WHERE n > 0),
         x AS (SELECT doc_id, bid,
                      array_to_string(
                        toks[(bid*{_BLOCK_B}+1)::INT:(bid*{_BLOCK_B}+{_BLOCK_B})::INT],
                        ' ') AS btext
               FROM b),
         k AS (SELECT doc_id, bid, btext,
                      row_number() OVER (PARTITION BY btext
                                         ORDER BY doc_id, bid) AS rn
               FROM x),
         agg AS (SELECT doc_id,
                        coalesce(string_agg(btext, ' ' ORDER BY bid)
                                   FILTER (WHERE rn = 1), '') AS text_clean,
                        count(*) FILTER (WHERE rn = 1)::BIGINT AS n_kept,
                        count(*)::BIGINT AS n_blocks
                 FROM k GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.text_clean, '') AS text_clean,
           coalesce(a.n_kept, 0)::BIGINT AS n_kept,
           coalesce(a.n_blocks, 0)::BIGINT AS n_blocks
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_blocks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-block dedup (block-quantized ExactSubstr): every
    8-token block occurring more than once corpus-wide survives only at
    its first (doc_id, block) occurrence; docs reassembled from
    surviving blocks. Two hash shuffles, min(struct) first-occurrence —
    no window over the block table, no suffix structure."""
    from featureform_spark.functions.dedup import dedup_blocks

    return dedup_blocks(
        load_table(spark, sf_dir, "documents"), block_tokens=_BLOCK_B
    )


_SUBSTR_L = 8


def _dedup_substr_sql(src: str = "documents") -> str:
    """ExactSubstr oracle body, parameterized over the source relation
    (corpus_clean_v2 runs it over a filtered base)."""
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
         n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         s AS (SELECT doc_id, toks,
                      unnest(range(n - {_SUBSTR_L} + 1)) AS pos
               FROM n WHERE n >= {_SUBSTR_L}),
         x AS (SELECT doc_id, pos,
                      array_to_string(
                        toks[(pos+1)::INT:(pos+{_SUBSTR_L})::INT], ' ')
                        AS stext
               FROM s),
         k AS (SELECT doc_id, pos,
                      count(*) OVER (PARTITION BY stext) AS cnt,
                      row_number() OVER (PARTITION BY stext
                                         ORDER BY doc_id, pos) AS rn
               FROM x),
         dup AS (SELECT doc_id, pos FROM k WHERE cnt > 1 AND rn > 1),
         cov AS (SELECT DISTINCT doc_id, pos + i AS tok
                 FROM dup, range(0, {_SUBSTR_L}) g(i)),
         tok AS (SELECT doc_id, toks, unnest(range(n)) AS i
                 FROM n WHERE n > 0),
         kept AS (SELECT tok.doc_id, tok.i, tok.toks[(tok.i+1)::INT] AS w
                  FROM tok LEFT JOIN cov
                    ON tok.doc_id = cov.doc_id AND tok.i = cov.tok
                  WHERE cov.tok IS NULL),
         agg AS (SELECT doc_id,
                        string_agg(w, ' ' ORDER BY i) AS text_clean,
                        count(*)::BIGINT AS n_kept
                 FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.text_clean, '') AS text_clean,
           coalesce(a.n_kept, 0)::BIGINT AS n_kept,
           coalesce(n.n, 0)::BIGINT AS n_tokens
    FROM {src} d
    LEFT JOIN agg a USING (doc_id)
    LEFT JOIN n USING (doc_id)
    """


@query("dedup_substr", _dedup_substr_sql())
def dedup_substr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True ExactSubstr dedup (Lee et al. 2022): every 8-token ROLLING
    shingle occurring more than once corpus-wide is removed at all but
    its first (doc_id, pos) occurrence — catching duplicated spans that
    straddle dedup_blocks' fixed 8-token boundaries. One shingle-text
    shuffle (min-struct winner, no global window), one doc-keyed
    reassembly via interval merge + complement in codegen folds; no
    suffix structure, no corpus self-join."""
    from featureform_spark.functions.dedup import dedup_substrings

    return dedup_substrings(
        load_table(spark, sf_dir, "documents"), min_tokens=_SUBSTR_L
    )


def _corpus_clean_v2_oracle() -> str:
    q = _quality_model_oracle()
    lng = _lang_id_model_oracle()
    dedup = _dedup_substr_sql("base")
    # each stage's full query (own WITH scope) nests as a CTE subquery;
    # the dedup body's leading WITH merges into the outer chain
    dedup_body = dedup.strip()
    assert dedup_body.startswith("WITH")
    dedup_body = dedup_body[len("WITH"):]
    return f"""
    WITH q AS ({q}),
         lng AS ({lng}),
         base AS (SELECT d.doc_id, d.text
                  FROM documents d
                  JOIN q ON d.doc_id = q.doc_id
                  JOIN lng ON d.doc_id = lng.doc_id
                  WHERE q.keep AND lng.lang_pred = 'en'),
    {dedup_body}
    """


def _corpus_clean_base(docs: DataFrame) -> DataFrame:
    """The single-pass filter stage of corpus_clean_v2: both trained
    models enter as expression-form scorers in ONE projection over ONE
    scan — zero doc_id joins, zero extra corpus scans (the r7 version
    materialized each model as a doc_id set and joined twice; at 100 TB
    those are two corpus-scale SortMergeJoin shuffles this shape
    eliminates). The quality logit is pure codegen; the lang predictor
    is one deduplicated ArrowEvalPython over the shared padded string.
    ``tests/test_llm_ops.py`` asserts the optimized plan has no Join
    and exactly one kernel evaluation."""
    from featureform_spark.functions.langid_model import lang_pred_expr
    from featureform_spark.functions.parallel import fan_out_if_underparallel
    from featureform_spark.functions.quality_model import quality_keep_expr

    docs = fan_out_if_underparallel(docs)
    scored = docs.select(
        "doc_id",
        "text",
        quality_keep_expr("text").alias("__keep"),
        lang_pred_expr("text").alias("__lang"),
    )
    return scored.filter(
        F.col("__keep") & (F.col("__lang") == "en")
    ).select("doc_id", "text")


@query("corpus_clean_v2", _corpus_clean_v2_oracle())
def corpus_clean_v2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-model pipeline end-to-end: logistic quality KEEP ->
    NB language ID == 'en' -> true ExactSubstr dedup over the
    survivors. Every stage is the round-7 oracle-paired operator; the
    composition's oracle nests each stage's full query as a CTE
    subquery and chains the dedup body over the filtered base. Scale
    shape: both model scores are expression-form columns in a single
    projection+filter over one scan (no doc_id joins — see
    :func:`_corpus_clean_base`); dedup adds its two hash shuffles — no
    corpus self-join anywhere."""
    from featureform_spark.functions.dedup import dedup_substrings

    base = _corpus_clean_base(load_table(spark, sf_dir, "documents"))
    return dedup_substrings(base, min_tokens=_SUBSTR_L)



# ---------------------------------------------------------------------------
# incremental dedup vs a signature store
# ---------------------------------------------------------------------------


def _incremental_dedup_oracle() -> str:
    rows = _NUM_HASHES // _BANDS
    band_exprs = []
    for b in range(_BANDS):
        parts = " || '|' || ".join(
            f"CAST(sig_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_exprs.append(f"'{b}:' || md5({parts})")
    return f"""
    WITH {_SHINGLES_CTE},
    {_SIG_CTE},
    buckets AS (SELECT doc_id, unnest([{', '.join(band_exprs)}]) AS bucket FROM sig),
    hits AS (
      SELECT DISTINCT n.doc_id
      FROM buckets n JOIN buckets o ON n.bucket = o.bucket
      WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 <> 0)
    SELECT d.doc_id,
           (CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS is_dup
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 5 = 0
    """


@query("incremental_dedup", _incremental_dedup_oracle())
def incremental_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion near-dup flagging: docs with doc_id % 5 == 0
    arrive as a new batch and are flagged against the band buckets of
    the already-accepted corpus (the rest). One explode over the batch
    + one bucket semi-join against the store — the corpus text is never
    rescanned, which is the property that matters at 100 TB."""
    from featureform_spark.functions.dedup import (
        incremental_lsh_flags,
        lsh_band_buckets,
    )

    docs = load_table(spark, sf_dir, "documents")
    accepted = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return incremental_lsh_flags(batch, lsh_band_buckets(accepted))


def _inc_emb_oracle(num_planes: int = 8, threshold: float = 0.2) -> str:
    dot = _DOT.format(n=_DIM + 1, a="acc.v", b="bat.v")
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    b0 AS (SELECT vec_id, v,
                  {_bucket_case_sql('v', num_planes)} AS bucket,
                  {_NORM.format(a='v')} AS n
           FROM e),
    acc AS (SELECT * FROM b0 WHERE vec_id % 5 <> 0),
    bat AS (SELECT * FROM b0 WHERE vec_id % 5 = 0),
    hits AS (
      SELECT bat.vec_id AS vec_id, MIN(acc.vec_id) AS dup_of
      FROM bat JOIN acc ON acc.bucket = bat.bucket
       AND {dot} / (bat.n * acc.n) >= {threshold}
      GROUP BY bat.vec_id)
    SELECT bat.vec_id,
           CAST(CASE WHEN h.dup_of IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_dup,
           h.dup_of
    FROM bat LEFT JOIN hits h ON bat.vec_id = h.vec_id
    """


@query("incremental_embedding_dedup", _inc_emb_oracle())
def incremental_embedding_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion EMBEDDING near-dup (r11 — the vector twin
    of incremental_dedup): vectors with vec_id % 5 == 0 arrive as a
    batch and are flagged against the persisted EmbeddingStore of the
    accepted rest — store side semi-pruned to the batch's buckets,
    exact cosine verify per candidate (flags are exact at the
    threshold, not candidate semantics). The corpus is never
    rescanned; state is one row per accepted vector."""
    from featureform_spark.streaming.vector_store import EmbeddingStore
    from featureform_spark.suite_delta import _scratch

    emb = load_table(spark, sf_dir, "embeddings")
    accepted = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    # destination-auto bucketing: the floor reproduces the oracle's 8
    # planes at every driver/parity sf (< 4k accepted vectors) while
    # the x100 bench re-sizes to 14 — the auto-twin pattern, in the
    # lifecycle form (x100 measured 157.7s pinned -> re-sized fixes
    # the candidate blowup the same way embedding_near_dup_auto's did)
    st = EmbeddingStore.auto(
        spark,
        _scratch(sf_dir, "emb_store"),
        dim=_DIM,
        expected_corpus_rows=accepted.count(),
        cosine_threshold=0.2,
    )
    st.ingest(accepted)
    return st.flag(batch)


# ---------------------------------------------------------------------------
# quality-weighted sampling
# ---------------------------------------------------------------------------

_QS_SCALE = 1.2


@query(
    "quality_sample",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
         s AS (SELECT doc_id,
                      least(len(toks)::DOUBLE / 50.0, 1.0) * 0.4
                        + (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE) * 0.4
                        + (len(list_filter(toks, x -> x IN ({_sql_in(STOPWORDS)})))::DOUBLE
                           / len(toks)::DOUBLE) * 0.2 AS quality_score
               FROM t)
    SELECT doc_id, quality_score
    FROM s
    WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || '#42'), 1, 8)) AS BIGINT)
          < floor(least(greatest(quality_score * {_QS_SCALE}, 0.0), 1.0)
                  * 4294967296.0)::BIGINT
    """,
)
def quality_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (public DSIR-style data
    selection): keep probability = clamp(quality_score * 1.2, 0, 1) via
    a deterministic md5 Bernoulli draw — scan + filter, zero shuffles,
    composes with any upstream score."""
    from featureform_spark.functions.text import text_stats
    from featureform_spark.operators.mixing import quality_weighted_sample

    scored = text_stats(load_table(spark, sf_dir, "documents"))
    return quality_weighted_sample(
        scored, "quality_score", ["doc_id"], scale=_QS_SCALE
    ).select("doc_id", "quality_score")


@query(
    "sample_k_per_source",
    """
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substr(md5(doc_id::VARCHAR || '#42'), 1, 8))
                             AS BIGINT),
                        doc_id::VARCHAR) AS rn
      FROM documents)
    SELECT doc_id, source FROM r WHERE rn <= 15
    """,
)
def sample_k_per_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 15 docs per source by deterministic hash ranking —
    balanced per-domain selection with zero sampling variance; one
    shuffle on source."""
    from featureform_spark.operators.mixing import sample_k_per_group

    return sample_k_per_group(
        load_table(spark, sf_dir, "documents"), "source", 15, ["doc_id"]
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# k-means clustering + SemDeDup (functions/clustering.py)
# ---------------------------------------------------------------------------

_KM_COS_VC = (
    _DOT.format(n=_DIM + 1, a="e.v", b="c.cv")
    + " / (" + _NORM.format(a="e.v") + " * " + _NORM.format(a="c.cv") + ")"
)


def _kmeans_ctes(k: int, iters: int) -> str:
    """WITH-clause chain replicating kmeans_fit: md5-seeded init (a0),
    then ``iters`` rounds of (rounded per-dim AVG centroids -> argmax
    re-assignment). Ends at a{iters} = (vec_id, v, cluster)."""
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v"
        " FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM e"
        f" ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})",
    ]
    for r in range(iters + 1):
        if r > 0:
            parts.append(
                f"c{r} AS (SELECT cluster AS cid, list(av ORDER BY ord) AS cv"
                f" FROM (SELECT cluster, i AS ord, round(avg(v[i]), 6) AS av"
                f" FROM a{r - 1}, range(1, {_DIM + 1}) t(i)"
                f" GROUP BY cluster, i) GROUP BY cluster)"
            )
        parts.append(
            f"a{r} AS (SELECT vec_id, v, cid AS cluster FROM ("
            f" SELECT e.vec_id, e.v, c.cid,"
            f" row_number() OVER (PARTITION BY e.vec_id"
            f" ORDER BY {_KM_COS_VC} DESC, c.cid) AS rn"
            f" FROM e, c{r} c) WHERE rn = 1)"
        )
    return "WITH " + ",\n".join(parts)


def _kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    return f"""
    {_kmeans_ctes(k, iters)}
    SELECT vec_id, cluster FROM a{iters}
    """


@query("kmeans_clusters", _kmeans_oracle())
def kmeans_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (spherical assignment): md5-seeded init,
    2 refinement rounds. Per round: one scan, one k-row groupBy with
    dim partial-agg AVGs, one single-row broadcast — the corpus never
    shuffles on anything but the k-row centroid key. Centroids rounded
    to 6 decimals to pin cross-engine floats."""
    from featureform_spark.functions.clustering import kmeans_fit

    return kmeans_fit(
        load_table(spark, sf_dir, "embeddings"), k=8, dim=_DIM, iters=2
    ).select("vec_id", "cluster")


_CLOSURE_MARGIN = 0.25
_CLOSURE_CAP = 3


def _shard_closure_oracle(k: int = 4, iters: int = 2) -> str:
    return f"""
    {_kmeans_ctes(k, iters)},
    scored AS (
      SELECT e.vec_id, c.cid, {_KM_COS_VC} AS s,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {_KM_COS_VC} DESC, c.cid) AS rn,
             max({_KM_COS_VC}) OVER (PARTITION BY e.vec_id) AS best
      FROM e, c{iters} c)
    SELECT vec_id, cid AS shard
    FROM scored
    WHERE rn = 1
       OR (rn <= {_CLOSURE_CAP} AND s >= best - {_CLOSURE_MARGIN})
    """


@query("shard_closure", _shard_closure_oracle())
def shard_closure_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPANN closure assignment over k-means cells: every vector maps
    to its best cell plus any cell within 0.25 cosine of the best
    (max 3 memberships) — the boundary replication that keeps routed
    ANN shard probes (ShardedHnsw partitioner='kmeans') at 0.97@10
    recall probing 2 of 4 shards on UNclustered embeddings. Scale
    shape: Lloyd is one scan + one k-row groupBy per round; closure is
    one mapInPandas projection with the k centroids riding the closure
    — no shuffle, <= 3 output rows per vector. Scores fold
    sequentially per dimension, bit-exact to the oracle's
    list_reduce."""
    from featureform_spark.functions.clustering import (
        _refine_vectorized,
        closure_assign,
        kmeans_init,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_init(emb, 4).collect()
    for _ in range(2):
        # fused assignment + partial-sum round (r13): only k rows per
        # batch cross the Python boundary, same 6-dp-rounded means
        cents = _refine_vectorized(emb, cents, _DIM)
    return closure_assign(
        emb, cents, margin=_CLOSURE_MARGIN, max_assign=_CLOSURE_CAP
    )


def _semantic_dedup_oracle(
    k: int = 8, iters: int = 2, threshold: float = 0.4
) -> str:
    cos_ab = (
        _DOT.format(n=_DIM + 1, a="a.v", b="b.v")
        + " / (" + _NORM.format(a="a.v") + " * " + _NORM.format(a="b.v") + ")"
    )
    return f"""
    {_kmeans_ctes(k, iters)},
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM a{iters} a JOIN a{iters} b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {cos_ab} >= {threshold})
    SELECT vec_id, cluster FROM a{iters}
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """


@query("semantic_dedup", _semantic_dedup_oracle())
def semantic_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cluster embeddings, drop within-cluster near-dups
    (cos >= 0.4, greedy min-id keep). The pairwise join runs ONLY on
    the cluster key, so candidate volume is bounded by cluster sizes,
    never corpus^2."""
    from featureform_spark.functions.clustering import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        k=8, dim=_DIM, threshold=0.4, iters=2,
    )


# ---------------------------------------------------------------------------
# Product Quantization ANN (functions/quantization.py)
# ---------------------------------------------------------------------------

_L2 = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (acc, x) -> acc + x)"
)


def _pq_oracle(m: int = 8, ksub: int = 16, k: int = 10) -> str:
    sd = _DIM // m
    l2_a0 = _L2.format(n=sd + 1, a="sub.sv", b="c.cv")
    l2_asg = _L2.format(n=sd + 1, a="sub.sv", b="cb.cv")
    l2_dt = _L2.format(n=sd + 1, a="cb.cv", b="q.qv")
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    sub AS (SELECT vec_id, s, v[(s*{sd}+1):(s*{sd}+{sd})] AS sv
            FROM e, range(0, {m}) t(s)),
    seeds AS (SELECT vec_id FROM e
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ksub}),
    c0 AS (SELECT sub.s, sub.vec_id AS cid, sub.sv AS cv
           FROM sub JOIN seeds USING (vec_id)),
    a0 AS (SELECT vec_id, s, sv, cid FROM (
             SELECT sub.vec_id, sub.s, sub.sv, c.cid,
                    row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                       ORDER BY {l2_a0} ASC, c.cid) AS rn
             FROM sub JOIN c0 c ON sub.s = c.s) WHERE rn = 1),
    c1 AS (SELECT s, cid, list(av ORDER BY ord) AS cv FROM (
             SELECT s, cid, i AS ord, round(avg(sv[i]), 6) AS av
             FROM a0, range(1, {sd + 1}) t(i) GROUP BY s, cid, i)
           GROUP BY s, cid),
    cb AS (SELECT s, row_number() OVER (PARTITION BY s ORDER BY cid) - 1 AS code, cv
           FROM c1),
    asg AS (SELECT vec_id, s, code FROM (
              SELECT sub.vec_id, sub.s, cb.code,
                     row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                        ORDER BY {l2_asg} ASC, cb.code) AS rn
              FROM sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
    codes AS (SELECT vec_id, list(code ORDER BY s) AS codes
              FROM asg GROUP BY vec_id),
    q AS (SELECT s, sv AS qv FROM sub WHERE vec_id = 0),
    dt AS (SELECT cb.s, cb.code, {l2_dt} AS d
           FROM cb JOIN q ON cb.s = q.s),
    dtab AS (SELECT list(ds ORDER BY s) AS t FROM (
               SELECT s, list(d ORDER BY code) AS ds FROM dt GROUP BY s) g),
    scored AS (SELECT vec_id,
                      list_reduce(list_prepend(0.0,
                        list_transform(range(0, {m}),
                                       s -> t[s+1][codes[s+1]+1])),
                        (acc, x) -> acc + x) AS adc_dist
               FROM codes, dtab)
    SELECT vec_id, adc_dist FROM scored
    ORDER BY adc_dist ASC, vec_id LIMIT {k}
    """


@query("pq_ann_topk", _pq_oracle())
def pq_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-Quantization ADC top-k: md5-seeded one-round-Lloyd
    codebooks per subspace, ZERO-shuffle encode (one packed broadcast
    row + nested-HOF argmin), fixed-order fold over the m×ksub
    distance table (bit-identical cross-engine, no groupBy sum). The
    scan side touches 8 bytes of codes per vector — the memory-bound
    ANN path at 100 TB."""
    from featureform_spark.functions.quantization import pq_topk

    return pq_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0, k=10, dim=_DIM, m=8, ksub=16,
    )


def _ivfpq_oracle(
    num_cells: int = 16, nprobe: int = 4, m: int = 8, ksub: int = 16,
    k: int = 10,
) -> str:
    sd = _DIM // m
    cos_vc = (
        _DOT.format(n=_DIM + 1, a="e.v", b="c.ccv")
        + " / (" + _NORM.format(a="e.v") + " * " + _NORM.format(a="c.ccv") + ")"
    )
    cos_cq = (
        _DOT.format(n=_DIM + 1, a="c.ccv", b="q.qv")
        + " / (" + _NORM.format(a="c.ccv") + " * " + _NORM.format(a="q.qv") + ")"
    )
    l2_a0 = _L2.format(n=sd + 1, a="sub.sv", b="c0.cv")
    l2_asg = _L2.format(n=sd + 1, a="sub.sv", b="cb.cv")
    l2_dt = _L2.format(n=sd + 1, a="cb.cv", b="qsub.qsv")
    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    c AS (SELECT vec_id AS ccid, v AS ccv FROM e
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {num_cells}),
    a AS (SELECT e.vec_id, e.v, c.ccid,
                 row_number() OVER (PARTITION BY e.vec_id
                                    ORDER BY {cos_vc} DESC, c.ccid) AS rn
          FROM e, c),
    asn AS (SELECT vec_id, v, ccid AS cell FROM a WHERE rn = 1),
    res AS (SELECT asn.vec_id, asn.cell,
                   list_transform(range(1, {_DIM + 1}),
                                  i -> asn.v[i] - c.ccv[i]) AS r
            FROM asn JOIN c ON asn.cell = c.ccid),
    sub AS (SELECT vec_id, cell, s, r[(s*{sd}+1):(s*{sd}+{sd})] AS sv
            FROM res, range(0, {m}) t(s)),
    seeds AS (SELECT vec_id FROM e
              WHERE vec_id NOT IN (SELECT ccid FROM c)
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ksub}),
    c0 AS (SELECT sub.s, sub.vec_id AS cid, sub.sv AS cv
           FROM sub JOIN seeds USING (vec_id)),
    a0 AS (SELECT vec_id, s, sv, cid FROM (
             SELECT sub.vec_id, sub.s, sub.sv, c0.cid,
                    row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                       ORDER BY {l2_a0} ASC, c0.cid) AS rn
             FROM sub JOIN c0 ON sub.s = c0.s) WHERE rn = 1),
    c1 AS (SELECT s, cid, list(av ORDER BY ord) AS cv FROM (
             SELECT s, cid, i AS ord, round(avg(sv[i]), 6) AS av
             FROM a0, range(1, {sd + 1}) t(i) GROUP BY s, cid, i)
           GROUP BY s, cid),
    cb AS (SELECT s,
                  row_number() OVER (PARTITION BY s ORDER BY cid) - 1 AS code,
                  cv
           FROM c1),
    asg AS (SELECT vec_id, s, code FROM (
              SELECT sub.vec_id, sub.s, cb.code,
                     row_number() OVER (PARTITION BY sub.vec_id, sub.s
                                        ORDER BY {l2_asg} ASC, cb.code) AS rn
              FROM sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
    codes AS (SELECT vec_id, list(code ORDER BY s) AS codes
              FROM asg GROUP BY vec_id),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    probe AS (SELECT c.ccid AS cell, c.ccv FROM c, q
              ORDER BY {cos_cq} DESC, c.ccid LIMIT {nprobe}),
    qres AS (SELECT probe.cell,
                    list_transform(range(1, {_DIM + 1}),
                                   i -> q.qv[i] - probe.ccv[i]) AS qr
             FROM probe, q),
    qsub AS (SELECT cell, s, qr[(s*{sd}+1):(s*{sd}+{sd})] AS qsv
             FROM qres, range(0, {m}) t(s)),
    dt AS (SELECT qsub.cell, cb.s, cb.code, {l2_dt} AS d
           FROM cb JOIN qsub ON cb.s = qsub.s),
    dtab AS (SELECT cell, list(ds ORDER BY s) AS t FROM (
               SELECT cell, s, list(d ORDER BY code) AS ds
               FROM dt GROUP BY cell, s) g GROUP BY cell),
    cellmap AS (SELECT vec_id, cell FROM res),
    scored AS (SELECT codes.vec_id,
                      list_reduce(list_prepend(0.0,
                        list_transform(range(0, {m}),
                                       s -> t[s+1][codes.codes[s+1]+1])),
                        (acc, x) -> acc + x) AS adc_dist
               FROM codes
               JOIN cellmap cm ON codes.vec_id = cm.vec_id
               JOIN dtab ON cm.cell = dtab.cell)
    SELECT vec_id, adc_dist FROM scored
    ORDER BY adc_dist ASC, vec_id LIMIT {k}
    """


@query("embedding_ivfpq_topk", _ivfpq_oracle())
def embedding_ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (Jégou et al. 2011): IVF coarse cells bound the scan to
    nprobe inverted lists; a PQ codebook trained on cell RESIDUALS
    scores candidates from 8-byte codes via one ADC table per probed
    cell. The production-standard composition of embedding_ivf_topk's
    cells and pq_ann_topk's codes — the recall role the reference's
    embeddinghub fills with an hnswlib HierarchicalNSW graph
    (embeddinghub/embeddingstore/index.h:19-33) at a scale a
    single-node graph can't reach. One bounded training shuffle,
    zero-shuffle encode, broadcast-join probe, TakeOrderedAndProject."""
    from featureform_spark.functions.quantization import ivfpq_topk

    return ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0, k=10, dim=_DIM, num_cells=16, nprobe=4, m=8, ksub=16,
    )


def _ivfpq_filtered_oracle(k: int = 10) -> str:
    l2 = _L2.format(n=_DIM + 1, a="e.v", b="q.qv")
    return f"""
    WITH q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
               FROM embeddings WHERE vec_id = 0),
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings WHERE vec_id % 5 = 0)
    SELECT vec_id, {l2} AS dist FROM e, q
    ORDER BY dist ASC, vec_id LIMIT {k}
    """


@query("embedding_ivfpq_filtered", _ivfpq_filtered_oracle())
def embedding_ivfpq_filtered_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search through IVFADC: a 20%-selective id
    predicate masks candidates BEFORE top-k (broadcast semi-join), and
    the probe/rerank budgets scale by 1/selectivity (ACORN-style —
    filtered top-k over an s-fraction of the corpus has the breadth of
    unfiltered top-(k/s)). At this selectivity the scaled probe covers
    every cell and the exact re-rank pool covers the full allowed set,
    so the answer is bit-exact against the SQL oracle's true L2 top-k
    over the filtered subset — the deterministic end of the recall
    ladder ANN_RECALL.json measures (the reference serves the same
    filtered-nearest shape from embeddinghub)."""
    from featureform_spark.functions.quantization import ivfpq_topk

    return ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0, k=10, dim=_DIM, num_cells=16, nprobe=4, m=8,
        ksub=16, rerank=200, where=F.col("vec_id") % 5 == 0,
    )


def _ann_multiprobe_oracle(num_planes: int = 8, k: int = 10, radius: int = 1) -> str:
    dot = _DOT.format(n=_DIM + 1, a="v", b="qv")
    nv = _NORM.format(a="v")
    nq = _NORM.format(a="qv")
    return f"""
    WITH q AS (
      SELECT list_transform(embedding, x -> x::DOUBLE) AS qv,
             {_bucket_case_sql("list_transform(embedding, x -> x::DOUBLE)", num_planes)} AS qbucket
      FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
             {_bucket_case_sql("list_transform(embedding, x -> x::DOUBLE)", num_planes)} AS bucket
      FROM embeddings),
    s AS (
      SELECT vec_id, {dot} / ({nv} * {nq}) AS score
      FROM e, q WHERE hamming(e.bucket, q.qbucket) <= {radius})
    SELECT vec_id, score FROM s ORDER BY score DESC, vec_id LIMIT {k}
    """


@query("embedding_ann_multiprobe", _ann_multiprobe_oracle())
def embedding_ann_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al., VLDB'07): also probe every
    bucket at Hamming distance 1 from the query's — 9 buckets instead
    of 1 here, recovering neighbors that fall on the wrong side of one
    hyperplane. The probe set is query-only metadata pushed as an IN
    filter (partition prune at scale)."""
    from featureform_spark.functions.similarity import ann_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ann_topk_lsh(emb, qvec, k=10, num_planes=8, hamming_radius=1)


def _hard_negatives_oracle(num_planes: int = 8, k: int = 3) -> str:
    dot = _DOT.format(n=_DIM + 1, a="a.v", b="b.v")
    na = _NORM.format(a="a.v")
    nb = _NORM.format(a="b.v")
    return f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    bkt AS (SELECT vec_id, label, v,
                   {_bucket_case_sql('v', num_planes)} AS bucket FROM e),
    pairs AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
             {dot} / ({na} * {nb}) AS cosine
      FROM bkt a JOIN bkt b
        ON a.bucket = b.bucket AND a.label <> b.label),
    ranked AS (
      SELECT anchor_id, negative_id, cosine,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, negative_id) AS rank
      FROM pairs)
    SELECT anchor_id, negative_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("hard_negatives", _hard_negatives_oracle())
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training data curation: per anchor, the k most
    similar different-label vectors from its LSH bucket — bucketed
    equi-join candidates (never corpus^2), per-anchor window rank over
    the bounded set."""
    from featureform_spark.functions.similarity import hard_negatives

    return hard_negatives(
        load_table(spark, sf_dir, "embeddings"), dim=_DIM, k=3, num_planes=8
    )


@query("hard_negatives_auto", _hard_negatives_oracle())
def hard_negatives_auto_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-sized twin of hard_negatives (floor-8 => pinned-identical
    at driver/parity sf, re-sizes at bench scale; see lsh_autosize)."""
    from featureform_spark.functions.similarity import hard_negatives

    return hard_negatives(
        load_table(spark, sf_dir, "embeddings"), dim=_DIM, k=3
    )


# ---------------------------------------------------------------------------
# batched retrieval + IR evaluation (recall@k / MRR / NDCG)
# ---------------------------------------------------------------------------

_EVAL_Q = 16  # eval queries: vec_id < 16
_EVAL_K = 10


def _batch_ann_sql(num_planes: int = 8, k: int = _EVAL_K) -> str:
    """CTEs shared by the batch-ANN query and the retrieval-eval oracle:
    e (double vectors), q (eval queries), b/qb (bucketed), retr (per-query
    LSH top-k), exact (per-query exact top-k ground truth)."""
    cosb = (
        _DOT.format(n=_DIM + 1, a="b.v", b="qb.qv")
        + " / (" + _NORM.format(a="b.v") + " * " + _NORM.format(a="qb.qv") + ")"
    )
    cose = (
        _DOT.format(n=_DIM + 1, a="e.v", b="q.qv")
        + " / (" + _NORM.format(a="e.v") + " * " + _NORM.format(a="q.qv") + ")"
    )
    return f"""
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_EVAL_Q}),
    b AS (SELECT vec_id, v, {_bucket_case_sql('v', num_planes)} AS bucket FROM e),
    qb AS (SELECT query_id, qv, {_bucket_case_sql('qv', num_planes)} AS bucket
           FROM q),
    retr AS (
      SELECT query_id, vec_id, score, rank FROM (
        SELECT qb.query_id, b.vec_id, {cosb} AS score,
               ROW_NUMBER() OVER (PARTITION BY qb.query_id
                                  ORDER BY {cosb} DESC, b.vec_id) AS rank
        FROM qb JOIN b ON qb.bucket = b.bucket AND b.vec_id <> qb.query_id)
      WHERE rank <= {k}),
    exact AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {cose} DESC, e.vec_id) AS rank
        FROM q, e WHERE e.vec_id <> q.query_id)
      WHERE rank <= {k})
    """


@query(
    "embedding_batch_ann",
    f"WITH {_batch_ann_sql()} SELECT query_id, vec_id AS item_id, score, rank FROM retr",
)
def embedding_batch_ann_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN — the serving shape: MANY queries resolved in ONE
    corpus scan via a broadcast bucket equi-join; the ranking window sees
    only the bounded candidate set (bucket occupancy), never Q x N."""
    from featureform_spark.functions.similarity import ann_topk_lsh_batch

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _EVAL_Q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_topk_lsh_batch(
        emb, queries, dim=_DIM, k=_EVAL_K, num_planes=8, exclude_self=True
    ).select("query_id", F.col("vec_id").alias("item_id"), "score", "rank")


def _retrieval_eval_oracle(k: int = _EVAL_K) -> str:
    from featureform_spark.functions.retrieval import (
        dcg_gain_table,
        idcg_prefix_table,
    )

    # Python-computed literals, cast to DOUBLE[] so DuckDB's decimal
    # literal parsing can't perturb the values — bit-identical to the
    # F.lit doubles on the Spark side
    gains = "[" + ", ".join(repr(g) for g in dcg_gain_table(k)) + "]::DOUBLE[]"
    idcg = "[" + ", ".join(repr(v) for v in idcg_prefix_table(k)) + "]::DOUBLE[]"
    return f"""
    WITH {_batch_ann_sql(k=k)},
    tpq AS (SELECT query_id, count(*) AS n_truth FROM exact GROUP BY query_id),
    hits AS (SELECT r.query_id, r.rank
             FROM retr r JOIN exact t
               ON r.query_id = t.query_id AND r.vec_id = t.vec_id),
    hpq AS (SELECT query_id, count(*) AS n_hits, min(rank) AS first_rank,
                   list_reduce(
                     list_prepend(0.0, list_transform(
                       list_sort(list(rank)), r -> ({gains})[r])),
                     (acc, x) -> acc + x) AS dcg
            FROM hits GROUP BY query_id)
    SELECT t.query_id, t.n_truth,
           coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0) / least({k}, t.n_truth), 6) AS recall_at_k,
           round(coalesce(1.0 / h.first_rank, 0.0), 6) AS mrr,
           round(coalesce(h.dcg / ({idcg})[least({k}, t.n_truth)], 0.0), 6) AS ndcg
    FROM tpq t LEFT JOIN hpq h USING (query_id)
    """


@query("retrieval_eval", _retrieval_eval_oracle())
def retrieval_eval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation closing the ANN loop: per-query recall@10, MRR and
    NDCG@10 of batched LSH ANN against exact cosine ground truth. All
    metric folds use Python-injected gain tables and rank-sorted
    aggregation, so the doubles are bit-identical cross-engine."""
    from featureform_spark.functions.retrieval import retrieval_metrics
    from featureform_spark.functions.similarity import (
        ann_topk_lsh_batch,
        cosine_topk_batch,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _EVAL_Q).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = cosine_topk_batch(
        emb, queries, k=_EVAL_K, exclude_self=True
    ).select("query_id", F.col("vec_id").alias("item_id"))
    retrieved = ann_topk_lsh_batch(
        emb, queries, dim=_DIM, k=_EVAL_K, num_planes=8, exclude_self=True
    ).select("query_id", F.col("vec_id").alias("item_id"), "rank")
    return retrieval_metrics(retrieved, truth, k=_EVAL_K)


# ---------------------------------------------------------------------------
# exact heavy hitters (two-pass frequent n-grams)
# ---------------------------------------------------------------------------

_HH_FRAC = 0.0002


@query(
    "frequent_ngrams",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    g AS (SELECT unnest(list_transform(range(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
          FROM t),
    tot AS (SELECT count(*) AS n FROM g),
    c AS (SELECT ngram, count(*) AS cnt FROM g GROUP BY ngram)
    SELECT ngram, cnt FROM c, tot WHERE cnt >= ceil({_HH_FRAC}::DOUBLE * n)
    """,
)
def frequent_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detection: EXACT corpus-wide heavy-hitter
    trigrams via the two-pass recipe — JVM-native freqItems candidate
    sketch (O(1/support) output regardless of corpus size) + broadcast
    semi-join exact verify. The naive full n-gram shuffle never happens."""
    from featureform_spark.functions.heavy_hitters import frequent_ngrams

    return frequent_ngrams(
        load_table(spark, sf_dir, "documents"), n=3, min_frac=_HH_FRAC
    )


# ---------------------------------------------------------------------------
# collocations (PMI) + one-scan corpus report (CUBE)
# ---------------------------------------------------------------------------


@query(
    "collocations_pmi",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    g AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
                 unnest(toks[2:len(toks)]) AS w2 FROM t),
    u AS (SELECT unnest(toks) AS w FROM t),
    uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
    nu AS (SELECT count(*) AS n_uni FROM u),
    bc AS (SELECT w1, w2, count(*) AS pair_count FROM g GROUP BY w1, w2),
    nb AS (SELECT count(*) AS n_bi FROM g)
    SELECT w1, w2, pair_count, u1.c AS w1_count, u2.c AS w2_count,
           round((pair_count::DOUBLE / n_bi::DOUBLE)
                 / ((u1.c::DOUBLE / n_uni::DOUBLE)
                    * (u2.c::DOUBLE / n_uni::DOUBLE)), 6) AS lift
    FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w, nu, nb
    WHERE pair_count >= 5
    ORDER BY lift DESC, w1, w2 LIMIT 50
    """,
)
def collocations_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-word-expression mining: adjacent-pair PMI lift, exact
    integer counts until one final double expression; two partial-agg
    groupBys + broadcast vocab joins + TakeOrderedAndProject top-n."""
    from featureform_spark.functions.text import collocations

    return collocations(
        load_table(spark, sf_dir, "documents"), min_count=5, top_n=50
    )


@query(
    "corpus_report",
    f"""
    WITH t AS (SELECT source, lang, length(text)::BIGINT AS n_chars,
                      len({_TOKS})::BIGINT AS n_toks
               FROM documents)
    SELECT coalesce(source, '(all)') AS source,
           coalesce(lang, '(all)') AS lang,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           sum(n_toks)::BIGINT AS total_tokens
    FROM t GROUP BY CUBE(source, lang)
    """,
)
def corpus_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card rollup in ONE scan: doc/char/token totals at every
    (source x lang) granularity plus marginals and the grand total via
    CUBE grouping sets — four aggregation levels for the price of one
    shuffle (Spark expands grouping sets map-side, partial-aggregated).
    Integer-only metrics so every cell is cross-engine exact."""
    docs = load_table(spark, sf_dir, "documents")
    from featureform_spark.functions.text import tokens_expr

    base = docs.select(
        "source",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tokens_expr("text")).cast("long").alias("n_toks"),
    )
    return (
        base.cube("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_toks").alias("total_tokens"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("(all)")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("(all)")).alias("lang"),
            "n_docs",
            "total_chars",
            "total_tokens",
        )
    )


@query(
    "dedup_sentences",
    """
    WITH parts AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS sent,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    ), firsts AS (
      SELECT doc_id, sent, MIN(pos) AS pos, COUNT(*) AS n
      FROM parts GROUP BY doc_id, sent
    )
    SELECT doc_id,
           string_agg(sent, ' ' ORDER BY pos) AS clean_text,
           CAST(SUM(n) AS BIGINT) AS n_sentences,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removed
    FROM firsts GROUP BY doc_id
    """,
)
def dedup_sentences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repeated-segment removal (functions/text.py:
    dedup_sentences): first occurrence kept, order preserved — the
    boilerplate scrubber of LLM cleaning pipelines (real corpora split
    on sentence/line separators; the synthetic docs have none, so the
    suite exercises the machinery at token granularity)."""
    from featureform_spark.functions.text import dedup_sentences

    return dedup_sentences(
        load_table(spark, sf_dir, "documents"), sep=" "
    )


@query(
    "repetition_signals",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g2 AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                         i -> concat_ws(' ', toks[i], toks[i + 1]))) AS ng
           FROM t WHERE len(toks) >= 2),
    c2 AS (SELECT doc_id, ng, count(*)::BIGINT AS occ, length(ng) AS ch
           FROM g2 GROUP BY doc_id, ng),
    a2 AS (SELECT doc_id,
                  MAX(occ * ch)::DOUBLE / SUM(occ * ch)::DOUBLE AS top2
           FROM c2 GROUP BY doc_id),
    g3 AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks) - 1),
                         i -> concat_ws(' ', toks[i], toks[i + 1],
                                        toks[i + 2]))) AS ng
           FROM t WHERE len(toks) >= 3),
    c3 AS (SELECT doc_id, ng, count(*)::BIGINT AS occ, length(ng) AS ch
           FROM g3 GROUP BY doc_id, ng),
    a3 AS (SELECT doc_id,
                  MAX(occ * ch)::DOUBLE / SUM(occ * ch)::DOUBLE AS top3
           FROM c3 GROUP BY doc_id),
    g5 AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks) - 3),
                         i -> concat_ws(' ', toks[i], toks[i + 1],
                                        toks[i + 2], toks[i + 3],
                                        toks[i + 4]))) AS ng
           FROM t WHERE len(toks) >= 5),
    c5 AS (SELECT doc_id, ng, count(*)::BIGINT AS occ, length(ng) AS ch
           FROM g5 GROUP BY doc_id, ng),
    a5 AS (SELECT doc_id,
                  SUM(CASE WHEN occ > 1 THEN occ * ch ELSE 0 END)::DOUBLE
                  / SUM(occ * ch)::DOUBLE AS dup5
           FROM c5 GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(a2.top2, 0.0) AS top2_char_frac,
           COALESCE(a3.top3, 0.0) AS top3_char_frac,
           COALESCE(a5.dup5, 0.0) AS dup5_char_frac,
           (COALESCE(a2.top2, 0.0) < 0.20
            AND COALESCE(a3.top3, 0.0) < 0.18
            AND COALESCE(a5.dup5, 0.0) < 0.15)::BIGINT AS keep_repetition
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN a2 USING (doc_id)
    LEFT JOIN a3 USING (doc_id)
    LEFT JOIN a5 USING (doc_id)
    """,
)
def repetition_signals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher char-fraction repetition rules (round 6): top-2/3-gram
    and duplicated-5-gram character coverage + keep verdict
    (functions/quality.py:repetition_signals). Complements the
    count-based quality_signals; the filter Gopher applies before
    training-set admission."""
    from featureform_spark.functions.quality import repetition_signals

    return repetition_signals(load_table(spark, sf_dir, "documents"))


@query(
    "cross_doc_line_dedup",
    """
    WITH c AS (
        SELECT text, COUNT(DISTINCT doc_id) AS nd
        FROM documents GROUP BY text
    )
    SELECT d.doc_id,
           CASE WHEN c.nd >= 3 AND length(d.text) > 0
                THEN '' ELSE d.text END AS clean_text,
           (CASE WHEN d.doc_id % 2 = 0 THEN 3 ELSE 2 END)::BIGINT
               AS n_lines,
           (CASE WHEN d.doc_id % 2 = 0 THEN 3 ELSE 2 END
            - CASE WHEN c.nd >= 3 AND length(d.text) > 0
                   THEN 0 ELSE 1 END)::BIGINT AS n_removed
    FROM documents d JOIN c USING (text)
    """,
)
def cross_doc_line_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style CROSS-document boilerplate removal (round 6,
    ORACLE INVARIANTS: the analytic n_lines=3/2 shape assumes no
    document text contains '. ', even doc_ids number >= min_docs, and
    the planted footer/banner strings never appear in a body — all
    verified true for every shipped sf and preserved by
    make_scaled_sf.py's per-copy suffixing;
    functions/dedup.py:cross_doc_line_dedup): lines appearing in >= 3
    distinct documents are corpus boilerplate and are stripped from
    every doc. The synthetic docs carry no shared lines, so the query
    plants the classic shape — a footer on every doc and a cookie
    banner on half — and the operator must remove exactly those while
    each doc's own (unique) body survives; the oracle derives the
    expected output analytically (including the degenerate case of a
    body duplicated across >= 3 docs)."""
    from featureform_spark.functions.dedup import cross_doc_line_dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(". copyright footer 2024"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(". cookie banner")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return cross_doc_line_dedup(docs, min_docs=3)


@query(
    "script_profile",
    """
    WITH t AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 3 = 0
                            THEN ' привет мир данные'
                            WHEN doc_id % 3 = 1
                            THEN ' 数据处理流水线'
                            ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           CASE WHEN length(text) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE
               / length(text)::DOUBLE END AS latin_ratio,
           CASE WHEN length(text) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')))::DOUBLE
               / length(text)::DOUBLE END AS cyrillic_ratio,
           CASE WHEN length(text) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')))::DOUBLE
               / length(text)::DOUBLE END AS cjk_ratio,
           CASE WHEN length(text) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[؀-ۿ]', '', 'g')))::DOUBLE
               / length(text)::DOUBLE END AS arabic_ratio,
           CASE WHEN length(text) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
               / length(text)::DOUBLE END AS digit_ratio,
           (CASE WHEN length(text) = 0 THEN 0.0 ELSE
               (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE
               / length(text)::DOUBLE END >= 0.5)::BIGINT AS keep_latin
    FROM t
    """,
)
def script_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script composition (round 6, functions/text.py:
    script_profile) — the pre-lang-ID signal corpus filters gate on.
    The synthetic docs are pure ASCII, so the query plants Cyrillic
    on every third doc and CJK on the next third; the oracle runs the
    same per-class character counting in DuckDB (RE2) against Spark's
    Java regex — cross-engine agreement on the unicode ranges is the
    point of the check."""
    from featureform_spark.functions.text import script_profile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" привет мир данные"))
            .when(F.col("doc_id") % 3 == 1, F.lit(" 数据处理流水线"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_profile(docs)


# ---------------------------------------------------------------------------
# DSIR-style hashed-ngram importance weights (data selection)
# ---------------------------------------------------------------------------

_DSIR_B = 256
_DSIR_SCALE = 1_000_000


def _dsir_hex4(col: str) -> str:
    """BIGINT from the first 4 hex chars of md5(col) — the bucket
    hash's portable SQL spelling (16-bit space, unbiased % 256)."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({col}), {j + 1}, 1)) - 1)"
        f" * {16 ** (3 - j)}"
        for j in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def _dsir_oracle() -> str:
    hx = _dsir_hex4("t")
    return f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    bk AS (SELECT doc_id, {hx} % {_DSIR_B} AS bucket FROM tok),
    ttok AS (SELECT unnest({_TOKS}) AS t FROM documents
             WHERE doc_id % 20 = 0),
    tbk AS (SELECT {hx} % {_DSIR_B} AS bucket FROM ttok),
    th AS (SELECT bucket, count(*)::BIGINT AS cnt FROM tbk GROUP BY bucket),
    rh AS (SELECT bucket, count(*)::BIGINT AS cnt FROM bk GROUP BY bucket),
    tot AS (SELECT (SELECT COALESCE(SUM(cnt), 0) FROM th) AS t_total,
                   (SELECT COALESCE(SUM(cnt), 0) FROM rh) AS r_total),
    w AS (SELECT g.bucket,
                 CAST(({_DSIR_SCALE}::HUGEINT
                        * (COALESCE(th.cnt, 0) + 1)
                        * (tot.r_total + {_DSIR_B}))
                      // ((COALESCE(rh.cnt, 0) + 1)
                          * (tot.t_total + {_DSIR_B})) AS BIGINT) AS w
          FROM (SELECT unnest(generate_series(0, {_DSIR_B - 1})) AS bucket) g
          LEFT JOIN th ON th.bucket = g.bucket
          LEFT JOIN rh ON rh.bucket = g.bucket
          CROSS JOIN tot),
    ds AS (SELECT bk.doc_id, SUM(w.w)::BIGINT AS score_fp
           FROM bk JOIN w ON w.bucket = bk.bucket GROUP BY bk.doc_id),
    ntk AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents)
    SELECT n.doc_id, n.n_tokens,
           COALESCE(ds.score_fp, 0)::BIGINT AS score_fp,
           CASE WHEN n.n_tokens > 0
                THEN ds.score_fp::DOUBLE / n.n_tokens END AS dsir_weight
    FROM ntk n LEFT JOIN ds ON ds.doc_id = n.doc_id
    ORDER BY n.doc_id
    """


@query("dsir_selection", _dsir_oracle())
def dsir_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023): hashed-unigram
    bucket distributions of a target slice (docs with doc_id % 20 = 0
    stand in for the domain sample) vs the whole raw corpus, folded
    into per-bucket FIXED-POINT likelihood ratios — integer end-to-end
    (python bigints / HUGEINT in the oracle), so per-doc sums are
    associative and hash-match bit-for-bit. Scoring is ONE zero-shuffle
    codegen projection: the 256-entry weight array rides as a literal
    and every token folds w[bucket(md5(token))] into a long — no join,
    no Python, no shuffle; the only shuffles are the two B-bounded
    histogram aggs. dsir_weight = score/tokens (one final division).
    The paper's Gumbel-top-k resample over these scores is
    functions/dsir.py:dsir_resample (pytest-covered; transcendental,
    so not oracle-paired)."""
    from featureform_spark.functions.dsir import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 20 == 0)
    return dsir_select(target, docs).orderBy("doc_id")


@query("bm25_hybrid_topk")  # rows-only: BM25 idf is ln-based and libm
# ln differs across engines in the last ulp (measured 6/171 idf inputs
# on this box), so scores can't hash-match; the rigorous differential
# is tests/test_bm25.py (DuckDB re-derivation: ranks exact, scores to
# 1e-9) — the sketch_profile convention for transcendental outputs.
def bm25_hybrid_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (round 10): BM25 lexical top-k (Robertson
    scoring, one tokenize projection + hit-scale df agg + codegen
    score + TakeOrderedAndProject — functions/retrieval.py:bm25_topk)
    fused with dense cosine top-k by reciprocal-rank fusion
    (rank-arithmetic only, ranker-output-scale). The sparse+dense
    retrieval stage every RAG/training-data pipeline runs."""
    from pyspark.sql import Window

    from featureform_spark.functions.retrieval import bm25_topk, rrf_fuse
    from featureform_spark.functions.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_topk(docs, ["data", "model", "system"], k=20)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    dense = cosine_topk(emb, qvec, k=20).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("vec_id")))
        .alias("rank"),
    )
    return rrf_fuse([lex, dense], k=10).select(
        "doc_id", "n_rankers", "rank"
    )


# --- hybrid retrieval, hash-exact (r11 verdict #3) -------------------------
# The quality_model convention applied to BM25: the ONLY transcendental
# in the pipeline is idf's ln, so the oracle-paired row runs bm25_topk
# in precomputed-term-weights mode (the production global-idf-snapshot
# pattern) — every remaining op is +,*,/ over exact ints (tf, dl,
# dl_sum/n) and dyadic-rational weight literals shared by both engines,
# making scores, RRF values, and ranks bit-identical. The live-idf
# variant above keeps its 1e-9 differential in tests/test_bm25.py.

_PII_AUG_SQL = (
    "text || ' contact user' || doc_id::VARCHAR || '@ex.example.com "
    "from 10.1.2.' || (doc_id % 200)::VARCHAR || "
    "CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END"
)


def _pii_scan_oracle() -> str:
    from featureform_spark.functions.pii import PII_PATTERNS

    counts = ", ".join(
        f"len(regexp_extract_all(aug, '{PII_PATTERNS[t]}'))::BIGINT "
        f"AS n_{t}"
        for t in sorted(PII_PATTERNS)
    )
    red = "aug"
    for t in sorted(PII_PATTERNS):
        red = (
            f"regexp_replace({red}, '{PII_PATTERNS[t]}', "
            f"'[{t.upper()}]', 'g')"
        )
    return f"""
    WITH a AS (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
    SELECT doc_id, {counts}, {red} AS redacted FROM a
    """


@query("pii_scan", _pii_scan_oracle())
def pii_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan (r11): extends the r7 `pii_redact` row (functions/quality.redact_pii, 3 patterns, redaction only) with the full functions/pii.py family — per-doc type
    counts + redacted text in ONE codegen projection (regexp over
    ASCII-explicit patterns that mean the same thing in Java regex and
    RE2 — hash-compared against DuckDB including the redacted strings).
    The corpus text is deterministically augmented with synthetic PII
    (same expression both engines) so every pattern fires at suite
    scale. Scan-bound at 100 TB — zero shuffles."""
    from featureform_spark.functions.pii import pii_scan

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "text || ' contact user' || CAST(doc_id AS STRING) || "
            "'@ex.example.com from 10.1.2.' || "
            "CAST(doc_id % 200 AS STRING) || "
            "CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' "
            "ELSE '' END"
        ).alias("text"),
    )
    return pii_scan(docs).select(
        "doc_id",
        *[f"n_{t}" for t in ("card", "email", "ipv4", "phone", "ssn")],
        "redacted",
    )


_HYBRID_TERMS = ("data", "model", "system")
_HYBRID_W = {"data": 0.8125, "model": 1.25, "system": 1.5}
_HYBRID_K1, _HYBRID_B = 1.2, 0.75


def _hybrid_exact_oracle(k_each: int = 20, k: int = 10, c: int = 60) -> str:
    # literals via repr() so both engines parse the exact same doubles
    # the Spark expressions fold (k1+1.0 and 1.0-b are computed in
    # Python on the Spark side too)
    k1 = repr(_HYBRID_K1)
    k1p1 = repr(_HYBRID_K1 + 1.0)
    one_m_b = repr(1.0 - _HYBRID_B)
    b = repr(_HYBRID_B)
    tfs = {
        t: f"len(list_filter(terms, x -> x = '{t}'))::DOUBLE"
        for t in _HYBRID_TERMS
    }
    # same fold order as the Spark loop: 0.0 + w_t1*(...) + w_t2*(...)
    contribs = " + ".join(
        f"{repr(_HYBRID_W[t])} * (({tfs[t]} * {k1p1}) / ({tfs[t]} + "
        f"{k1} * ({one_m_b} + ({b} * len(terms)::DOUBLE) / avgdl)))"
        for t in sorted(_HYBRID_TERMS)
    )
    term_list = ", ".join(f"'{t}'" for t in _HYBRID_TERMS)
    dot = _DOT.format(n=_DIM + 1, a="v", b="qv")
    nv = _NORM.format(a="v")
    nq = _NORM.format(a="qv")
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS terms
      FROM documents),
    tk AS (SELECT doc_id, terms FROM toks WHERE terms IS NOT NULL),
    stats AS (SELECT sum(len(terms))::DOUBLE / count(*)::DOUBLE AS avgdl
              FROM tk),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY 0.0 + {contribs} DESC, doc_id)
               AS rank
      FROM tk, stats
      WHERE len(list_intersect(terms, [{term_list}])) > 0
      QUALIFY rank <= {k_each}),
    q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
          FROM embeddings WHERE vec_id = 0),
    den AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY {dot} / ({nv} * {nq}) DESC,
                                vec_id) AS rank
      FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings) e, q
      QUALIFY rank <= {k_each}),
    u AS (SELECT doc_id, 1.0 / ({c} + rank::DOUBLE) AS rr FROM lex
          UNION ALL
          SELECT doc_id, 1.0 / ({c} + rank::DOUBLE) AS rr FROM den),
    f AS (SELECT doc_id, sum(rr) AS rrf, count(*)::BIGINT AS n_rankers
          FROM u GROUP BY doc_id)
    SELECT doc_id, rrf, n_rankers,
           row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
    FROM f ORDER BY rrf DESC, doc_id LIMIT {k}
    """


@query("bm25_hybrid_exact", _hybrid_exact_oracle())
def bm25_hybrid_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-exact hybrid retrieval: BM25 in precomputed-term-weights
    mode (no transcendental anywhere — tf/dl exact ints, avgdl one
    int/int division, dyadic weight literals) fused with exact dense
    cosine top-k by reciprocal-rank fusion. Scores AND rrf values
    hash-compare against the DuckDB oracle; the live-idf variant
    (bm25_hybrid_topk) keeps its 1e-9 ln differential in pytest."""
    from pyspark.sql import Window

    from featureform_spark.functions.retrieval import bm25_topk, rrf_fuse
    from featureform_spark.functions.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_topk(
        docs,
        list(_HYBRID_TERMS),
        k=20,
        k1=_HYBRID_K1,
        b=_HYBRID_B,
        term_weights=_HYBRID_W,
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0).select("embedding")
    dense = cosine_topk(emb, qdf, k=20).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("vec_id")))
        .alias("rank"),
    )
    return rrf_fuse([lex, dense], k=10).select(
        "doc_id", "rrf", "n_rankers", "rank"
    )


@query(
    "temperature_mix_half",
    """
    WITH c AS (SELECT source, count(*)::HUGEINT AS n
               FROM documents GROUP BY source),
    w AS (SELECT source, n,
                 FLOOR(sqrt(n::DOUBLE) * 1048576)::HUGEINT AS w
          FROM c WHERE n > 0),
    tw AS (SELECT SUM(w)::HUGEINT AS wt FROM w),
    k AS (SELECT MIN(n * tw.wt // w.w) AS k FROM w, tw),
    thr AS (SELECT source,
                   4294967296::HUGEINT * w * k.k // (tw.wt * n) AS t
            FROM w, k, tw)
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr ON d.source = thr.source
    WHERE CAST(('0x' || substr(md5(d.doc_id::VARCHAR || '#42'), 1, 8))
               AS BIGINT) < thr.t
    """,
)
def temperature_mix_half_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture downsampling (round 10): target
    shares ∝ n_s^0.5 — the multilingual/multi-domain temperature knob
    (alpha < 1 upsamples small domains relative to raw share). Integer
    weights are floor(sqrt(n) * 2^20): sqrt and multiply are CORRECTLY
    ROUNDED per IEEE-754, so Python/JVM/DuckDB derive bit-identical
    weights from the same counts (general pow is libm — refused, same
    policy as BM25's ln note); from there the exact-integer threshold
    machinery of corpus_mix makes the selected set a pure function of
    (key, seed, counts) any engine reproduces. One tiny per-source
    count + two broadcast joins; the corpus-scale path is one
    scan + filter."""
    from featureform_spark.operators.mixing import temperature_mix

    return temperature_mix(
        load_table(spark, sf_dir, "documents"),
        "source",
        ["doc_id"],
        alpha=0.5,
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# round 12: embedding-space drift + per-source dedup scorecard
# ---------------------------------------------------------------------------


def _embedding_drift_oracle(num_planes: int = 8) -> str:
    signs = hyperplane_signs(num_planes, _DIM)
    bits = []
    for p in range(num_planes):
        arr = "[" + ", ".join(f"{s:.1f}" for s in signs[p]) + "]"
        proj = _DOT.format(n=_DIM + 1, a="v", b=f"{arr}")
        bits.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    concat = " || ".join(bits)
    return f"""
    WITH b AS (
      SELECT vec_id % 2 AS side, {concat} AS bucket
      FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings) e),
    r AS (SELECT bucket, count(*) AS n FROM b WHERE side = 0 GROUP BY 1),
    c AS (SELECT bucket, count(*) AS n FROM b WHERE side = 1 GROUP BY 1)
    SELECT COALESCE(r.bucket, c.bucket) AS bucket,
           COALESCE(r.n, 0) AS ref_count,
           COALESCE(c.n, 0) AS cur_count
    FROM r FULL OUTER JOIN c ON r.bucket = c.bucket
    """


@query("embedding_drift_buckets", _embedding_drift_oracle())
def embedding_drift_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor (r12): reference vs current
    histogram over md5-seeded hyperplane SIGN buckets — the vector
    twin of feature_drift_bins (a broken encoder / domain shift /
    renormalization upstream moves mass between sign buckets where a
    scalar monitor sees nothing). Projections are fixed-order IEEE
    folds via the Arrow bucket kernel (bit-identical to the DuckDB
    fold — the ANN oracle convention), counts exact integers; the PSI
    fold stays driver-side (drift_report_embedding, pytest-pinned).
    Scale: scan + Arrow kernel + ONE partial-agg groupBy per frame;
    the compare join runs at 2^8 = 256-bucket cardinality."""
    from featureform_spark.functions.drift import embedding_compare

    emb = load_table(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    return embedding_compare(ref, cur, "embedding", dim=_DIM, num_planes=8)


@query(
    "dedup_report_by_source",
    """
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id, text, 'resampled' FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id, text, source FROM documents WHERE doc_id % 11 = 0),
    d AS (SELECT CASE WHEN text IS NULL THEN '__null__'
                      ELSE md5(lower(trim(text))) END AS fingerprint,
                 source
          FROM corpus),
    ps AS (SELECT fingerprint, source, count(*) AS n_here
           FROM d GROUP BY 1, 2),
    t AS (SELECT fingerprint, SUM(n_here) AS n_total,
                 count(*) AS n_sources
          FROM ps GROUP BY 1),
    j AS (SELECT ps.source, ps.n_here, t.n_total, t.n_sources
          FROM ps JOIN t USING (fingerprint))
    SELECT source,
           CAST(SUM(n_here) AS BIGINT) AS n_docs,
           count(*) AS n_unique_texts,
           CAST(SUM(CASE WHEN n_total > 1 THEN n_here ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(SUM(CASE WHEN n_sources > 1 THEN n_here ELSE 0 END)
                AS BIGINT) AS n_cross_source_dup,
           CAST(SUM(CASE WHEN n_total > 1 THEN n_here ELSE 0 END)
                AS DOUBLE) / CAST(SUM(n_here) AS DOUBLE) AS dup_rate
    FROM j GROUP BY source
    """,
)
def dedup_report_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication/contamination scorecard (r12): the
    rollup a curation pass reads before deciding which sources to
    dedup, down-weight, or drop — n_dup_docs counts docs whose exact
    fingerprint repeats corpus-WIDE, n_cross_source_dup those whose
    fingerprint also appears under a DIFFERENT source (content that
    double-weights when sources are mixed with per-source
    temperatures). The testdata corpus is dup-free, so the row
    synthesizes a deterministic overlap both engines mirror: every
    7th doc re-appears under source 'resampled' (cross-source dup),
    every 11th repeats within its own source. Scale: partial-agg
    groupBys + one join at fingerprint cardinality — no corpus
    window, no self-join on docs."""
    from featureform_spark.functions.dedup import dedup_report_by_source

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "source", F.lit("resampled")
        )
    ).unionByName(docs.filter(F.col("doc_id") % 11 == 0))
    return dedup_report_by_source(corpus)
