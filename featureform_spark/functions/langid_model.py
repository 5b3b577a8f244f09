"""Trained character-n-gram Naive Bayes language ID.

The marker-word heuristic in ``text.language_id`` is the fast path the
reference-style pipelines start with; real corpus pipelines (CCNet and
successors) use a trained character-n-gram classifier (fastText's
langid is the public standard). This module trains a multinomial
Naive Bayes over character trigrams on in-repo fixture paragraphs —
public-knowledge sample sentences written for this repo — and scores
documents two interchangeable ways (bit-identical results, asserted):
the DEFAULT is an Arrow kernel that folds dict-looked-up quantized
log-probs over the JVM-normalized text (~2x faster than the
interpreted HOF evaluator); ``kernel=False`` keeps the all-JVM
specification path — a constant-folded map literal ``trigram ->
array<double>`` and one ``aggregate`` fold per document, no Python per
row. Neither path shuffles — scoring is a narrow projection.

Determinism / cross-engine parity: every model weight is rounded to 6
decimals at train time, and both engines fold the SAME quantized
doubles over the SAME trigram sequence left-to-right (Spark
``aggregate``, DuckDB ``list_reduce``), so the sums are bit-identical
IEEE doubles — the oracle hash-matches without tolerance.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, functions as F

from featureform_spark.functions.parallel import fan_out_if_underparallel

# Training fixtures: a short paragraph per language, written for this
# repo (ordinary sample prose; no external corpus). Held-out evaluation
# sentences live in tests/test_llm_ops.py.
LANG_FIXTURES: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs into the "
        "forest where it finds a quiet river with clear water "
        "every morning the children walk to school along the old road "
        "and they talk about the books they are reading this week "
        "when the weather is good people like to sit outside in the "
        "garden and drink tea while the sun goes down behind the hills "
        "history shows that small ideas can change the world if someone "
        "is willing to work hard and share what they have learned"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y corre "
        "hacia el bosque donde encuentra un rio tranquilo con agua clara "
        "cada manana los ninos caminan a la escuela por el viejo camino "
        "y hablan de los libros que estan leyendo esta semana "
        "cuando hace buen tiempo a la gente le gusta sentarse fuera en "
        "el jardin y tomar te mientras el sol se pone detras de las colinas "
        "la historia muestra que las ideas pequenas pueden cambiar el "
        "mundo si alguien esta dispuesto a trabajar duro y compartir lo "
        "que ha aprendido"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et "
        "court vers la foret ou il trouve une riviere calme avec une eau claire "
        "chaque matin les enfants marchent vers l ecole le long de la "
        "vieille route et ils parlent des livres qu ils lisent cette semaine "
        "quand il fait beau les gens aiment s asseoir dehors dans le "
        "jardin et boire du the pendant que le soleil se couche derriere les collines "
        "l histoire montre que de petites idees peuvent changer le monde "
        "si quelqu un est pret a travailler dur et a partager ce qu il a appris"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und "
        "laeuft in den wald wo er einen ruhigen fluss mit klarem wasser findet "
        "jeden morgen gehen die kinder die alte strasse entlang zur "
        "schule und sie sprechen ueber die buecher die sie diese woche lesen "
        "wenn das wetter gut ist sitzen die leute gern draussen im "
        "garten und trinken tee waehrend die sonne hinter den huegeln untergeht "
        "die geschichte zeigt dass kleine ideen die welt veraendern "
        "koennen wenn jemand bereit ist hart zu arbeiten und zu teilen "
        "was er gelernt hat"
    ),
    "it": (
        "la rapida volpe marrone salta sopra il cane pigro e corre verso "
        "il bosco dove trova un fiume tranquillo con acqua chiara "
        "ogni mattina i bambini camminano verso la scuola lungo la "
        "vecchia strada e parlano dei libri che stanno leggendo questa settimana "
        "quando il tempo e bello alla gente piace sedersi fuori in "
        "giardino e bere il te mentre il sole tramonta dietro le colline "
        "la storia mostra che le piccole idee possono cambiare il mondo "
        "se qualcuno e disposto a lavorare sodo e a condividere cio che "
        "ha imparato"
    ),
    "pt": (
        "a rapida raposa marrom salta sobre o cao preguicoso e corre "
        "para a floresta onde encontra um rio tranquilo com agua clara "
        "cada manha as criancas caminham para a escola pelo velho "
        "caminho e falam dos livros que estao lendo esta semana "
        "quando o tempo esta bom as pessoas gostam de sentar do lado de "
        "fora no jardim e tomar cha enquanto o sol se poe atras das colinas "
        "a historia mostra que pequenas ideias podem mudar o mundo se "
        "alguem estiver disposto a trabalhar duro e compartilhar o que "
        "aprendeu"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en rent het bos "
        "in waar hij een rustige rivier met helder water vindt "
        "elke ochtend lopen de kinderen langs de oude weg naar school "
        "en ze praten over de boeken die ze deze week lezen "
        "als het weer goed is zitten de mensen graag buiten in de tuin "
        "en drinken thee terwijl de zon achter de heuvels ondergaat "
        "de geschiedenis laat zien dat kleine ideeen de wereld kunnen "
        "veranderen als iemand bereid is hard te werken en te delen wat "
        "hij heeft geleerd"
    ),
    "sv": (
        "den snabba bruna raven hoppar over den lata hunden och springer "
        "in i skogen dar den hittar en lugn flod med klart vatten "
        "varje morgon gar barnen langs den gamla vagen till skolan och "
        "de pratar om bockerna som de laser den har veckan "
        "nar vadret ar bra tycker folk om att sitta ute i tradgarden "
        "och dricka te medan solen gar ner bakom kullarna "
        "historien visar att sma ideer kan forandra varlden om nagon ar "
        "villig att arbeta hart och dela med sig av det han har lart sig"
    ),
    "da": (
        "den hurtige brune raev springer over den dovne hund og lober "
        "ind i skoven hvor den finder en rolig flod med klart vand "
        "hver morgen gaar bornene langs den gamle vej til skolen og de "
        "taler om de boger som de laeser i denne uge "
        "naar vejret er godt kan folk lide at sidde udenfor i haven og "
        "drikke te mens solen gaar ned bag bakkerne "
        "historien viser at smaa ideer kan aendre verden hvis nogen er "
        "villig til at arbejde haardt og dele hvad de har laert"
    ),
    "fi": (
        "nopea ruskea kettu hyppaa laiskan koiran yli ja juoksee "
        "metsaan josta se loytaa rauhallisen joen jossa on kirkasta vetta "
        "joka aamu lapset kavelevat vanhaa tieta pitkin kouluun ja he "
        "puhuvat kirjoista joita he lukevat talla viikolla "
        "kun saa on hyva ihmiset istuvat mielellaan ulkona puutarhassa "
        "ja juovat teeta kun aurinko laskee kukkuloiden taakse "
        "historia osoittaa etta pienet ajatukset voivat muuttaa maailmaa "
        "jos joku on valmis tekemaan kovasti toita ja jakamaan sen minka "
        "on oppinut"
    ),
    "pl": (
        "szybki brazowy lis skacze nad leniwym psem i biegnie do lasu "
        "gdzie znajduje spokojna rzeke z czysta woda "
        "kazdego ranka dzieci ida stara droga do szkoly i rozmawiaja o "
        "ksiazkach ktore czytaja w tym tygodniu "
        "kiedy pogoda jest dobra ludzie lubia siedziec na zewnatrz w "
        "ogrodzie i pic herbate podczas gdy slonce zachodzi za wzgorzami "
        "historia pokazuje ze male pomysly moga zmienic swiat jesli ktos "
        "jest gotow ciezko pracowac i dzielic sie tym czego sie nauczyl"
    ),
    "tr": (
        "hizli kahverengi tilki tembel kopegin uzerinden atlar ve ormana "
        "kosar orada temiz sulu sakin bir nehir bulur "
        "her sabah cocuklar eski yol boyunca okula yurur ve bu hafta "
        "okuduklari kitaplar hakkinda konusurlar "
        "hava guzel oldugunda insanlar bahcede disarida oturmayi ve "
        "gunes tepelerin arkasinda batarken cay icmeyi severler "
        "tarih gosterir ki kucuk fikirler dunyayi degistirebilir eger "
        "birisi cok calismaya ve ogrendiklerini paylasmaya istekliyse"
    ),
    "ro": (
        "vulpea maro rapida sare peste cainele lenes si alearga in "
        "padure unde gaseste un rau linistit cu apa limpede "
        "in fiecare dimineata copiii merg la scoala pe drumul vechi si "
        "vorbesc despre cartile pe care le citesc saptamana aceasta "
        "cand vremea este buna oamenilor le place sa stea afara in "
        "gradina si sa bea ceai in timp ce soarele apune in spatele dealurilor "
        "istoria arata ca ideile mici pot schimba lumea daca cineva este "
        "dispus sa munceasca din greu si sa imparta ceea ce a invatat"
    ),
    "ca": (
        "la rapida guineu marro salta sobre el gos mandros i corre cap "
        "al bosc on troba un riu tranquil amb aigua clara "
        "cada mati els nens caminen cap a l escola pel vell cami i "
        "parlen dels llibres que estan llegint aquesta setmana "
        "quan fa bon temps a la gent li agrada seure fora al jardi i "
        "prendre te mentre el sol es pon darrere els turons "
        "la historia mostra que les petites idees poden canviar el mon "
        "si algu esta disposat a treballar dur i compartir el que ha apres"
    ),
    "id": (
        "rubah coklat yang cepat melompati anjing malas dan berlari ke "
        "hutan di mana ia menemukan sungai yang tenang dengan air jernih "
        "setiap pagi anak anak berjalan ke sekolah di sepanjang jalan "
        "tua dan mereka berbicara tentang buku yang sedang mereka baca "
        "minggu ini ketika cuaca bagus orang orang suka duduk di luar di "
        "kebun dan minum teh sementara matahari terbenam di balik bukit "
        "sejarah menunjukkan bahwa gagasan kecil dapat mengubah dunia "
        "jika seseorang bersedia bekerja keras dan berbagi apa yang "
        "telah dipelajari"
    ),
}


def _normalize(text: str) -> str:
    return " " + re.sub(r"\s+", " ", text.lower()).strip() + " "


def _char_ngrams(text: str, n: int) -> list[str]:
    s = _normalize(text)
    if len(s) < n:
        return []
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def train_char_ngram_nb(
    fixtures: dict[str, str] | None = None,
    n: int = 3,
    top_k: int = 300,
) -> dict:
    """Train the multinomial NB model: per-language trigram counts with
    Laplace smoothing; keep the union of each language's ``top_k`` most
    frequent trigrams; everything else scores the per-language floor
    ``log(1 / (total + V))``. All weights rounded to 6 decimals so
    cross-engine fold sums are bit-identical.

    Returns ``{"n", "langs", "prior", "floor", "logp"}`` where ``logp``
    maps trigram -> [logp per lang, in ``langs`` order].
    """
    fixtures = fixtures or LANG_FIXTURES
    langs = sorted(fixtures)
    counts: dict[str, dict[str, int]] = {}
    totals: dict[str, int] = {}
    vocab: set[str] = set()
    for lang in langs:
        c: dict[str, int] = {}
        grams = _char_ngrams(fixtures[lang], n)
        for g in grams:
            c[g] = c.get(g, 0) + 1
        counts[lang] = c
        totals[lang] = len(grams)
        vocab.update(c)
    V = len(vocab)
    kept: set[str] = set()
    for lang in langs:
        top = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))
        kept.update(g for g, _ in top[:top_k])
    floor = {
        lang: round(math.log(1.0 / (totals[lang] + V)), 6) for lang in langs
    }
    logp = {
        g: [
            round(
                math.log((counts[lang].get(g, 0) + 1.0) / (totals[lang] + V)),
                6,
            )
            for lang in langs
        ]
        for g in sorted(kept)
    }
    prior = {lang: round(math.log(1.0 / len(langs)), 6) for lang in langs}
    return {
        "n": n,
        "langs": langs,
        "prior": prior,
        "floor": floor,
        "logp": logp,
    }


def _padded_expr(text_col: str) -> Column:
    """The ONE normalization expression both scoring paths (and nt
    accounting) share — lowercase, whitespace-collapse, space-pad.
    Bit-identity between the kernel, the HOF fold, and the oracle
    depends on this being defined exactly once."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
        F.lit(" "),
    )


def _trigrams_expr(text_col: str, n: int) -> Column:
    """Codegen trigram sequence over the normalized, space-padded text;
    empty array when the padded text is shorter than ``n`` (guards
    Spark's descending ``sequence(1, 0)``)."""
    padded = _padded_expr(text_col)
    ln = F.length(padded)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - (n - 1)),
            lambda i: padded.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _nb_scores_pandas(model: dict):
    """pandas_udf over the JVM-normalized padded string: fold the SAME
    6dp-quantized log-probs in the SAME left-to-right, per-element
    order as the ``aggregate``/``zip_with`` expression — IEEE adds in
    identical sequence, so the sums match the interpreted fold (and
    the DuckDB oracle) to the last ulp. The padded string is produced
    by the same JVM expression both paths share, so there is no
    Python-vs-Java lower()/regex divergence to worry about.

    ~15x faster than the interpreted HOF fold: dict lookups replace
    the map-literal linear scans and no per-trigram Catalyst lambda
    dispatch happens. The per-document fold is ONE ``np.cumsum`` over
    the looked-up rows (prefix sums are inherently sequential —
    element k is element k-1 plus row k — so the final row is the
    exact left-to-right IEEE fold the HOF expression and the DuckDB
    ``list_reduce`` compute, to the last ulp; asserted in
    test_langid_kernel_bit_identical), which matters at 15 languages:
    the per-trigram Python tuple-add was 15 float adds + a tuple
    allocation per trigram, the cumsum is one C pass per document.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    n = model["n"]
    langs = model["langs"]
    prior = tuple(float(model["prior"][lang]) for lang in langs)
    floor = tuple(float(model["floor"][lang]) for lang in langs)
    logp = {g: tuple(float(x) for x in lps) for g, lps in model["logp"].items()}

    # numeric trigram codes for vectorized lookup: ord() < 0x110000 <
    # 2^21, so a*2^42 + b*2^21 + c is a unique int64 per n-gram. The
    # model's rows sit in a table indexed by searchsorted over the
    # sorted code array; unknown n-grams hit the floor row (last).
    # The per-document fold stays the SAME np.cumsum over the SAME
    # rows in the same order — only the per-trigram python slicing +
    # dict get is replaced by C-speed array ops (bit-identical,
    # asserted in test_langid_kernel_bit_identical).
    assert n == 3, "vectorized scorer assumes trigrams"
    _codes = np.array(
        sorted(
            (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2])
            for g in logp
        ),
        dtype=np.int64,
    )
    _by_code = {
        (ord(g[0]) << 42) | (ord(g[1]) << 21) | ord(g[2]): lps
        for g, lps in logp.items()
    }
    _table = np.array(
        [_by_code[c] for c in _codes.tolist()] + [floor],
        dtype=np.float64,
    )
    _prior_row = np.array([prior], dtype=np.float64)
    _floor_idx = len(_codes)

    def _score(padded):
        out = []
        for s in padded:
            if s is None or len(s) < n:
                out.append(list(prior))
                continue
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            tri = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
            if _floor_idx == 0:  # empty model vocab: every n-gram floors
                idx = np.zeros(len(tri), dtype=np.int64)
            else:
                pos = np.searchsorted(_codes, tri)
                pos_c = np.minimum(pos, _floor_idx - 1)
                idx = np.where(
                    (pos < _floor_idx) & (_codes[pos_c] == tri),
                    pos_c,
                    _floor_idx,
                )
            rows = np.concatenate([_prior_row, _table[idx]], axis=0)
            out.append(np.cumsum(rows, axis=0)[-1].tolist())
        return pd.Series(out)

    _score.__annotations__ = {"padded": pd.Series, "return": pd.Series}
    return pandas_udf(_score, "array<double>")


def _margin_pred(
    scores: Column,
    nt: Column,
    pred: Column,
    unknown_margin: float,
    n_langs: int,
) -> Column:
    """The ONE unknown-margin rule both predictors share (same
    single-definition discipline as ``_padded_expr``): when the
    best-vs-runner-up per-trigram log-odds gap falls below the margin,
    predict 'und' instead of a coin-flip winner. Sorted fold-sums are
    bit-identical cross-engine, so the best-minus-second subtraction
    and the margin*nt product compare identically in both engines —
    the rule is oracle-safe."""
    if unknown_margin <= 0.0 or n_langs < 2:
        return pred
    srt = F.array_sort(scores)
    return F.when(
        F.element_at(srt, -1) - F.element_at(srt, -2)
        < F.lit(float(unknown_margin)) * nt,
        F.lit("und"),
    ).otherwise(pred)


def lang_id_model(
    df: DataFrame,
    model: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    kernel: bool = True,
    unknown_margin: float = 0.0,
) -> DataFrame:
    """Score every document against the NB model JVM-side.

    The weight table enters the plan as a constant-foldable
    ``create_map`` literal (trigram -> array<double>); the score is one
    ``aggregate`` fold over the trigram sequence accumulating the
    per-language log-prob array via ``zip_with``; argmax is
    ``array_position(scores, array_max(scores))`` — first language in
    sorted order wins exact ties, same rule both engines. Documents
    with no trigrams predict 'und' with score 0.

    Returns ``[id_col, lang_pred, nb_score]`` (score rounded to 6dp —
    weights are 6dp-quantized, so both engines' left folds agree
    bit-for-bit and the rounding is grid-exact).

    ``unknown_margin`` is the explicit unknown class real routers
    carry: when the PER-TRIGRAM log-odds between the best and
    runner-up language falls below it — ``best - second <
    margin * nt`` — the document predicts 'und' instead of a coin-flip
    winner (token salad, code, unmodeled languages). 0.0 (default)
    disables the rule; ``nb_score`` stays the best-language score
    either way, so the margin is auditable downstream.
    """
    model = model or train_char_ngram_nb()
    # per-row scoring is CPU-bound (~3 ms/doc of map lookups): fan out
    # cheap raw text when the scan is under-parallel (plan-side
    # inputFiles probe — no df.rdd conversion).
    df = fan_out_if_underparallel(df)
    langs = model["langs"]
    n = model["n"]
    if kernel:
        # Arrow path (default): the kernel receives the JVM-normalized
        # padded string (same _padded_expr the HOF path uses) and folds
        # dict-looked-up quantized log-probs in the exact fold order —
        # bit-identical to the HOF expression (asserted in
        # test_llm_ops.py::test_langid_kernel_bit_identical).
        # nt = |padded| - (n-1) equals size(trigrams) by construction.
        padded = _padded_expr(text_col)
        ln = F.length(padded)
        scored = df.select(
            F.col(id_col),
            _nb_scores_pandas(model)(padded).alias("__x_s"),
            F.when(ln >= n, ln - (n - 1))
            .otherwise(F.lit(0))
            .alias("__x_nt"),
        )
        scores = F.col("__x_s")
        nt = F.col("__x_nt")
    else:
        prior0 = F.array(
            *[F.lit(float(model["prior"][lang])) for lang in langs]
        )
        floors = F.array(
            *[F.lit(float(model["floor"][lang])) for lang in langs]
        )
        # TWO-LEVEL map literal (first char -> sub-map of trigrams):
        # GetMapValue on a map literal is a LINEAR key scan, so a flat
        # ~1000-entry map costs ~500 string compares per lookup — measured
        # 24 s over sf0.1; bucketing by first char cuts it to ~30 (1.6 s).
        by_first: dict[str, list] = {}
        for g, lps in model["logp"].items():
            by_first.setdefault(g[0], []).append((g, lps))
        outer_args: list[Column] = []
        for c in sorted(by_first):
            sub_args: list[Column] = []
            for g, lps in by_first[c]:
                sub_args.append(F.lit(g))
                sub_args.append(F.array(*[F.lit(float(x)) for x in lps]))
            outer_args.append(F.lit(c))
            outer_args.append(F.create_map(*sub_args))
        table = F.create_map(*outer_args)
        tris = _trigrams_expr(text_col, n)
        fold = F.aggregate(
            F.col("__tris"),
            prior0,
            lambda acc, t: F.zip_with(
                acc,
                F.coalesce(
                    F.try_element_at(
                        F.try_element_at(table, t.substr(1, 1)), t
                    ),
                    floors,
                ),
                lambda a, b: a + b,
            ),
        )
        # Generate barrier: higher-order folds run INTERPRETED (no
        # whole-stage codegen, no subexpression elimination), and predicate
        # pushdown substitutes projection expressions into filters — a
        # downstream filter on lang_pred would re-evaluate the entire fold
        # per reference (measured 38 s vs 4 s at sf0.1 for
        # filter(lang_pred == 'en')). explode(array(struct(...))) emits
        # exactly one row per row but is a Generate node: the fold
        # evaluates ONCE and filters/projections stay above it.
        scored = df.select(F.col(id_col), tris.alias("__tris")).select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.struct(
                        fold.alias("s"),
                        F.size("__tris").alias("nt"),
                    )
                )
            ).alias("__x"),
        )
        scored = scored.select(
            F.col(id_col),
            F.col("__x.s").alias("__x_s"),
            F.col("__x.nt").alias("__x_nt"),
        )
        scores = F.col("__x_s")
        nt = F.col("__x_nt")
    idx = F.array_position(scores, F.array_max(scores))
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    pred = _margin_pred(
        scores,
        nt,
        F.element_at(lang_arr, idx.cast("int")),
        unknown_margin,
        len(langs),
    )
    return scored.select(
        F.col(id_col),
        F.when(nt == 0, F.lit("und")).otherwise(pred).alias("lang_pred"),
        F.when(nt == 0, F.lit(0.0))
        .otherwise(F.round(F.element_at(scores, idx.cast("int")), 6))
        .alias("nb_score"),
    )


def lang_pred_expr(
    text_col: str,
    model: dict | None = None,
    unknown_margin: float = 0.0,
) -> Column:
    """Expression-form predictor: the argmax language as a single
    Column over ``text_col``, for single-pass composition
    (``select(..., lang_pred_expr(...)).filter(...)``) — one corpus
    scan, zero doc_id joins.

    Uses the Arrow kernel over the JVM-normalized padded string (the
    same ``_padded_expr`` every scoring path shares), so predictions
    are bit-identical to :func:`lang_id_model`. The kernel appears
    twice in the expression tree (``array_position`` + its
    ``array_max`` probe) but Spark's Python-UDF extraction
    deduplicates identical deterministic calls into ONE
    ArrowEvalPython evaluation — asserted in the suite's plan test.
    """
    model = model or train_char_ngram_nb()
    langs = model["langs"]
    n = model["n"]
    padded = _padded_expr(text_col)
    ln = F.length(padded)
    scores = _nb_scores_pandas(model)(padded)
    nt = F.when(ln >= n, ln - (n - 1)).otherwise(F.lit(0))
    idx = F.array_position(scores, F.array_max(scores))
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    pred = _margin_pred(
        scores,
        nt,
        F.element_at(lang_arr, idx.cast("int")),
        unknown_margin,
        len(langs),
    )
    return F.when(nt == 0, F.lit("und")).otherwise(pred)
