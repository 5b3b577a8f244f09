"""Trained model-based document quality scoring.

The rule-based signals in ``quality.py`` (length/punct/stopword
ratios, Gopher repetition rules) are stage one of a real pipeline;
stage two in public recipes (DCLM, FineWeb-Edu) is a TRAINED quality
classifier scored over the whole corpus. This module trains a logistic
regression on in-repo fixture documents (good prose vs boilerplate/
spam, written for this repo) over four deterministic text features,
and scores documents entirely JVM-side: the quantized weights enter
the plan as literals and the logit is a fixed-order dot product — no
Python per row, no shuffle, a narrow projection over one scan.

Cross-engine determinism: every feature is a ratio/min of IEEE double
ops both engines execute identically; the logit multiplies
6dp-quantized weight literals in a fixed expression order, so Spark
and DuckDB produce bit-identical doubles — the oracle hash-matches
with no tolerance and no rounding. The sigmoid is deliberately NOT
materialized (libm ``exp`` may differ in the last ulp across
engines); the logit is monotone in it, and ``keep = logit > 0`` is the
decision boundary either way.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in", "it")

# fixture training documents (ordinary sample text written for this
# repo): label 1 = keep-worthy prose, label 0 = boilerplate/spam
GOOD_DOCS: tuple[str, ...] = (
    "the history of the old town is written in its narrow streets and "
    "the stories people tell about the market square where traders "
    "met every spring to exchange goods and news from distant places",
    "when the first frost arrives the garden changes its character "
    "and the late flowers give way to bare branches that hold a "
    "different kind of beauty in the low light of a winter afternoon",
    "a good experiment begins with a clear question and a plan for "
    "what evidence would change your mind because without that plan "
    "it is easy to see only what you expected to see",
    "the river carries more than water it carries the soil of the "
    "hills and the memory of every rain that fell in the valley "
    "during the long quiet months of the year",
    "reading a difficult book slowly is often faster than reading it "
    "quickly because the ideas settle in order and each chapter "
    "builds on what the last one actually taught you",
    "the committee reviewed the proposal in detail and concluded that "
    "the budget was reasonable but the timeline needed another month "
    "to account for the testing phase and the final report",
    "it is worth learning how bread rises because the same patience "
    "that waits for dough teaches you to wait for other things that "
    "cannot be hurried no matter how much you want them finished",
    "the observatory sits above the clouds for a simple reason the "
    "air is steadier there and the faint light of distant stars "
    "survives the journey to the telescope almost untouched",
)

BAD_DOCS: tuple[str, ...] = (
    "click here click here click here buy now buy now best price "
    "best price best price click here buy now",
    "win win win free free free win free win free win free win free "
    "win free win free win free",
    "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
    "home | about | contact | privacy | terms | sitemap | home | "
    "about | contact | privacy | terms",
    "lorem lorem lorem lorem lorem lorem lorem lorem lorem lorem "
    "lorem lorem lorem lorem",
    "subscribe subscribe subscribe like share subscribe like share "
    "subscribe like share like share",
    "x1 x2 x3 x4 x5 x6 x7 x8",
    "cheap cheap cheap deal deal deal sale sale sale now now now "
    "cheap deal sale now cheap deal",
)


def _py_features(text: str) -> list[float]:
    """Pure-python twin of :func:`_feature_exprs` — identical IEEE ops
    in the identical order, used only at train time."""
    toks = [t for t in text.split(" ") if t != ""]
    n = float(len(toks))
    if n == 0.0:
        return [0.0, 0.0, 0.0, 0.0]
    distinct_ratio = float(len(set(toks))) / n
    stop_ratio = float(sum(1 for t in toks if t in STOPWORDS)) / n
    len_norm = min(n / 50.0, 1.0)
    avg_tok = (float(sum(len(t) for t in toks)) / n) / 10.0
    avg_norm = min(avg_tok, 1.0)
    return [len_norm, distinct_ratio, stop_ratio, avg_norm]


def train_quality_model(
    good: tuple[str, ...] = GOOD_DOCS,
    bad: tuple[str, ...] = BAD_DOCS,
    iters: int = 500,
    lr: float = 0.5,
) -> dict:
    """Batch-gradient logistic regression on the fixture docs; fixed
    iteration count and learning rate, weights quantized to 6 decimals.
    Tiny and driver-side by design — the DISTRIBUTED part is scoring."""
    rows = [(_py_features(t), 1.0) for t in good] + [
        (_py_features(t), 0.0) for t in bad
    ]
    k = 4
    w = [0.0] * k
    b = 0.0
    m = float(len(rows))
    for _ in range(iters):
        gw = [0.0] * k
        gb = 0.0
        for x, y in rows:
            z = b + sum(wi * xi for wi, xi in zip(w, x))
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - y
            for i in range(k):
                gw[i] += d * x[i]
            gb += d
        for i in range(k):
            w[i] -= lr * gw[i] / m
        b -= lr * gb / m
    return {
        "w": [round(x, 6) for x in w],
        "b": round(b, 6),
        "features": ["len_norm", "distinct_ratio", "stop_ratio", "avg_norm"],
    }


def _feature_exprs(text_col: str) -> list[Column]:
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / n
    )
    len_norm = F.least(n / F.lit(50.0), F.lit(1.0))
    avg_tok = (
        F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, t: acc + F.length(t).cast("double"),
        )
        / n
    ) / F.lit(10.0)
    avg_norm = F.least(avg_tok, F.lit(1.0))
    zero = F.lit(0.0)
    empty = n == 0
    return [
        F.when(empty, zero).otherwise(e)
        for e in (len_norm, distinct_ratio, stop_ratio, avg_norm)
    ]


def quality_logit_expr(text_col: str, model: dict | None = None) -> Column:
    """Expression-form scorer: the raw ``w·x + b`` logit as a single
    Column over ``text_col``. Lets pipelines compose quality scoring
    into an existing projection — one corpus scan, zero joins — instead
    of materializing a doc_id set and joining it back. Bit-exact across
    engines (see module docstring)."""
    model = model or train_quality_model()
    feats = _feature_exprs(text_col)
    logit: Column = F.lit(float(model["b"]))
    for wi, fe in zip(model["w"], feats):
        logit = logit + F.lit(float(wi)) * fe
    return logit


def quality_keep_expr(text_col: str, model: dict | None = None) -> Column:
    """Expression-form decision: ``logit > 0`` as a Column, for
    single-pass ``select(..., keep_expr).filter(...)`` composition."""
    return quality_logit_expr(text_col, model) > 0


def quality_model_score(
    df: DataFrame,
    model: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the trained classifier.

    Returns ``[id_col, quality_logit, keep]`` — ``quality_logit`` is
    the raw ``w·x + b`` (monotone in the class probability; bit-exact
    across engines), ``keep`` its sign. One narrow projection: no
    Python, no shuffle, no join.
    """
    model = model or train_quality_model()
    logit = quality_logit_expr(text_col, model)
    return df.select(
        F.col(id_col),
        logit.alias("quality_logit"),
        (logit > 0).alias("keep"),
    )
