"""Byte-pair-encoding tokenizer trained ON the corpus.

``text.token_counts`` approximates a subword tokenizer with a regex;
real pipelines fit one (Sennrich et al. 2016 BPE — the GPT-2/Llama
family's scheme) on the corpus itself. The classic algorithm is
two-phase, and the phases have very different scales:

1. **Word histogram** — corpus-sized, so it runs DISTRIBUTED: one
   partial-agg ``groupBy(word)`` over the token stream. Even at 100 TB
   the distinct-word table is millions of rows.
2. **Merge loop** — operates ONLY on the histogram (pair counts are
   weighted by word frequency, never by rescanning the corpus), so it
   runs driver-side exactly as the published algorithm does, with
   deterministic tie-breaks (max count, then lexicographic pair).

``bpe_encode`` then applies the learned merge ranks corpus-wide in an
Arrow-batched ``mapInPandas`` (per-word merge application is
inherently sequential — the canonical slow path, kept off the hot
metrics by the vectorized batch transfer and a per-batch word cache:
encode cost is per DISTINCT word per batch, not per occurrence).

Determinism: the histogram is exact, the merge loop's tie-break is
total, and encoding is a pure function of (word, ranks) — distributed
training is asserted equal to a pure-python reference implementation
in tests.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"  # end-of-word marker (Sennrich et al. 2016)


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    top_words: int | None = 1_000_000,
) -> list[tuple[str, int]]:
    """Distributed exact word counts, (count desc, word asc) order.

    The merge loop needs the histogram on the driver, and web-scale
    corpora have effectively UNBOUNDED distinct "words" (noise, URLs,
    hashes) — an uncapped collect is a driver OOM at 100 TB. Two
    standard BPE bounds run inside the groupBy before anything is
    collected:

    - ``min_count`` prunes hapax noise (Sennrich's ``--min-frequency``;
      singleton words can never win a merge against repeated pairs,
      though they do stop contributing their pair weights).
    - ``top_words`` caps the table at the V most frequent words via a
      distributed TakeOrdered (count desc, word asc — the same total
      order the merge loop uses, so the cap is deterministic). At the
      default 1M words the driver holds ~tens of MB regardless of
      corpus size. ``None`` disables the cap for small-corpus exact
      training.
    """
    from featureform_spark.functions.text import tokens_expr

    counts = (
        df.select(F.explode(tokens_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("c") >= int(min_count))
    if top_words is not None:
        # orderBy + limit plans as TakeOrderedAndProject: each task
        # keeps its top-V, the driver merges — never the full table
        rows = counts.orderBy(
            F.col("c").desc(), F.col("w").asc()
        ).limit(int(top_words)).collect()
        return [(r["w"], r["c"]) for r in rows]
    rows = counts.collect()
    return sorted(((r["w"], r["c"]) for r in rows), key=lambda t: (-t[1], t[0]))


def train_bpe_from_histogram(
    hist: list[tuple[str, int]], num_merges: int = 100
) -> list[tuple[str, str]]:
    """The published merge loop over a word-frequency table: count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair (ties: lexicographic), repeat."""
    vocab = {tuple(w) + (EOW,): c for w, c in hist if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # total deterministic order: max count, then lexicographically
        # smallest pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        if pairs[best_pair] < 2:
            break  # nothing left that actually repeats
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best_pair[0]
                    and sym[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame, text_col: str = "text", num_merges: int = 100
) -> list[tuple[str, str]]:
    """Distributed histogram + driver-side merge loop."""
    return train_bpe_from_histogram(
        word_histogram(df, text_col), num_merges
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (lowest rank first) —
    the standard BPE inference loop."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize every document with the learned merges — Arrow-batched
    ``mapInPandas``, per-batch word cache (cost scales with distinct
    words per batch). Returns ``[id_col, bpe_tokens, n_bpe_tokens]``.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = f"{id_col} long, bpe_tokens array<string>, n_bpe_tokens long"

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_doc(text: str) -> list[str]:
            toks: list[str] = []
            for w in (text or "").split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            enc = pdf[text_col].map(enc_doc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": enc,
                    "n_bpe_tokens": enc.map(len),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
