"""Distributed Bloom filters for cross-corpus n-gram membership.

``decontaminate`` handles the standard case (MB-scale benchmark set →
broadcast the raw n-grams). This module handles the case broadcast
can't: membership against a LARGE reference corpus — memorization
scoring against a prior training run, cross-snapshot novelty, dedup
against a corpus that no longer fits as a join side. A Bloom filter
compresses the reference's n-gram set to a fixed bit budget with NO
false negatives (every true overlap is flagged; a tunable false-
positive rate adds spurious flags, the safe direction for hygiene
filters).

Scale shape:

* **build** — one pass over the reference: each partition folds its
  n-grams into a local bit array (``mapInPandas``, vectorized hashing
  via ``pandas.util.hash_array`` — no per-gram Python), emits the
  packed bytes, and the driver ORs them together. Bloom OR-union is
  exact, so the distributed build equals a single-pass build. Wire
  cost: ``partitions × m_bits/8`` bytes, independent of corpus size.
* **score** — one projection over the target corpus with the filter
  broadcast once per executor: per doc, the fraction of its distinct
  n-grams present in the filter. No join, no shuffle.

Sizing: ``m_bits ≈ -n·ln(p) / ln(2)²`` for n items at false-positive
rate p (~9.6 bits/item at 1%); ``optimal_params`` does the math.
Hashes are double-hashed SipHash (pandas' fixed-key hash_array), so a
persisted filter is tied to the pandas major pinned in this repo —
rebuild on upgrade rather than trusting cross-version hash stability.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY2 = "ffsparkbloomhsh2"  # exactly 16 bytes: pandas hash_key requirement
_MAGIC = b"FBL1"
_HEADER = 16  # magic(4) + k(uint32 LE) + m_bits(uint64 LE)


def optimal_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n_items`` at target false-positive
    rate — the standard Bloom sizing formulas, m rounded up to a
    byte boundary."""
    if not 0 < fpr < 1:
        raise ValueError("fpr must be in (0, 1)")
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    m = math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _bit_positions(values, m_bits: int, k: int) -> np.ndarray:
    """(len(values)·k,) bit indices via double hashing g_i = h1 + i·h2
    (Kirsch–Mitzenmacher: two vectorized hashes simulate k)."""
    import pandas as pd

    arr = pd.Index(values).astype(str)
    h1 = pd.util.hash_array(arr.to_numpy(dtype=object))
    h2 = pd.util.hash_array(arr.to_numpy(dtype=object), hash_key=_KEY2)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).ravel()


def _ngram_series(texts, n: int):
    """Per-row list of distinct word n-grams (whitespace tokens)."""
    out = []
    for t in texts:
        if t is None:
            out.append([])
            continue
        toks = [w for w in t.split(" ") if w]
        if len(toks) < n:
            out.append([])
            continue
        out.append(
            list({" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)})
        )
    return out


def build_ngram_bloom(
    df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 1 << 23,
    k: int = 7,
) -> bytes:
    """One distributed pass → header + packed Bloom bytes. The 16-byte
    header carries (k, m_bits) so probes can NEVER run with mismatched
    parameters — a probe k larger than the build k would test bits
    that were never set and fabricate false negatives, breaking the
    filter's one guarantee. Per-partition bit arrays OR-fold on the
    driver; union is exact."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    _n, _m, _k, _t = n, m_bits, k, text_col

    def _partial(batches):
        import pandas as pd

        bits = np.zeros(_m // 8, dtype=np.uint8)
        for pdf in batches:
            grams = set()
            for lst in _ngram_series(pdf[_t], _n):
                grams.update(lst)
            if grams:
                pos = _bit_positions(sorted(grams), _m, _k)
                np.bitwise_or.at(
                    bits, pos // 8, (1 << (pos % 8)).astype(np.uint8)
                )
        yield pd.DataFrame({"b": [bits.tobytes()]})

    parts = df.select(F.col(_t)).mapInPandas(_partial, "b binary").collect()
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        acc |= np.frombuffer(bytes(r["b"]), dtype=np.uint8)
    import struct

    return (
        _MAGIC
        + struct.pack("<IQ", k, m_bits)
        + acc.tobytes()
    )


def _parse_bloom(bloom: bytes) -> tuple[np.ndarray, int, int]:
    import struct

    if len(bloom) < _HEADER or bloom[:4] != _MAGIC:
        raise ValueError(
            "not a bloom filter blob (missing FBL1 header) — filters "
            "built before the header was added must be rebuilt"
        )
    k, m_bits = struct.unpack("<IQ", bloom[4:_HEADER])
    bits = np.frombuffer(bloom, dtype=np.uint8, offset=_HEADER)
    if len(bits) * 8 != m_bits:
        raise ValueError("bloom filter header/body length mismatch")
    return bits, int(m_bits), int(k)


def may_contain(bloom: bytes, values: list[str]) -> list[bool]:
    """Driver-side membership probes (no false negatives). (k, m_bits)
    come from the blob's own header — they cannot be mis-specified."""
    bits, m_bits, k = _parse_bloom(bloom)
    out = []
    for v in values:
        pos = _bit_positions([v], m_bits, k)
        out.append(bool(np.all(bits[pos // 8] & (1 << (pos % 8)))))
    return out


def score_membership(
    df: DataFrame,
    bloom: bytes,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per document: distinct n-gram count, how many the filter may
    contain, and the hit fraction — ONE projection, the filter
    broadcast once per executor. ``hit_frac == 0`` is a PROOF of
    novelty (no false negatives); high fractions flag memorization /
    contamination candidates for exact re-checking."""
    _parse_bloom(bloom)  # validate header before shipping it out
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
    _n, _t, _i = n, text_col, id_col
    id_type = df.schema[id_col].dataType.simpleString()

    def _score(batches):
        import pandas as pd

        bits, m_bits, _k = _parse_bloom(bc.value)
        for pdf in batches:
            rows = []
            for did, lst in zip(
                pdf[_i], _ngram_series(pdf[_t], _n)
            ):
                if not lst:
                    rows.append((did, 0, 0, None))
                    continue
                pos = _bit_positions(lst, m_bits, _k).reshape(
                    _k, len(lst)
                )
                present = np.ones(len(lst), dtype=bool)
                for r in pos:
                    present &= (
                        bits[r // 8] & (1 << (r % 8)).astype(np.uint8)
                    ) != 0
                hits = int(present.sum())
                rows.append(
                    (did, len(lst), hits, hits / len(lst))
                )
            yield pd.DataFrame(
                rows, columns=[_i, "n_grams", "n_hits", "hit_frac"]
            )

    return df.select(F.col(_i), F.col(_t)).mapInPandas(
        _score,
        f"{_i} {id_type}, n_grams int, n_hits int, hit_frac double",
    )
