"""From-scratch deterministic byte-pair encoding with TRAINED merges.

The reference's chunker counts tokens with a real HF tokenizer
(``docling_jobkit/convert/chunking.py:109-199`` — HybridChunker's
``num_tokens``); the regex pre-tokenization in ``functions.scalar.
bpe_tokens`` approximates only the pre-tokenize step. This module closes
the gap from public knowledge alone: classic BPE (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
GPT-2 tokenizer family applies merges lowest-rank-first), trained on a
bounded corpus sample and applied corpus-wide.

Determinism contract (unit-tested): training ties on pair frequency are
broken by the lexicographically SMALLEST pair; the sample is taken in a
deterministic order (caller sorts); so the merge table is a pure
function of (corpus, sample size, n_merges).

Scale design:
- TRAINING is driver-side over a bounded sample (same pattern as the
  IVF k-means codebook: a few hundred rows, never the corpus) — BPE
  merge tables saturate quickly on natural text, and a 10^12-document
  corpus trains on the same few-KB sample as a 10^4 one.
- APPLICATION is an Arrow-batched pandas UDF (no per-row Python at the
  Spark boundary) with a per-batch word→count memo: token counts are
  per-WORD, and word frequency is Zipfian, so the memo turns the per-row
  cost into a near-dictionary lookup. No shuffle anywhere — the count is
  a projection at scan speed. (The relational alternative — explode to
  words, encode the distinct vocabulary once, join back — shuffles the
  whole corpus' words for a per-doc sum; the memoized projection wins.)
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_END = "</w>"


def train_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE training: repeatedly merge the most frequent adjacent
    symbol pair over the word-frequency table. Deterministic: ties break
    on the lexicographically smallest pair. Words are whitespace
    pre-tokens (the same split as ``functions.scalar.tokens``) with a
    word-end marker so merges never cross word boundaries."""
    wc: Counter[str] = Counter()
    for t in texts:
        if t:
            wc.update(t.split())
    symbols: dict[str, tuple[str, ...]] = {
        w: tuple(w) + (WORD_END,) for w in wc
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, freq in wc.items():
            syms = symbols[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # max frequency, then smallest pair — a total deterministic order
        maxc = max(pairs.values())
        if maxc < 2:
            break  # nothing left worth merging
        best = min(pair for pair, c in pairs.items() if c == maxc)
        merges.append(best)
        a, b = best
        merged = a + b
        for w, syms in symbols.items():
            if a not in syms:
                continue
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = tuple(out)
    return merges


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word, lowest-rank-first (the GPT-2
    application order): at each step, find the present pair with the
    smallest merge rank and merge ALL its occurrences."""
    syms: list[str] = list(word) + [WORD_END]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        merged = a + b
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def count_tokens_text(
    text: str | None,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, int] | None = None,
) -> int:
    """Token count of one text under the trained merges (pure twin of
    the UDF — used by tests for row-exact equivalence)."""
    if not text:
        return 0
    if cache is None:
        cache = {}
    n = 0
    for w in text.split():
        c = cache.get(w)
        if c is None:
            c = len(bpe_encode(w, ranks))
            cache[w] = c
        n += c
    return n


def train_bpe_from_df(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    sample_rows: int = 512,
    n_merges: int = 200,
) -> list[tuple[str, str]]:
    """Bounded deterministic training sample: the first ``sample_rows``
    rows by ``order_col`` (a total order makes the sample — hence the
    merge table — reproducible across runs and partitionings). Collect
    is bounded by sample_rows, never corpus-scale."""
    rows = (
        df.select(F.col(text_col).alias("t"), F.col(order_col).alias("o"))
        .orderBy("o")
        .limit(sample_rows)
        .collect()
    )
    return train_bpe([r["t"] for r in rows], n_merges=n_merges)


def bpe_token_count_col(merges: list[tuple[str, str]], text_col: str) -> Column:
    """Arrow-batched token-count column under the trained merges. The
    merge table travels once per executor in the UDF closure (a few KB);
    a per-batch word→count memo exploits Zipfian word frequency."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        return s.map(lambda t: count_tokens_text(t, ranks, cache)).astype("int32")

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _count(c)
