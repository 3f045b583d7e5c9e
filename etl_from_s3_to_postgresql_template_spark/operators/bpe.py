"""BPE tokenizer fitting (Sennrich, Haddow, Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
job of a training-data pipeline.

Architecture, following the fitted-artifact split used by
fit_ivf_centroids (operators/similarity.py): the CORPUS-SCALE work is
one distributed pass — word frequencies via explode + groupBy, with
map-side combine and a deterministic vocabulary cap — and the merge
loop then runs in memory on that bounded (word, freq) artifact, exactly
how production BPE trainers operate (count words over the corpus once;
learn merges from the weighted vocabulary, whose size is bounded by the
language, not the corpus). At 100 TB the word-count pass is the only
part that sees the data; the vocab artifact is a few MB.

Semantics are the reference algorithm: pair counts are per adjacent
symbol position weighted by word frequency (overlaps count: "aaa"
contributes (a,a) twice), the best pair is (max count, then
lexicographically smallest (left, right)), and merging rewrites each
word's symbols left-to-right non-overlapping. Ties and overlap handling
are pinned by a pure-Python reference equality test.

Reference scope note: the reference template has no tokenizer surface
(north-star E4); closest registered relatives are corpus_bpe_pair_stats
(exactly step 1's count table — the oracle-paired gate below checks the
fit's first merge against it) and text_token_count_bpe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequencies", "fit_bpe_merges", "encode_word"]


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_vocab: int | None = 100_000
) -> DataFrame:
    """Distributed word-frequency pass: lower/trim, split on whitespace,
    explode, count — the one corpus-scale step of BPE fitting. The cap
    keeps the fit artifact bounded with a DETERMINISTIC cut (count desc,
    word asc): dropping the long tail of hapaxes is standard and changes
    only merges whose support the tail provided. ``max_vocab=None``
    disables the cap — required when cross-checking against an oracle
    that counts over ALL word occurrences (the bpe_first_merge gate)."""
    wf = (
        docs.select(F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_vocab is None:
        return wf
    return wf.orderBy(F.desc("freq"), "word").limit(max_vocab)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2  # left-to-right non-overlapping
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def fit_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_count: int = 2,
    max_vocab: int | None = 100_000,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns ``[(left, right,
    support), ...]`` in merge order. Stops early when the best pair's
    weighted support falls below ``min_count`` (merging hapax pairs
    memorizes the sample). Deterministic: same corpus -> same merges
    (tie-break: lexicographically smallest (left, right))."""
    rows = word_frequencies(docs, text_col, max_vocab).collect()
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(r["word"])
        vocab[syms] = vocab.get(syms, 0) + int(r["freq"])
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), support = best
        if support < min_count:
            break
        merges.append((left, right, support))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            merged = _merge_word(syms, (left, right))
            new_vocab[merged] = new_vocab.get(merged, 0) + freq
        vocab = new_vocab
    return merges


def encode_word(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply learned merges to one word, in merge order — the encoder
    side of the artifact (GPT-2-style rank-greedy is equivalent for
    merges applied in learned order)."""
    syms = tuple(word)
    for left, right, _ in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, (left, right))
    return list(syms)
