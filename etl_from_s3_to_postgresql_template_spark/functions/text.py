"""Text-analysis Column builders: tokenization, quality, lang-ID, fingerprints.

North-star extension E3 (training-data pipeline ops over ``documents``). All
pure Column expressions — JVM-side, codegen'd, no UDFs — so they run at
100 TB as plain projections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens_col",
    "token_count_col",
    "normalize_text_col",
    "fingerprint_col",
    "stopword_hits_col",
    "lang_scores",
    "lang_id_col",
    "quality_columns",
    "shingles_col",
]

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small + deterministic; a real deployment swaps in fastText or
# CLD3 behind the same column contract.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text)).cast("long")


def normalize_text_col(text: Column | str) -> Column:
    """Lowercase + collapse whitespace: canonical form for exact dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint_col(text: Column | str) -> Column:
    """Deterministic document fingerprint: MD5 of the normalized text.
    (MD5 not xxhash64: both engines in the oracle pair implement MD5
    identically; for scale paths prefer ``F.xxhash64`` — 8-byte keys.)"""
    return F.md5(normalize_text_col(text))


def stopword_hits_col(text: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Count of tokens that are in ``stopwords`` (lowercased match)."""
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords))).cast("long")


def lang_scores(text: Column | str) -> dict[str, Column]:
    return {lang: stopword_hits_col(text, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_id_col(text: Column | str) -> Column:
    """Argmax language by stopword hits; deterministic tie-break by language
    code order; 'und' (undetermined) when no stopword hits at all."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    # First language (ascending code order) reaching the max score wins.
    cascade = None
    for lang in sorted(scores):
        cond = scores[lang] == best
        cascade = F.when(cond, F.lit(lang)) if cascade is None else cascade.when(cond, F.lit(lang))
    return F.when(best > 0, cascade).otherwise(F.lit("und"))


def quality_columns(text: Column | str) -> dict[str, Column]:
    """Length/punctuation/stopword quality signals (E3 quality scoring)."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c).cast("long")
    n_chars_trim = F.length(F.trim(c)).cast("long")
    n_tokens = token_count_col(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("long")
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("long")
    # class kept in lockstep with the DuckDB oracle in plans/llm_ops.py —
    # any character added here must be added there too
    n_punct = F.length(F.regexp_replace(c, r"[^.,!?;:]", "")).cast("long")
    n_stop = stopword_hits_col(c, LANG_STOPWORDS["en"])
    return {
        "n_chars_calc": n_chars,
        "n_tokens": n_tokens,
        # token lengths derive from the TRIMMED text (tokenization trims);
        # raw length would overstate on padded input
        "avg_token_len": F.round((n_chars_trim - (n_tokens - 1)) / n_tokens, 4),
        "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4),
        "digit_ratio": F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4),
    }


def shingles_col(text: Column | str, k: int = 3) -> Column:
    """Token k-gram shingles -> array<string> (input to MinHash/Jaccard).
    Built with ``transform`` over token indices — stays JVM-side."""
    toks = tokens_col(text)
    n = F.size(toks)
    # zip_with over k shifted slices: the token array is evaluated O(k)
    # times per ROW. (The per-index ``transform(idx, i -> element_at(toks,
    # i+j))`` form re-evaluates the ``split`` expression inside the lambda
    # per element: O(tokens*k) regex splits per row, ~40x slower measured.)
    import functools

    m = F.greatest(n - (k - 1), F.lit(1))
    parts = [F.slice(toks, j + 1, m) for j in range(k)]
    joined = functools.reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)), parts
    )
    return F.when(n >= k, joined).otherwise(F.array(F.concat_ws(" ", toks)))
