"""Property-based parity for the round-7 Arrow text kernels.

The kernels in functions/text.py claim BIT-exact equivalence to specific
Spark expression forms. The one-off planted tests pin known edge classes;
these hypothesis fuzzers pin the claim over randomized inputs — and they
run WITHOUT Spark: each kernel's inner pandas function is called directly
and compared against a pure-Python reference that implements the Spark
expression semantics literally (trim = strip 0x20 only; split = Java
regex \\s+ which is the ASCII class [ \\t\\n\\x0B\\f\\r], KEEPING edge
empty-string artifacts; stopword membership over lowered tokens; margin =
sequential IEEE left fold of md5-bucket weights). Hundreds of examples
per run at zero Spark-job cost.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_from_s3_to_postgresql_template_spark.functions.text import (
    LANG_STOPWORDS,
    _make_lang_scores_udf,
    _make_margin_udf,
    _quality_stats,
)

_WS = " \t\n\x0b\f\r"
_SPLIT = re.compile(r"[ \t\n\x0b\f\r]+")


def _trim(s: str) -> str:
    return s.strip(" ")  # F.trim: 0x20 only


def _tokens(s: str) -> list[str]:
    """size(split(trim(c), '\\s+')) semantics: edge empties KEPT."""
    return _SPLIT.split(_trim(s))


# words that exercise the stopword matcher: real stopwords (several langs,
# incl. 'a' next to 'and'/'that' prefixes), near-miss substrings, unicode
_WORDS = [
    "the", "and", "of", "a", "that", "athe", "thea", "ando", "de", "la",
    "der", "und", "的", "是", "x", "yz", "Fox", "THE", "And", "naïve",
    "İstanbul", "e f",  # NBSP inside a token: NOT a Java \s split point
]
_SEPS = [" ", "  ", "\t", "\n", " \t ", "\r\n", "\x0b", "\f"]


@st.composite
def doc(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return None
    if kind == 1:
        # free-form text over a whitespace-heavy alphabet
        return draw(
            st.text(alphabet=_WS + "abcdethofn.!19é的", min_size=0, max_size=40)
        )
    # word/separator interleavings, with random edge whitespace
    words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8))
    seps = [draw(st.sampled_from(_SEPS)) for _ in range(max(0, len(words) - 1))]
    body = "".join(
        w + (seps[i] if i < len(seps) else "") for i, w in enumerate(words)
    )
    return draw(st.sampled_from(["", "\n", " ", "\t\n"])) + body + draw(
        st.sampled_from(["", "\n", " ", "\t", " \r\n"])
    )


@given(st.lists(doc(), min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_quality_stats_kernel_matches_expression_reference(texts):
    # second input is the JVM-lowered trimmed text (quality_stats_counts
    # passes F.lower(F.trim(c))); emulate with .lower() like lang_scores
    lowered = pd.Series(
        [None if t is None else _trim(t).lower() for t in texts], dtype=object
    )
    out = _quality_stats.func(pd.Series(texts, dtype=object), lowered)
    alpha = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
    digit = set("0123456789")
    punct = set(".,!?;:")
    stop = set(LANG_STOPWORDS["en"])
    for i, t in enumerate(texts):
        row = out.iloc[i]
        if t is None:
            assert pd.isna(row["n_alpha"]) and row["n_tokens"] == -1 and row["n_stop"] == -1
            continue
        assert row["n_alpha"] == sum(c in alpha for c in t), (t,)
        assert row["n_digit"] == sum(c in digit for c in t), (t,)
        assert row["n_punct"] == sum(c in punct for c in t), (t,)
        toks = _tokens(t)
        assert row["n_tokens"] == len(toks), (t, toks)
        assert row["n_stop"] == sum(tok.lower() in stop for tok in toks), (t, toks)


@given(st.lists(doc(), min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_lang_scores_kernel_matches_expression_reference(texts):
    # kernel input is the JVM-lowered trimmed text; emulate with .lower()
    # (the per-token vs whole-text lower equivalence holds because no
    # case mapping produces whitespace)
    lowered = pd.Series(
        [None if t is None else _trim(t).lower() for t in texts], dtype=object
    )
    out = _make_lang_scores_udf().func(lowered)
    for i, t in enumerate(texts):
        row = out.iloc[i]
        if t is None:
            assert all(row[lang] == -1 for lang in sorted(LANG_STOPWORDS))
            continue
        toks = _tokens(t)
        for lang, sw in LANG_STOPWORDS.items():
            want = sum(tok.lower() in set(sw) for tok in toks)
            assert row[lang] == want, (t, lang, toks)


def _ref_margin(t, buckets=2001, bias=-0.02):
    toks = [x for x in _tokens(t.lower()) if x]
    if not toks:
        return None
    half = (buckets - 1) // 2
    acc = 0.0
    for tok in toks:
        v = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
        acc += ((v % buckets) - half) / float(half)
    return bias + acc / len(toks)


@given(st.lists(doc(), min_size=1, max_size=25))
@settings(max_examples=200, deadline=None)
def test_margin_kernel_bitwise_matches_sequential_fold(texts):
    lowered = pd.Series(
        [None if t is None else _trim(t).lower() for t in texts], dtype=object
    )
    got = _make_margin_udf(2001, -0.02).func(lowered)
    for i, t in enumerate(texts):
        g = got.iloc[i]
        ref = None if t is None else _ref_margin(t)
        if ref is None:
            assert g is None or pd.isna(g), (t, g)
        else:
            assert struct.pack("d", float(g)) == struct.pack("d", ref), (t, g, ref)


def test_margin_kernel_long_doc_crosses_sweep_cap_bitwise():
    """One doc beyond _MARGIN_SWEEP_CAP folds in the per-doc Python loop;
    it must still be bit-equal to the sequential reference."""
    long_doc = " ".join(f"w{i % 53}" for i in range(6000))
    got = _make_margin_udf(2001, -0.02).func(pd.Series([long_doc.lower()]))
    assert struct.pack("d", float(got.iloc[0])) == struct.pack(
        "d", _ref_margin(long_doc)
    )
