"""Line-wise corpus dedup + SoftDeDup reweighting (plans/llm_ops10.py):
planted multi-line fixtures (the sf corpus is single-line, so the real
line semantics are pinned here), duplication-ordering properties,
degenerate inputs, and DuckDB oracle parity on planted text."""

from __future__ import annotations

import duckdb

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES


def _planted(spark, tmp_path, texts, langs=None):
    sf = str(tmp_path)
    rows = [
        (i, t, (langs[i] if langs else "en"), "web", len(t or ""))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _oracle(sf, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# docs_line_dedup
# ---------------------------------------------------------------------------

_BOILER = "accept all cookies to continue"


def test_line_dedup_removes_cross_doc_lines_keeps_order(spark, tmp_path):
    """The RefinedWeb rule: a trimmed line in >= 2 distinct docs is
    removed everywhere; unique lines survive in original order with
    original (untrimmed) bytes."""
    sf = _planted(
        spark,
        tmp_path,
        [
            f"unique alpha\n{_BOILER}\nunique beta",
            f"  {_BOILER}  \nonly here",  # trimmed form matches -> removed
            "totally unrelated document",
        ],
    )
    out = {r["doc_id"]: r for r in QUERIES["docs_line_dedup"](spark, sf).collect()}
    assert out[0]["cleaned_text"] == "unique alpha\nunique beta"
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (3, 1)
    # doc 1's padded variant trims to the same line identity
    assert out[1]["cleaned_text"] == "only here"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (2, 1)
    # untouched doc passes through verbatim (the fast path)
    assert out[2]["cleaned_text"] == "totally unrelated document"
    assert out[2]["n_removed"] == 0


def test_line_dedup_within_doc_repeat_alone_is_kept(spark, tmp_path):
    """The rule counts DISTINCT documents: a line repeated twice inside
    ONE doc (and nowhere else) is not boilerplate and stays."""
    sf = _planted(
        spark,
        tmp_path,
        ["chorus line\nverse one\nchorus line", "another doc entirely"],
    )
    out = {r["doc_id"]: r for r in QUERIES["docs_line_dedup"](spark, sf).collect()}
    assert out[0]["cleaned_text"] == "chorus line\nverse one\nchorus line"
    assert out[0]["n_removed"] == 0


def test_line_dedup_empty_lines_are_structure(spark, tmp_path):
    """Empty-after-trim lines appear in every multi-paragraph doc; they
    never count as duplicates and never get removed."""
    sf = _planted(
        spark,
        tmp_path,
        ["para one\n\npara two", "para three\n\npara four"],
    )
    out = {r["doc_id"]: r for r in QUERIES["docs_line_dedup"](spark, sf).collect()}
    assert out[0]["cleaned_text"] == "para one\n\npara two"
    assert out[1]["cleaned_text"] == "para three\n\npara four"
    assert out[0]["n_removed"] == out[1]["n_removed"] == 0


def test_line_dedup_fully_boilerplate_doc_blanks(spark, tmp_path):
    sf = _planted(
        spark,
        tmp_path,
        [f"{_BOILER}\nsubscribe now", f"{_BOILER}\nsubscribe now", "real content"],
    )
    out = {r["doc_id"]: r for r in QUERIES["docs_line_dedup"](spark, sf).collect()}
    for d in (0, 1):
        assert out[d]["cleaned_text"] == ""
        assert (out[d]["n_lines"], out[d]["n_removed"]) == (2, 2)
    assert out[2]["cleaned_text"] == "real content"


def test_line_dedup_trailing_newline_and_empty_doc(spark, tmp_path):
    """Trailing '\\n' yields a trailing empty segment on BOTH engines
    (Java split limit -1 == DuckDB string_split); empty docs are one
    empty line, kept."""
    sf = _planted(spark, tmp_path, ["line a\n", ""])
    out = {r["doc_id"]: r for r in QUERIES["docs_line_dedup"](spark, sf).collect()}
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (2, 0)
    assert out[0]["cleaned_text"] == "line a\n"
    assert (out[1]["n_lines"], out[1]["cleaned_text"]) == (1, "")


def test_line_dedup_null_text_is_an_empty_doc(spark, tmp_path):
    """NULL text must behave like '' on BOTH engines (Spark size(NULL)
    is -1; DuckDB len(NULL) is NULL — the plan/oracle pin '' instead)."""
    import __spark_entry__ as entrymod

    sf = _planted(spark, tmp_path, [None, "line a\nline b", None])
    got = [
        tuple(r) for r in QUERIES["docs_line_dedup"](spark, sf).collect()
    ]
    want = [tuple(w) for w in _oracle(sf, entrymod.oracle_sql()["docs_line_dedup"])]
    assert got == want
    assert got[0] == (0, 1, 0, "")


def test_line_dedup_oracle_parity_on_planted_multiline(spark, tmp_path):
    import __spark_entry__ as entrymod

    sf = _planted(
        spark,
        tmp_path,
        [
            f"unique alpha\n{_BOILER}\nunique beta",
            f"\t{_BOILER}\nonly here\n",  # tab-padded: trim(' ') keeps the tab -> distinct identity
            f"  {_BOILER}  \nshared tail",
            "shared tail\n\nend",
            "",
        ],
    )
    got = [
        tuple(r)
        for r in QUERIES["docs_line_dedup"](spark, sf)
        .select("doc_id", "n_lines", "n_removed", "cleaned_text")
        .collect()
    ]
    want = [tuple(w) for w in _oracle(sf, entrymod.oracle_sql()["docs_line_dedup"])]
    assert got == want


# ---------------------------------------------------------------------------
# docs_softdedup_weights
# ---------------------------------------------------------------------------

_UNIQ = "the quick brown fox jumps over the lazy dog tonight"
_DUP = "click here to read the full article on our site"


def test_softdedup_duplicated_docs_score_more_common(spark, tmp_path):
    """The SoftDeDup property: a doc whose grams are heavily repeated
    across the corpus has strictly higher (less negative) commonness
    than an equal-length doc made of unique grams."""
    texts = [_DUP] * 8 + [_UNIQ]
    sf = _planted(spark, tmp_path, texts)
    out = {
        r["doc_id"]: r
        for r in QUERIES["docs_softdedup_weights"](spark, sf).collect()
    }
    dup_scores = [out[i]["logp_micro"] for i in range(8)]
    # identical content -> identical weight; n_grams = 10 tokens - 3
    assert len(set(dup_scores)) == 1
    assert out[0]["n_grams"] == out[8]["n_grams"] == 7
    assert dup_scores[0] > out[8]["logp_micro"]
    # commonness is log-probability: always <= 0 in micro-units
    assert all(out[d]["logp_micro"] <= 0 for d in out)


def test_softdedup_short_and_empty_docs_report_zero(spark, tmp_path):
    sf = _planted(spark, tmp_path, ["one two three", "", "   ", _UNIQ])
    out = {
        r["doc_id"]: r
        for r in QUERIES["docs_softdedup_weights"](spark, sf).collect()
    }
    for d in (0, 1, 2):  # < 4 tokens: no grams, the empty product
        assert (out[d]["n_grams"], out[d]["logp_micro"]) == (0, 0)
    assert out[3]["n_grams"] == 7


def test_softdedup_case_insensitive_and_ws_normalized(spark, tmp_path):
    """Commonness matches on lowercased, whitespace-collapsed grams:
    casing/padding variants of the same text share all gram counts."""
    sf = _planted(
        spark,
        tmp_path,
        [_DUP, _DUP.upper(), "  " + _DUP.replace(" ", "\t ") + " ", _UNIQ],
    )
    out = {
        r["doc_id"]: r["logp_micro"]
        for r in QUERIES["docs_softdedup_weights"](spark, sf).collect()
    }
    assert out[0] == out[1] == out[2]
    assert out[0] > out[3]


def test_softdedup_determinism(spark, tmp_path):
    sf = _planted(spark, tmp_path, [_DUP, _DUP, _UNIQ, "a b c d e f g"])
    a = QUERIES["docs_softdedup_weights"](spark, sf).collect()
    b = QUERIES["docs_softdedup_weights"](spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_softdedup_oracle_parity_on_planted_fixture(spark, tmp_path):
    import __spark_entry__ as entrymod

    sf = _planted(
        spark,
        tmp_path,
        [_DUP, _DUP, _DUP.upper(), _UNIQ, "tiny doc", "", "x y z w x y z w"],
    )
    got = [
        tuple(r) for r in QUERIES["docs_softdedup_weights"](spark, sf).collect()
    ]
    want = [
        tuple(w)
        for w in _oracle(sf, entrymod.oracle_sql()["docs_softdedup_weights"])
    ]
    assert got == want


# ---------------------------------------------------------------------------
# corpus_bpe_encode / corpus_bpe_encode_step1
# ---------------------------------------------------------------------------


def _bpe_expected(sf_texts, merges):
    """Pure-Python reference: encode every word with encode_word."""
    from etl_from_s3_to_postgresql_template_spark.operators.bpe import encode_word

    out = []
    for doc_id, text in enumerate(sf_texts):
        words = [w for w in text.replace("\x1f", "").lower().split() if w]
        toks = [t for w in words for t in encode_word(w, merges)]
        out.append(
            (doc_id, len(words), sum(len(w) for w in words), len(toks))
        )
    return out


def test_bpe_encode_equals_pure_python_encoder(spark, tmp_path):
    """The chained-regexp encode must equal encode_word applied to every
    word — including the multi-char-symbol rounds the step-1 oracle
    can't see."""
    from etl_from_s3_to_postgresql_template_spark.operators.bpe import (
        fit_bpe_merges,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import (
        load_table,
    )

    texts = [
        "the cat sat on the mat the cat sat",
        "that hat that hat that hat",
        "theme theory the the the",
        "aaa aaaa a aa aaa",
        "",
    ]
    sf = _planted(spark, tmp_path, texts)
    docs = load_table(spark, sf, "documents")
    merges = fit_bpe_merges(docs, n_merges=20, min_count=2)
    assert merges  # the fixture must actually exercise merges
    got = [tuple(r) for r in QUERIES["corpus_bpe_encode"](spark, sf).collect()]
    assert got == _bpe_expected(texts, merges)


def test_bpe_encode_symbol_boundary_is_respected(spark, tmp_path):
    """A later merge (b,c) must NOT fire inside the merged symbol 'ab':
    'abc' encodes to ('ab','c'), never ('a','bc') — the failure a naive
    substring replace (no symbol-boundary lookarounds) produces."""
    from etl_from_s3_to_postgresql_template_spark.operators.bpe import (
        encode_word,
        fit_bpe_merges,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import (
        load_table,
    )

    texts = [" ".join(["ab"] * 10), " ".join(["bc"] * 8), " ".join(["abc"] * 3)]
    sf = _planted(spark, tmp_path, texts)
    docs = load_table(spark, sf, "documents")
    merges = fit_bpe_merges(docs, n_merges=20, min_count=2)
    assert [(m[0], m[1]) for m in merges[:2]] == [("a", "b"), ("b", "c")]
    assert encode_word("abc", merges[:2]) == ["ab", "c"]
    got = {r["doc_id"]: r for r in QUERIES["corpus_bpe_encode"](spark, sf).collect()}
    # the discriminating doc is 'abc abc abc': boundary-correct encoding
    # gives ('ab','c') after merge 2 and then merge 3 ('ab','c') -> 'abc'
    # (1 token); a boundary-less substring replace takes the (b,c) path
    # to ('a','bc'), which merge 3 can never rejoin (2 tokens)
    assert ("ab", "c") in [(m[0], m[1]) for m in merges]
    assert got[2]["n_tokens"] == 3
    assert [tuple(got[i]) for i in range(3)] == _bpe_expected(texts, merges)


def test_bpe_encode_overlap_left_to_right(spark, tmp_path):
    """'aaa' merges once under (a,a) (left-to-right non-overlapping):
    3 symbols -> 2 tokens; 'aaaa' -> 2 tokens."""
    texts = ["aa aa aa aa", "aaa aaaa a"]
    sf = _planted(spark, tmp_path, texts)
    got = {r["doc_id"]: r for r in QUERIES["corpus_bpe_encode"](spark, sf).collect()}
    assert (got[1]["n_symbols"], got[1]["n_tokens"]) == (8, 1 + 2 + 2)


def test_bpe_encode_step1_oracle_parity(spark, tmp_path):
    import __spark_entry__ as entrymod

    texts = [
        "the cat sat on the mat",
        "that that that",
        "aaa aaaa",
        "",
        "x",
    ]
    sf = _planted(spark, tmp_path, texts)
    got = [
        tuple(r)
        for r in QUERIES["corpus_bpe_encode_step1"](spark, sf).collect()
    ]
    want = [
        tuple(w)
        for w in _oracle(sf, entrymod.oracle_sql()["corpus_bpe_encode_step1"])
    ]
    assert got == want


def test_bpe_encode_strips_raw_separator_byte(spark, tmp_path):
    """A document containing the \\x1f symbol-boundary byte must not
    corrupt the encode — it is stripped before symbolization."""
    texts = ["ab\x1fab abab", "abab abab"]
    sf = _planted(spark, tmp_path, texts)
    got = {r["doc_id"]: r for r in QUERIES["corpus_bpe_encode"](spark, sf).collect()}
    # doc 0's first word is 'abab' after the strip: both docs identical
    assert tuple(got[0])[1:] == tuple(got[1])[1:]
