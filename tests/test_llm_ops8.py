"""docs_exactsubstr_clean: planted-corpus semantics (the two upgrades
over docs_repeated_spans — within-doc repeats and actual removal), edge
whitespace, sub-L immunity, case sensitivity, and DuckDB oracle parity
on the planted fixture."""

from __future__ import annotations

import duckdb

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

A = "a b c d e f g h"  # the duplicated 8-token phrase


def _planted(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _run(spark, sf):
    return {r["doc_id"]: r for r in QUERIES["docs_exactsubstr_clean"](spark, sf).collect()}


def test_within_doc_repeat_is_removed(spark, tmp_path):
    """The Lee-et-al semantics docs_repeated_spans lacks: a phrase
    repeated twice INSIDE one document is a duplicate."""
    sf = _planted(spark, tmp_path, [f"{A} q w {A}", "u1 u2 u3 u4 u5 u6 u7 u8 u9"])
    out = _run(spark, sf)
    assert out[0]["n_tokens"] == 18
    assert out[0]["n_removed"] == 16
    assert out[0]["cleaned_text"] == "q w"
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == "u1 u2 u3 u4 u5 u6 u7 u8 u9"


def test_cross_doc_phrase_removed_from_both_copies(spark, tmp_path):
    sf = _planted(
        spark,
        tmp_path,
        [f"x1 x2 {A} x3", f"y1 {A} y2 y3 y4", "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"],
    )
    out = _run(spark, sf)
    assert out[0]["cleaned_text"] == "x1 x2 x3"
    assert out[1]["cleaned_text"] == "y1 y2 y3 y4"
    assert out[2]["n_removed"] == 0


def test_sub_length_duplicates_survive(spark, tmp_path):
    """Identical 7-token docs produce no 8-gram: nothing to remove —
    the length floor is the operator's contract, not an accident."""
    seven = "s1 s2 s3 s4 s5 s6 s7"
    sf = _planted(spark, tmp_path, [seven, seven])
    out = _run(spark, sf)
    assert out[0]["n_removed"] == 0 and out[1]["n_removed"] == 0
    assert out[0]["cleaned_text"] == seven


def test_case_sensitive_and_whitespace_normalized(spark, tmp_path):
    upper = A.upper()
    sf = _planted(
        spark,
        tmp_path,
        [f"\t{A}\n\nk1  k2 ", f"{upper} k3 k4", f"{A} k5 k6"],
    )
    out = _run(spark, sf)
    # doc0/doc2 share the lowercase phrase; doc1's uppercase copy is NOT
    # a duplicate of it (raw bytes, per the paper)
    assert out[0]["cleaned_text"] == "k1 k2"
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == f"{upper} k3 k4"
    assert out[2]["cleaned_text"] == "k5 k6"
    # whitespace collapse + edge trim: tokens counted post-normalization
    assert out[0]["n_tokens"] == 10


def test_fully_covered_doc_cleans_to_empty_string(spark, tmp_path):
    sf = _planted(spark, tmp_path, [A, A, "w1 w2 w3 w4 w5 w6 w7 w8 w9"])
    out = _run(spark, sf)
    assert out[0]["cleaned_text"] == "" and out[0]["n_removed"] == 8
    assert out[1]["cleaned_text"] == ""


def test_oracle_parity_on_planted_fixture(spark, tmp_path):
    import __spark_entry__ as entrymod

    texts = [
        f"{A} q w {A}",
        f"x1 x2 {A} x3",
        "u1 u2 u3 u4 u5 u6 u7 u8 u9",
        "\t v1\nv2  v3 v4 v5 v6 v7 v8 v9 ",
    ]
    sf = _planted(spark, tmp_path, texts)
    got = [
        (r["doc_id"], r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in QUERIES["docs_exactsubstr_clean"](spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["docs_exactsubstr_clean"]).fetchall()
    assert got == [tuple(w) for w in want]


# ---------------------------------------------------------------------------
# text_token_count_cjk
# ---------------------------------------------------------------------------


def test_cjk_token_count_planted_semantics(spark, tmp_path):
    """The no-segmenter CJK fallback: each Han/Hiragana/Katakana
    codepoint is its own token; the remainder tokenizes by whitespace."""
    sf = _planted(
        spark,
        tmp_path,
        [
            "hello world",                # 0: pure ASCII
            "中文处理很重要",              # 1: pure Han, no whitespace
            "学习 spark 很有趣",           # 2: mixed with spaces
            "abc中def",                   # 3: CJK splits an ASCII run
            "日本語のテキストとカナです",    # 4: Han+Hiragana+Katakana mix
            "  \t mixed 空白 \n ",         # 5: messy whitespace
            "",                           # 6: empty
        ],
    )
    out = {
        r["doc_id"]: r for r in QUERIES["text_token_count_cjk"](spark, sf).collect()
    }
    assert (out[0]["n_cjk"], out[0]["n_ws"]) == (0, 2)
    assert (out[1]["n_cjk"], out[1]["n_ws"]) == (7, 0)
    assert (out[2]["n_cjk"], out[2]["n_ws"]) == (5, 1)  # spark only
    # "abc中def": the CJK char becomes a separator -> abc, def
    assert (out[3]["n_cjk"], out[3]["n_ws"], out[3]["n_tokens_unicode"]) == (1, 2, 3)
    # 日本語 (Han x3) + のテキストとカナです: の/と/です hiragana (4),
    # テキスト katakana (4), カナ katakana (2) -> 3 + 10 = 13 cjk
    assert (out[4]["n_cjk"], out[4]["n_ws"]) == (13, 0)
    assert (out[5]["n_cjk"], out[5]["n_ws"]) == (2, 1)
    assert (out[6]["n_cjk"], out[6]["n_ws"], out[6]["n_tokens_unicode"]) == (0, 0, 0)


def test_cjk_token_count_duckdb_parity_on_mixed_script(spark, tmp_path):
    """The cross-engine half the ASCII fixtures can't prove: Java
    \\p{IsHan} and RE2 \\p{Han} must classify identical codepoint sets
    on real mixed zh/ja/en text."""
    import __spark_entry__ as entrymod

    texts = [
        "深度学习模型需要大量训练数据 machine learning 数据清洗",
        "データパイプラインを構築する tokenizer の評価",
        "pure ascii text only",
        "句読点、テスト。中英 mixed 123 数字",
        "ひらがなだけのぶんしょう",
    ]
    sf = _planted(spark, tmp_path, texts)
    got = [
        (r["doc_id"], r["n_cjk"], r["n_ws"], r["n_tokens_unicode"])
        for r in QUERIES["text_token_count_cjk"](spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["text_token_count_cjk"]).fetchall()
    assert got == [tuple(w) for w in want]


# ---------------------------------------------------------------------------
# round 9: whitespace pinning + the per-doc hit cap guard
# ---------------------------------------------------------------------------


def test_vertical_tab_whitespace_oracle_parity(spark, tmp_path):
    """ADVICE r8 (low): Java \\s matches \\x0B, RE2 \\s does not — the
    oracles now pin the explicit ASCII class [ \\t\\n\\x0B\\f\\r]+ so text
    containing a vertical tab tokenizes identically in both engines (it
    used to keep 'a\\x0Bb' as ONE DuckDB token while Spark split it)."""
    import __spark_entry__ as entrymod

    texts = [
        f"{A}\x0bq w {A}",                  # \x0B adjacent to the dup phrase
        "a\x0bb c\x0b\x0bd e f g h i j",    # bare + doubled vertical tabs
        "u1 u2 u3 u4 u5 u6 u7 u8 u9",
    ]
    sf = _planted(spark, tmp_path, texts)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in ("docs_exactsubstr_clean", "text_token_count_cjk"):
        got = [tuple(r) for r in QUERIES[name](spark, sf).collect()]
        want = [tuple(w) for w in con.execute(entrymod.oracle_sql()[name]).fetchall()]
        assert got == want, name
    # and the Spark side did treat \x0B as whitespace (doc 1: 10 tokens)
    row1 = _run(spark, sf)[1]
    assert row1["n_tokens"] == 10


def test_exactsubstr_cap_guard_pathological(spark, tmp_path):
    """VERDICT r8 item 7: per-doc hit-window cap. A pathological
    massively-duplicated doc above the cap is treated as fully duplicated
    (cleaned to '', n_removed = n_tokens) and REPORTED; docs under the
    cap keep their exact interval-form result; the default cap never
    fires on ordinary corpora."""
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops8 import (
        docs_exactsubstr_clean,
    )

    # doc 0: the phrase repeated 6x + a unique tail -> many duplicated
    # windows but NOT fully covered (the exact result keeps the tail)
    patho = " ".join([A] * 6) + " z1 z2 z3 z4 z5 z6 z7 z8 z9"
    texts = [patho, f"{A} q w {A}", "u1 u2 u3 u4 u5 u6 u7 u8 u9"]
    sf = _planted(spark, tmp_path, texts)

    exact = {r["doc_id"]: r for r in docs_exactsubstr_clean(spark, sf).collect()}
    assert exact[0]["cleaned_text"] != ""  # default cap: exact result, tail kept
    assert exact[0]["n_removed"] == 48

    got, report = docs_exactsubstr_clean(
        spark, sf, max_hits_per_doc=10, return_capped=True
    )
    got = {r["doc_id"]: r for r in got.collect()}
    rep = {r["doc_id"]: r["hit_cnt"] for r in report.collect()}
    # doc 0 capped: fully removed + reported with its true hit count
    assert got[0]["cleaned_text"] == "" and got[0]["n_removed"] == got[0]["n_tokens"]
    assert list(rep) == [0] and rep[0] > 10
    # under-cap docs keep the EXACT result bit-for-bit
    for d in (1, 2):
        assert tuple(got[d]) == tuple(exact[d])


# ---------------------------------------------------------------------------
# docs_gopher_quality_cjk
# ---------------------------------------------------------------------------

_ZH_SENT = "的是在了和有我不"  # 8 zh stopword codepoints


def test_cjk_gopher_gate_passes_unsegmented_chinese(spark, tmp_path):
    """The structural fix: a healthy unsegmented Chinese document FAILS
    the ASCII gate (1 whitespace token, mean length off the chart, zero
    EN stopwords) but PASSES the CJK-aware gate."""
    zh_doc = ("春眠不覺曉處處聞啼鳥" * 6) + _ZH_SENT  # 68 CJK chars, no spaces
    en_doc = ("the cat sat on the mat and that is a fine mat to sit on "
              * 5)  # healthy EN
    bad_doc = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) " * 8  # symbol soup
    sf = _planted(spark, tmp_path, [zh_doc, en_doc, bad_doc])
    rows = {
        r["doc_id"]: r
        for r in QUERIES["docs_gopher_quality_cjk"](spark, sf).collect()
    }
    # zh doc: every codepoint a token, stopword evidence from zh chars,
    # no whitespace tokens -> mean bound waived, all chars CJK
    assert rows[0]["n_ws"] == 0 and rows[0]["n_cjk"] == 68
    assert rows[0]["mean_ws_token_len"] is None
    assert rows[0]["n_stop"] >= 2 and rows[0]["passes"]
    # the ASCII gate rejects the same doc (the documented false negative)
    ascii_rows = {
        r["doc_id"]: r for r in QUERIES["docs_gopher_quality"](spark, sf).collect()
    }
    assert not ascii_rows[0]["passes"] and ascii_rows[0]["n_tokens"] == 1
    # healthy EN doc passes both
    assert rows[1]["passes"] and ascii_rows[1]["passes"]
    # symbol soup fails the alpha rule here regardless of token counts
    assert not rows[2]["passes"]


def test_cjk_gopher_gate_duckdb_parity_mixed_script(spark, tmp_path):
    import __spark_entry__ as entrymod

    texts = [
        "the quick brown fox jumps over the lazy dog " * 3,
        ("春眠不覺曉" * 15) + " the end is that a test",
        "",
        "mixed 今日はいい天気です with latin words in between that the",
        "\tweird\x0bwhitespace the and of to in is a that " * 4,
    ]
    sf = _planted(spark, tmp_path, texts)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    got = [tuple(r) for r in QUERIES["docs_gopher_quality_cjk"](spark, sf).collect()]
    want = [
        tuple(w)
        for w in con.execute(
            entrymod.oracle_sql()["docs_gopher_quality_cjk"]
        ).fetchall()
    ]
    assert got == want
