"""Gopher repetition rules + UniMax mixture + embedding decontamination
+ tokenizer fertility (plans/llm_ops11.py): hand-computed expectations
on planted fixtures (the sf corpus is single-line ASCII, so line
semantics, CJK fertility, and the \\x0B whitespace byte are pinned
here), union-coverage properties, waterfill algebra, degenerate inputs,
and DuckDB oracle parity on planted corpora."""

from __future__ import annotations

import duckdb
import pytest

from etl_from_s3_to_postgresql_template_spark.functions.gopher_rep import _doc_counts
from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES


def _planted_docs(spark, tmp_path, rows3):
    """rows3: list of (text, lang, source)."""
    sf = str(tmp_path)
    rows = [
        (i, t, lang, src, len(t or "")) for i, (t, lang, src) in enumerate(rows3)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _planted_emb(spark, tmp_path, vecs):
    """vecs: list of (vec_id, [floats])."""
    sf = str(tmp_path)
    rows = [(i, [float(x) for x in v], 0) for i, v in vecs]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def _oracle(sf, name, table="documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf}/{table}.parquet/*.parquet')"
    )
    return con.execute(ORACLE[name]).fetchall()


# ---------------------------------------------------------------------------
# docs_gopher_repetition — kernel unit semantics
# ---------------------------------------------------------------------------


def test_rep_counts_lines_hand_computed():
    """'a\\nb\\na\\n  a  \\nc': trimmed participating lines a,b,a,a,c ->
    5 lines, 2 duplicate occurrences, 5 chars total, 2 duplicate chars."""
    n_lines, dup_cnt, line_chars, dup_chars, *_ = _doc_counts("a\nb\na\n  a  \nc")
    assert (n_lines, dup_cnt, line_chars, dup_chars) == (5, 2, 5, 2)


def test_rep_counts_empty_and_blank_lines_excluded():
    n_lines, dup_cnt, *_ = _doc_counts("\n\n   \n")
    assert (n_lines, dup_cnt) == (0, 0)


def test_rep_counts_tab_padded_lines_stay_distinct():
    """0x20-trim identity (the docs_line_dedup choice): '\\ta' != 'a'."""
    n_lines, dup_cnt, *_ = _doc_counts("a\n\ta")
    assert (n_lines, dup_cnt) == (2, 0)


def test_rep_counts_top2gram_hand_computed():
    """'x y x y x y': 2-gram 'x y' occurs 3x (3 chars each -> 9);
    normalized stream length 11."""
    c = _doc_counts("x y x y x y")
    top2, n_tok, tok_chars = c[4], c[8], c[9]
    assert (top2, n_tok, tok_chars) == (9, 6, 6)


def test_rep_counts_top_ngram_zero_when_nothing_repeats():
    c = _doc_counts("a b c d e f")
    assert c[4] == c[5] == c[6] == 0  # top2, top3, top4
    assert c[7] == 0  # dup5


def test_rep_counts_dup5_union_no_double_count():
    """'a a a a a a a': every 5-gram identical and repeated; union
    coverage is all 7 tokens (7 chars), NOT per-occurrence sums (15)."""
    c = _doc_counts("a a a a a a a")
    assert c[7] == 7 and c[9] == 7


def test_rep_counts_dup5_disjoint_blocks():
    """'a b c d e a b c d e': grams at positions 1 and 6 repeat; covered
    tokens 1-5 and 6-10 = all ten (10 chars)."""
    c = _doc_counts("a b c d e a b c d e")
    assert c[7] == 10


def test_rep_counts_vertical_tab_is_whitespace():
    """\\x0B splits tokens (the llm_ops8 byte-set convention)."""
    c = _doc_counts("a\x0ba a a")
    assert c[8] == 4  # n_tok


# ---------------------------------------------------------------------------
# docs_gopher_repetition — full plan + oracle parity on planted corpus
# ---------------------------------------------------------------------------

_REP_CORPUS = [
    # multi-line with duplicated boilerplate lines
    ("nav bar\nreal content one\nnav bar\nreal content two", "en", "web"),
    # heavy 2-gram repetition -> fails top-2-gram gate
    ("spam ham spam ham spam ham spam ham spam ham", "en", "web"),
    # clean prose -> passes
    ("the quick brown fox jumps over one lazy dog today", "en", "web"),
    # exact 5-gram block repetition -> fails dup-5-gram gate
    ("alpha beta gamma delta epsilon alpha beta gamma delta epsilon", "en", "web"),
    (None, "en", "web"),  # NULL text: all zero, passes
    ("", "en", "web"),  # empty text: all zero, passes
    ("one\x0btwo three\x0bfour five six", "en", "web"),  # \x0B parity
]


def test_gopher_repetition_plan_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, _REP_CORPUS)
    got = [tuple(r) for r in QUERIES["docs_gopher_repetition"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_gopher_repetition")]
    assert got == want


def test_gopher_repetition_gates(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, _REP_CORPUS)
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["docs_gopher_repetition"](spark, sf).collect()
    }
    # doc 0: 4 lines, 1 dup occurrence -> 25% dup lines, passes line rule
    assert rows[0]["n_lines"] == 4
    assert rows[0]["dup_line_frac_micro"] == 250000
    # doc 1: top-2-gram dominates -> gate fails
    assert rows[1]["top_2gram_frac_micro"] > 200000 and not rows[1]["passes"]
    # doc 2: clean prose passes
    assert rows[2]["passes"]
    # doc 3: dup-5-gram covers everything -> gate fails
    assert rows[3]["dup_5gram_frac_micro"] == 1000000 and not rows[3]["passes"]
    # docs 4/5: NULL and empty behave identically — zeros, pass
    for d in (4, 5):
        assert rows[d]["n_lines"] == 0 and rows[d]["passes"]


# ---------------------------------------------------------------------------
# corpus_mixture_unimax — waterfill algebra
# ---------------------------------------------------------------------------


def _tok_doc(n, word="w"):
    return " ".join([word] * n)


def test_unimax_waterfill_hand_computed(spark, tmp_path):
    """Domains A=10, B=100, C=1000 tokens; E=4 -> caps 40/400/4000;
    N = 2*1110 = 2220. Ascending: A capped (40*3=120 <= 2220), B capped
    (400*2=800 <= 2180), C waterfilled share = 1780 tokens."""
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            (_tok_doc(10), "en", "A"),
            (_tok_doc(100), "en", "B"),
            (_tok_doc(1000), "en", "C"),
        ],
    )
    rows = {
        r["domain"]: r.asDict()
        for r in QUERIES["corpus_mixture_unimax"](spark, sf).collect()
    }
    a, b, c = rows["A/en"], rows["B/en"], rows["C/en"]
    assert a["capped"] and a["alloc_micro"] == 40_000_000
    assert a["epochs_micro"] == 4_000_000  # exactly the epoch cap
    assert b["capped"] and b["alloc_micro"] == 400_000_000
    assert not c["capped"] and c["alloc_micro"] == 1_780_000_000
    assert c["epochs_micro"] == 1_780_000_000 // 1000
    # budget exactly exhausted: sum of allocations == N in micro-tokens
    assert sum(r["alloc_micro"] for r in rows.values()) == 2220 * 1_000_000


def test_unimax_single_domain_gets_full_budget(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, [(_tok_doc(50), "en", "only")])
    (r,) = QUERIES["corpus_mixture_unimax"](spark, sf).collect()
    # capacity 200 > budget 100 -> waterfilled with the whole budget
    assert not r["capped"] and r["alloc_micro"] == 100 * 1_000_000
    assert r["epochs_micro"] == 2_000_000


def test_unimax_zero_token_domain(spark, tmp_path):
    sf = _planted_docs(
        spark, tmp_path, [("", "en", "empty"), (_tok_doc(10), "en", "full")]
    )
    rows = {
        r["domain"]: r.asDict()
        for r in QUERIES["corpus_mixture_unimax"](spark, sf).collect()
    }
    z = rows["empty/en"]
    assert z["capped"] and z["alloc_micro"] == 0 and z["epochs_micro"] == 0


def test_unimax_plan_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            (_tok_doc(7), "en", "s1"),
            (_tok_doc(13), "de", "s1"),
            (_tok_doc(130), "en", "s2"),
            (_tok_doc(1300), "fr", "s3"),
            ("", "en", "s4"),
        ],
    )
    got = [tuple(r) for r in QUERIES["corpus_mixture_unimax"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "corpus_mixture_unimax")]
    assert got == want


# ---------------------------------------------------------------------------
# embedding_decontaminate_eval
# ---------------------------------------------------------------------------


def test_decontaminate_eval_flags_and_counts(spark, tmp_path):
    """Holdout is vec_id 3 ([1,0]); vec 0 duplicates it (cos 1), vec 1
    is orthogonal, vec 2 is near (cos ~0.995), vec 4 is opposite."""
    sf = _planted_emb(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.9, 0.09]),
            (3, [1.0, 0.0]),  # holdout (3 % 10 == 3)
            (4, [-1.0, 0.0]),
        ],
    )
    rows = {
        r["vec_id"]: r.asDict()
        for r in QUERIES["embedding_decontaminate_eval"](spark, sf).collect()
    }
    assert set(rows) == {0, 1, 2, 4}  # holdout row excluded
    assert rows[0]["contaminated"] and rows[0]["n_hits"] == 1
    assert rows[0]["max_cos"] == 1.0
    assert not rows[1]["contaminated"] and rows[1]["n_hits"] == 0
    assert rows[2]["contaminated"]
    assert not rows[4]["contaminated"] and rows[4]["max_cos"] == -1.0


def test_decontaminate_eval_plan_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_emb(
        spark,
        tmp_path,
        [(i, [float(i % 7) + 0.25, float((3 * i) % 5) - 1.5, 0.125 * i]) for i in range(30)],
    )
    got = [
        tuple(r)
        for r in QUERIES["embedding_decontaminate_eval"](spark, sf).collect()
    ]
    want = [tuple(r) for r in _oracle(sf, "embedding_decontaminate_eval", "embeddings")]
    assert got == want


# ---------------------------------------------------------------------------
# text_tokenizer_fertility
# ---------------------------------------------------------------------------


def test_fertility_hand_computed_zh_vs_en(spark, tmp_path):
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            ("hello world", "en", "web"),  # 2 ws tokens, 11 chars, 11 bytes
            ("你好世界", "zh", "web"),  # 4 CJK cps, 12 bytes
            (None, "fr", "web"),  # NULL text: all zeros
        ],
    )
    rows = {
        r["lang"]: r.asDict()
        for r in QUERIES["text_tokenizer_fertility"](spark, sf).collect()
    }
    en, zh, fr = rows["en"], rows["zh"], rows["fr"]
    assert (en["n_ws_tokens"], en["n_cjk_chars"], en["n_unicode_tokens"]) == (2, 0, 2)
    assert en["chars_per_tok_micro"] == 1_000_000 * 11 // 2
    assert en["bytes_per_tok_micro"] == 1_000_000 * 11 // 2
    assert (zh["n_ws_tokens"], zh["n_cjk_chars"], zh["n_unicode_tokens"]) == (0, 4, 4)
    assert zh["chars_per_tok_micro"] == 1_000_000  # one char per token
    assert zh["bytes_per_tok_micro"] == 3_000_000  # 3 UTF-8 bytes per CJK cp
    assert fr["n_unicode_tokens"] == 0 and fr["chars_per_tok_micro"] == 0


def test_fertility_mixed_script_and_x0b_parity(spark, tmp_path):
    """Mixed zh/en text and a \\x0B separator: plan == oracle exactly
    (the llm_ops8 whitespace + script-property conventions)."""
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            ("深度 learning 模型 rocks", "zh", "web"),
            ("one\x0btwo", "en", "web"),
        ],
    )
    got = [tuple(r) for r in QUERIES["text_tokenizer_fertility"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "text_tokenizer_fertility")]
    assert got == want


# ---------------------------------------------------------------------------
# embedding_kmeans_micro
# ---------------------------------------------------------------------------


def test_kmeans_micro_separates_obvious_clusters(spark, tmp_path):
    """Two tight groups far apart: after two Lloyd rounds every member
    lands with its group regardless of which init centroid it seeded."""
    near0 = [(i, [0.01 * i, 0.0]) for i in range(6)]  # vec 0..5 near origin
    far = [(i, [10.0 + 0.01 * i, 10.0]) for i in range(6, 12)]
    sf = _planted_emb(spark, tmp_path, near0 + far)
    rows = {
        r["vec_id"]: r["cluster"]
        for r in QUERIES["embedding_kmeans_micro"](spark, sf).collect()
    }
    origin_clusters = {rows[i] for i in range(6)}
    far_clusters = {rows[i] for i in range(6, 12)}
    assert origin_clusters.isdisjoint(far_clusters)


def test_kmeans_micro_empty_cluster_keeps_centroid_and_matches_oracle(spark, tmp_path):
    """vec 0 and vec 1 are IDENTICAL, so init centroids 0 and 1 coincide
    and the tie-break sends every origin point to cluster 0 — cluster 1
    goes empty after round 1 and must keep its previous centroid on
    both engines (hash parity pins the rule)."""
    vecs = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [5.0, 5.0]),
        (3, [-5.0, 5.0]),
        (4, [0.1, 0.0]),
        (5, [5.1, 5.0]),
        (6, [-5.1, 5.0]),
    ]
    sf = _planted_emb(spark, tmp_path, vecs)
    got = [tuple(r) for r in QUERIES["embedding_kmeans_micro"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "embedding_kmeans_micro", "embeddings")]
    assert got == want
    clusters = {r[0]: r[1] for r in got}
    # The kept centroid is observable: cluster 1 retained [0,0] while
    # cluster 0's centroid moved to the round-1 mean, so in the FINAL
    # assignment the exact-origin vectors sit at distance 0 from the
    # kept centroid and reclaim cluster 1.
    assert clusters[0] == 1 and clusters[1] == 1
    assert {r[0] for r in got if r[2] == 0} == {0, 1}  # dist2 == 0 there


def test_kmeans_micro_deterministic(spark, tmp_path):
    sf = _planted_emb(
        spark, tmp_path, [(i, [float((7 * i) % 11), float((3 * i) % 5)]) for i in range(20)]
    )
    a = [tuple(r) for r in QUERIES["embedding_kmeans_micro"](spark, sf).collect()]
    b = [tuple(r) for r in QUERIES["embedding_kmeans_micro"](spark, sf).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# corpus_shard_plan
# ---------------------------------------------------------------------------


def test_shard_plan_hand_computed_boundaries(spark, tmp_path):
    """600-token docs with 1000-token shards: cum_before 0/600/1200/1800
    -> shards 0, 0, 1, 1; a doc straddling a boundary belongs to the
    shard of its FIRST token."""
    sf = _planted_docs(
        spark, tmp_path, [(_tok_doc(600), "en", "s") for _ in range(4)]
    )
    rows = [
        (r["doc_id"], r["cum_before"], r["shard_id"])
        for r in QUERIES["corpus_shard_plan"](spark, sf).collect()
    ]
    assert rows == [(0, 0, 0), (1, 600, 0), (2, 1200, 1), (3, 1800, 1)]


def test_shard_plan_zero_token_docs_and_oracle_parity(spark, tmp_path):
    texts = []
    for i in range(40):
        if i % 7 == 0:
            texts.append(("", "en", "s"))  # zero-token doc
        else:
            texts.append((_tok_doc(37 + (i * 13) % 80), "en", "s"))
    sf = _planted_docs(spark, tmp_path, texts)
    got = [tuple(r) for r in QUERIES["corpus_shard_plan"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "corpus_shard_plan")]
    assert got == want
    # global invariant: cum_before is the running sum in doc_id order
    run = 0
    for doc_id, n_tok, cum_before, shard in got:
        assert cum_before == run
        run += n_tok


# ---------------------------------------------------------------------------
# corpus_unimax_schedule
# ---------------------------------------------------------------------------


def test_unimax_schedule_capped_domain_gets_exact_epoch_cap(spark, tmp_path):
    """A capped domain owes exactly EPOCH_CAP epochs: frac = 0, so every
    doc repeats exactly 4 times regardless of its hash draw."""
    sf = _planted_docs(
        spark,
        tmp_path,
        [(_tok_doc(10), "en", "A")] * 3 + [(_tok_doc(1000), "en", "C")],
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["corpus_unimax_schedule"](spark, sf).collect()
    }
    for d in (0, 1, 2):
        assert rows[d]["domain"] == "A/en" and rows[d]["repeats"] == 4


def test_unimax_schedule_fractional_epochs_bounded_and_matches_oracle(spark, tmp_path):
    """A waterfilled domain with fractional epochs: every repeat count is
    floor(epochs) or floor(epochs)+1, and the whole frame is hash-equal
    to the SQL twin."""
    sf = _planted_docs(
        spark,
        tmp_path,
        [(_tok_doc(40 + 3 * i), "en", "big") for i in range(12)]
        + [(_tok_doc(5), "en", "tiny")],
    )
    got = [tuple(r) for r in QUERIES["corpus_unimax_schedule"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "corpus_unimax_schedule")]
    assert got == want
    plan = {
        r["domain"]: r["epochs_micro"]
        for r in QUERIES["corpus_mixture_unimax"](spark, sf).collect()
    }
    for doc_id, domain, repeats in got:
        lo = plan[domain] // 1_000_000
        assert repeats in (lo, lo + 1)


def test_unimax_schedule_zero_token_domain_zero_repeats(spark, tmp_path):
    sf = _planted_docs(
        spark, tmp_path, [("", "en", "empty"), (_tok_doc(10), "en", "full")]
    )
    rows = {
        r["domain"]: r["repeats"]
        for r in QUERIES["corpus_unimax_schedule"](spark, sf).collect()
    }
    assert rows["empty/en"] == 0


# ---------------------------------------------------------------------------
# docs_gopher_full_gate
# ---------------------------------------------------------------------------


def test_full_gate_is_conjunction_and_matches_components(spark, tmp_path):
    """passes == passes_shape AND passes_repetition, and the repetition
    flag agrees with docs_gopher_repetition row-for-row; the corpus
    includes a doc that passes shape but fails repetition (50+ tokens of
    2-gram spam) and one that passes repetition but fails shape (clean
    but too short)."""
    spammy = " ".join(["the spam and ham"] * 15)  # 60 tokens w/ stopwords, 2-gram spam
    clean_short = "the quick brown fox and a dog"  # passes repetition, < 50 tokens
    clean_long = " ".join(
        f"the w{i} and x{i} of y{i} to z{i}" for i in range(8)
    )  # 64 distinct-ish tokens with stopwords
    sf = _planted_docs(
        spark,
        tmp_path,
        [(spammy, "en", "web"), (clean_short, "en", "web"), (clean_long, "en", "web")],
    )
    full = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["docs_gopher_full_gate"](spark, sf).collect()
    }
    rep = {
        r["doc_id"]: r["passes"]
        for r in QUERIES["docs_gopher_repetition"](spark, sf).collect()
    }
    for d, row in full.items():
        assert row["passes"] == (row["passes_shape"] and row["passes_repetition"])
        assert row["passes_repetition"] == rep[d]
    assert full[0]["passes_shape"] and not full[0]["passes_repetition"]
    assert not full[1]["passes_shape"] and full[1]["passes_repetition"]
    assert full[2]["passes_shape"] and full[2]["passes_repetition"]


def test_full_gate_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, _REP_CORPUS)
    got = [tuple(r) for r in QUERIES["docs_gopher_full_gate"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_gopher_full_gate")]
    assert got == want


# ---------------------------------------------------------------------------
# docs_length_quantiles_hist
# ---------------------------------------------------------------------------


def test_length_quantiles_hist_equals_stamped_row_form(spark, tmp_path):
    """The histogram tier must reproduce the stamped row-window form
    exactly (shared semantics: value at rank ceil(p*n)), including on
    heavy ties."""
    texts = [("x" * (10 + 7 * (i % 5)), ["en", "de"][i % 2], "s") for i in range(37)]
    sf = _planted_docs(spark, tmp_path, texts)
    a = [tuple(r) for r in QUERIES["docs_length_quantiles_hist"](spark, sf).collect()]
    b = [tuple(r) for r in QUERIES["docs_length_quantiles"](spark, sf).collect()]
    assert a == b
    want = [tuple(r) for r in _oracle(sf, "docs_length_quantiles_hist")]
    assert a == want


# ---------------------------------------------------------------------------
# docs_strip_markup
# ---------------------------------------------------------------------------


def test_strip_markup_tags_entities_whitespace(spark, tmp_path):
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            ("<p>hello</p><p>world</p>", "en", "web"),
            ("a &lt;b&gt; &amp;quot; c &#39;d&#39;", "en", "web"),
            ("&amp;lt; stays literal", "en", "web"),  # &amp; decoded LAST
            ("no markup here", "en", "web"),
            (None, "en", "web"),
        ],
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["docs_strip_markup"](spark, sf).collect()
    }
    # tags -> spaces keep the token boundary; whitespace collapsed+trimmed
    assert rows[0]["clean_text"] == "hello world"
    assert rows[0]["n_tag_chars"] == len("<p></p><p></p>")
    # entities decode; &amp; last so '&amp;quot;' -> '&quot;' the TEXT
    assert rows[1]["clean_text"] == 'a <b> &quot; c \'d\''
    assert rows[2]["clean_text"] == "&lt; stays literal"
    # markup-free text passes through byte-identical with zero counts
    assert rows[3]["clean_text"] == "no markup here"
    assert rows[3]["n_tag_chars"] == 0 and rows[3]["n_entity_chars"] == 0
    assert rows[4]["clean_text"] == ""


def test_strip_markup_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            ("<div class='x'>a<br/>b</div> &amp; <span>c</span>", "en", "web"),
            ("plain", "en", "web"),
            ("< not a tag without close", "en", "web"),
            ("a\x0b<b>c</b>\td", "en", "web"),
        ],
    )
    got = [tuple(r) for r in QUERIES["docs_strip_markup"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_strip_markup")]
    assert got == want


# ---------------------------------------------------------------------------
# streaming_quality_gate
# ---------------------------------------------------------------------------


def test_streaming_gate_equals_batch_gate(spark, tmp_path):
    """The drained streaming projection must equal the batch plan
    row-for-row (same _full_gate_cols, append-mode memory sink)."""
    sf = _planted_docs(spark, tmp_path, _REP_CORPUS)
    a = [tuple(r) for r in QUERIES["streaming_quality_gate"](spark, sf).collect()]
    b = [tuple(r) for r in QUERIES["docs_gopher_full_gate"](spark, sf).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# review-r9-3 regression pins
# ---------------------------------------------------------------------------


def test_full_gate_shape_x0b_parity(spark, tmp_path):
    """Review r9-3 item 1: a \\x0B inside a token changes the shape
    token count (Java \\s and the explicit class split it; RE2's \\s
    does not) — both engines must tokenize it identically. Doc 0 has 50
    shape-tokens ONLY IF \\x0B splits; doc 1 is its space twin."""
    body = " ".join(["the"] * 48)
    sf = _planted_docs(
        spark,
        tmp_path,
        [(body + " the\x0bthe", "en", "web"), (body + " the the", "en", "web")],
    )
    got = [tuple(r) for r in QUERIES["docs_gopher_full_gate"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_gopher_full_gate")]
    assert got == want
    rows = {r[0]: r for r in got}
    assert rows[0][1] == rows[1][1]  # passes_shape identical for the twins


def test_unimax_null_source_lang_domain(spark, tmp_path):
    """Review r9-3 item 3: NULL source/lang pin to '' on both engines —
    a NULL source must NOT collide with a same-named lang nor vanish
    from the oracle's equi-join."""
    rows = [
        (0, _tok_doc(10), "en", None, 10),
        (1, _tok_doc(20), None, "en", 20),
        (2, _tok_doc(30), "en", "en", 30),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    got = [tuple(r) for r in QUERIES["corpus_unimax_schedule"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "corpus_unimax_schedule")]
    assert got == want
    doms = {r[0]: r[1] for r in got}
    assert doms[0] == "/en" and doms[1] == "en/" and doms[2] == "en/en"
    plan = [tuple(r) for r in QUERIES["corpus_mixture_unimax"](spark, sf).collect()]
    assert plan == [tuple(r) for r in _oracle(sf, "corpus_mixture_unimax")]


# ---------------------------------------------------------------------------
# seeded adversarial parity sweep (repetition + full gate + markup)
# ---------------------------------------------------------------------------


def _random_corpus(seed=20260816, n=60):
    """Deterministic adversarial texts: tiny vocabulary (forces gram
    repeats), mixed whitespace incl. \\x0B/\\t/\\f/\\r, newlines, space
    padding, NULLs/empties, markup fragments."""
    import random

    rng = random.Random(seed)
    vocab = ["a", "bb", "ccc", "the", "x1", "zz"]
    ws = [" ", "  ", "\t", "\x0b", "\f", "\r", "\n", " \n "]
    out = []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            out.append(None)
        elif kind == 1:
            out.append(rng.choice(["", " ", "\n", "\x0b"]))
        else:
            parts = []
            for _ in range(rng.randrange(1, 120)):
                parts.append(rng.choice(vocab))
                parts.append(rng.choice(ws))
            if kind == 5:
                parts.insert(0, rng.choice(["<p>", "&amp;", "<br/>", "&lt;"]))
            out.append("".join(parts))
    return [(t, "en", "web") for t in out]


@pytest.mark.parametrize(
    "name", ["docs_gopher_repetition", "docs_gopher_full_gate", "docs_strip_markup"]
)
def test_seeded_adversarial_parity(spark, tmp_path, name):
    sf = _planted_docs(spark, tmp_path, _random_corpus())
    got = [tuple(r) for r in QUERIES[name](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, name)]
    assert got == want


# ---------------------------------------------------------------------------
# docs_gopher_repetition_cjk
# ---------------------------------------------------------------------------


def test_cjk_repetition_sees_what_ascii_tier_cannot(spark, tmp_path):
    """An unsegmented repeated-phrase Chinese doc is ONE ws-token (all
    repetition invisible, ASCII tier passes); the CJK tier tokenizes
    per codepoint and fails it on top-2-gram repetition. ASCII docs
    gate identically under both tiers. Plan == oracle on the planted
    mixed corpus (pins the Java $1 / RE2 \\1 backreference parity)."""
    zh_spam = "你好世界" * 12  # 48 codepoints, the same 4 repeating
    ascii_spam = "spam ham " * 10 + "the and of it"
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            (zh_spam, "zh", "web"),
            (ascii_spam, "en", "web"),
            ("深度 learning 模型 rocks 深度 learning", "zh", "web"),
            (None, "zh", "web"),
        ],
    )
    got = [tuple(r) for r in QUERIES["docs_gopher_repetition_cjk"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_gopher_repetition_cjk")]
    assert got == want
    cols = QUERIES["docs_gopher_repetition_cjk"](spark, sf).columns
    cjk = {t[0]: dict(zip(cols, t)) for t in got}  # reuse the collected rows
    ascii_tier = {r["doc_id"]: r.asDict() for r in QUERIES["docs_gopher_repetition"](spark, sf).collect()}
    # doc 0: invisible to the ASCII tier, caught by the CJK tier
    assert ascii_tier[0]["passes"] and not cjk[0]["passes"]
    assert cjk[0]["top_2gram_frac_micro"] > 200000
    # doc 1 (pure ASCII): the tiers agree exactly
    assert cjk[1] == dict(ascii_tier[1])


# ---------------------------------------------------------------------------
# dedup_keep_best_quality
# ---------------------------------------------------------------------------


def test_keep_best_quality_prefers_gate_passing_duplicate(spark, tmp_path):
    """Three exact duplicates where only the gate decides nothing (same
    text), plus a cluster whose members differ in length: the kept doc
    is (passes DESC, n_chars DESC, doc_id ASC)-best, clusters count
    their members, and the frame matches the oracle."""
    clean = " ".join(f"the w{i} and x{i} of y{i} to z{i}" for i in range(8))
    spam = " ".join(["the spam and ham"] * 15)
    sf = _planted_docs(
        spark,
        tmp_path,
        [
            (clean, "en", "web"),   # doc 0: cluster A (3 members)
            (clean, "en", "web"),   # doc 1
            (clean, "en", "web"),   # doc 2
            (spam, "en", "web"),    # doc 3: fails repetition, unique
            ("short one", "en", "web"),  # doc 4: unique, fails shape
        ],
    )
    got = [tuple(r) for r in QUERIES["dedup_keep_best_quality"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "dedup_keep_best_quality")]
    assert got == want
    rows = {r[0]: r for r in got}
    assert set(rows) == {0, 3, 4}  # min-id kept within the equal-text cluster
    assert rows[0][2] == 3 and rows[0][3] is True   # n_members, kept_passes
    assert rows[3][2] == 1 and rows[3][3] is False
    assert rows[4][3] is False
