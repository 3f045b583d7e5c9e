"""URL stage + DoReMi reweighting (plans/llm_ops12.py): tricky-URL
canonicalization pins on BOTH engines, hand-computed dedup merges and
registered-domain extraction, multiplicative-weights properties
(direction, uniform fixpoint, zero-token domain), and DuckDB oracle
parity on planted corpora."""

from __future__ import annotations

import duckdb

from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES
from etl_from_s3_to_postgresql_template_spark.plans.llm_ops12 import (
    norm_url_col,
    norm_url_sql,
)

from pyspark.sql import functions as F


def _planted_docs(spark, tmp_path, rows3):
    sf = str(tmp_path)
    rows = [(i, t, lang, src, len(t or "")) for i, (t, lang, src) in enumerate(rows3)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _planted_docs_ids(spark, tmp_path, doc_ids):
    sf = str(tmp_path)
    rows = [(i, f"text {i}", "en", "web", 7) for i in doc_ids]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _oracle(sf, name, table="documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf}/{table}.parquet/*.parquet')"
    )
    return con.execute(ORACLE[name]).fetchall()


# ---------------------------------------------------------------------------
# canonicalization chain — tricky URLs, both engines, hand-expected
# ---------------------------------------------------------------------------

_TRICKY = [
    # (raw, canonical)
    ("http://host:80", "http://host"),  # port, no path: optional-tail group
    ("HTTPS://WWW.X.COM:443/", "https://x.com"),  # case+www+port+root slash
    ("http://a.b/c?utm_a=1&utm_b=2&id=3", "http://a.b/c?id=3"),  # leading utm run
    ("http://a.b/c?utm_only=1", "http://a.b/c"),  # utm is the whole query
    ("http://a.b/c/#frag", "http://a.b/c"),  # fragment then trailing slash
    ("http://a.b/C/D", "http://a.b/C/D"),  # path case preserved
    ("https://a.b:8443/x", "https://a.b:8443/x"),  # non-default port kept
    ("http://a.b/x?id=1&utm_z=9", "http://a.b/x?id=1"),  # trailing utm
    ("http://www.a.b/", "http://a.b"),  # www + root
]


def test_norm_url_spark_hand_expected(spark):
    df = spark.createDataFrame([(r,) for r, _ in _TRICKY], "url string")
    got = [r[0] for r in df.select(norm_url_col(F.col("url"))).collect()]
    assert got == [want for _, want in _TRICKY]


def test_norm_url_duckdb_matches_spark_on_tricky():
    con = duckdb.connect()
    for raw, want in _TRICKY:
        got = con.execute(f"SELECT {norm_url_sql(repr(raw))}").fetchone()[0]
        assert got == want, (raw, got, want)


# ---------------------------------------------------------------------------
# docs_url_normalize_dedup
# ---------------------------------------------------------------------------


def test_url_dedup_v0_v1_merge(spark, tmp_path):
    """doc 0 (v0, messy) and doc 91 (v1, clean) share (k, j) = (0, 0):
    one canonical group, n_raw 2, kept doc 0."""
    sf = _planted_docs_ids(spark, tmp_path, [0, 91])
    rows = {r["norm_url"]: r for r in QUERIES["docs_url_normalize_dedup"](spark, sf).collect()}
    key = "http://site0.example.org/Path/0?id=0"
    assert set(rows) == {key}
    assert rows[key]["n_raw"] == 2 and rows[key]["first_doc"] == 0


def test_url_dedup_variants_stay_distinct(spark, tmp_path):
    """v2 (https + index.html), v3 (https), v4 (:8080) never merge with
    v0/v1 even at equal (k, j)."""
    sf = _planted_docs_ids(spark, tmp_path, [0, 1, 2, 3, 4])
    urls = sorted(
        r["norm_url"] for r in QUERIES["docs_url_normalize_dedup"](spark, sf).collect()
    )
    assert len(urls) == 5  # all (k,j) differ here; shapes also differ
    assert any(":8080" in u for u in urls)
    assert any("/index.html" in u for u in urls)
    assert not any("utm" in u or "#" in u or "www." in u for u in urls)


def test_url_dedup_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_docs_ids(spark, tmp_path, list(range(200)))
    got = [tuple(r) for r in QUERIES["docs_url_normalize_dedup"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_url_normalize_dedup")]
    assert got == want


# ---------------------------------------------------------------------------
# docs_url_blocklist_gate
# ---------------------------------------------------------------------------


def test_blocklist_registered_domains_hand_computed(spark, tmp_path):
    sf = _planted_docs_ids(spark, tmp_path, [0, 1, 2, 4])
    rows = {r["doc_id"]: r for r in QUERIES["docs_url_blocklist_gate"](spark, sf).collect()}
    assert rows[0]["host"] == "site0.example.org"
    assert rows[0]["registered_domain"] == "example.org" and not rows[0]["blocked"]
    assert rows[1]["registered_domain"] == "tracker.net" and rows[1]["blocked"]
    # multi-label suffix: co.uk (2 labels) must beat uk (1 label)
    assert rows[2]["host"] == "sub2.shop.co.uk"
    assert rows[2]["registered_domain"] == "shop.co.uk" and rows[2]["blocked"]
    assert rows[4]["registered_domain"] == "media.io" and not rows[4]["blocked"]


def test_blocklist_matches_oracle_on_planted(spark, tmp_path):
    sf = _planted_docs_ids(spark, tmp_path, list(range(100)))
    got = [tuple(r) for r in QUERIES["docs_url_blocklist_gate"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_url_blocklist_gate")]
    assert got == want


# ---------------------------------------------------------------------------
# corpus_mixture_doremi
# ---------------------------------------------------------------------------


def test_doremi_upweights_harder_domain(spark, tmp_path):
    """Domain A: long words (high chars/token -> positive excess);
    domain B: short words. MW must end with weight(A) > weight(B), and
    the smoothed mixture must stay a near-simplex in micro units."""
    rows = [("abcdefghij " * 20, "en", "hard")] * 5 + [("a b " * 40, "en", "easy")] * 5
    sf = _planted_docs(spark, tmp_path, rows)
    out = {r["domain"]: r for r in QUERIES["corpus_mixture_doremi"](spark, sf).collect()}
    hard, easy = out["hard/en"], out["easy/en"]
    assert hard["excess_micro"] > 0 > easy["excess_micro"]
    assert hard["weight_micro"] > easy["weight_micro"]
    total_mix = sum(r["mixture_micro"] for r in out.values())
    assert 999_990 <= total_mix <= 1_000_000  # truncation-only slack


def test_doremi_uniform_corpus_is_fixpoint(spark, tmp_path):
    """Identical text in every domain -> all excess 0 (m = 0 path) ->
    weights exactly uniform."""
    rows = [("same text here", "en", f"d{i % 3}") for i in range(9)]
    sf = _planted_docs(spark, tmp_path, rows)
    out = QUERIES["corpus_mixture_doremi"](spark, sf).collect()
    assert len(out) == 3
    assert len({r["weight_micro"] for r in out}) == 1
    assert all(r["excess_micro"] == 0 for r in out)


def test_doremi_zero_token_domain(spark, tmp_path):
    rows = [("", "en", "empty"), ("words here now", "en", "full")]
    sf = _planted_docs(spark, tmp_path, rows)
    out = {r["domain"]: r for r in QUERIES["corpus_mixture_doremi"](spark, sf).collect()}
    assert out["empty/en"]["lambda_micro"] == 0
    assert out["empty/en"]["n_tokens"] == 0


def test_doremi_matches_oracle_on_planted(spark, tmp_path):
    rows = [
        (("word " * (3 + i % 11) + "longerword" * (i % 4)), f"l{i % 2}", f"s{i % 5}")
        for i in range(60)
    ] + [(None, None, None), ("", "en", "web")]
    sf = _planted_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in QUERIES["corpus_mixture_doremi"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "corpus_mixture_doremi")]
    assert got == want


# ---------------------------------------------------------------------------
# docs_strip_markup_fused — the production tier must equal the codegen
# tier ROW FOR ROW on real markup (the 500k corpus is markup-free, so
# the cross-tier guarantee lives here)
# ---------------------------------------------------------------------------

_HTML_DOCS = [
    ("<p>a</p><p>b</p>", "en", "web"),  # tag removal keeps token boundary
    ("x &amp;lt; y &amp; z", "en", "web"),  # &amp; decoded LAST
    ("<a href='q'>link</a>\t\ntext\x0Bmore", "en", "web"),  # ws incl \x0B
    ("  <b>lead</b> and trail  ", "en", "web"),
    ("&lt;notatag&gt; &quot;q&quot; &#39;s&#39;", "en", "web"),
    ("plain text, no markup at all", "en", "web"),
    (None, None, None),
    ("", "en", "web"),
    ("<unclosed tag never ends", "en", "web"),  # no '>' -> nothing removed
]


def test_strip_fused_equals_codegen_tier_on_html(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, _HTML_DOCS)
    fused = [tuple(r) for r in QUERIES["docs_strip_markup_fused"](spark, sf).collect()]
    codegen = [tuple(r) for r in QUERIES["docs_strip_markup"](spark, sf).collect()]
    assert fused == codegen


def test_strip_fused_matches_oracle_on_html(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, _HTML_DOCS)
    got = [tuple(r) for r in QUERIES["docs_strip_markup_fused"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_strip_markup_fused")]
    assert got == want


def test_strip_fused_hand_computed(spark, tmp_path):
    sf = _planted_docs(spark, tmp_path, [("<p>a</p> &amp;lt; <b>c</b>", "en", "web")])
    r = QUERIES["docs_strip_markup_fused"](spark, sf).collect()[0]
    assert r.clean_text == "a &lt; c"
    assert r.n_tag_chars == 14  # <p> </p> <b> </b>
    assert r.n_entity_chars == 4  # '&amp;' -> '&'


# ---------------------------------------------------------------------------
# corpus_prep_funnel_web — composition must equal its components
# ---------------------------------------------------------------------------


def test_funnel_web_composition_matches_components(spark, tmp_path):
    """Survivors = not-blocked AND token-gate AND first-of-clean-text —
    recomputed from the component entries, row for row."""
    rows = [("<p>hello world one</p>", "en", "web")] * 3 + [
        ("plain doc %d words here" % i, "en", "web") for i in range(12)
    ] + [("tiny", "en", "web")]  # 1 token -> fails the gate
    sf = _planted_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["corpus_prep_funnel_web"](spark, sf).collect()}
    gate = {r["doc_id"]: r for r in QUERIES["docs_url_blocklist_gate"](spark, sf).collect()}
    strip = {r["doc_id"]: r for r in QUERIES["docs_strip_markup_fused"](spark, sf).collect()}
    seen = set()
    expect = {}
    for i in sorted(strip):
        if gate[i]["blocked"]:
            continue
        clean = strip[i]["clean_text"]
        ntok = len(clean.split())
        if not (3 <= ntok <= 100_000):
            continue
        if clean in seen:
            continue
        seen.add(clean)
        expect[i] = (gate[i]["registered_domain"], ntok)
    assert {i: (r["registered_domain"], r["n_tok"]) for i, r in out.items()} == expect
    # the three <p>hello world one</p> duplicates: doc 1 is blocked
    # (tracker.net), docs 0 and 2 dedup on CLEANED text -> only doc 0
    assert 0 in out and 1 not in out and 2 not in out


def test_funnel_web_matches_oracle_on_planted(spark, tmp_path):
    rows = [
        ("<b>dup</b> text body here", "en", "web"),
        ("dup text body here", "en", "web"),  # post-strip duplicate of 0
    ] + [(f"doc {i} alpha beta gamma", "en", "web") for i in range(2, 40)]
    sf = _planted_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in QUERIES["corpus_prep_funnel_web"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "corpus_prep_funnel_web")]
    assert got == want


# ---------------------------------------------------------------------------
# docs_ccnet_ppl_buckets
# ---------------------------------------------------------------------------


def test_ccnet_buckets_sizes_and_order(spark, tmp_path):
    """30 docs, one lang, distinct scores -> exact 10/10/10 split with
    head holding the HIGHEST log-prob (lowest perplexity) docs."""
    # repeated common bigrams score high; rare word-salad scores low
    rows = []
    for i in range(30):
        if i < 10:
            rows.append(("the cat sat on the mat " * 5, "en", "web"))
        elif i < 20:
            rows.append((f"the cat sat on uniq{i} mat " * 3, "en", "web"))
        else:
            rows.append((f"zq{i} xv{i} qq{i} jj{i} ww{i} kk{i}", "en", "web"))
    sf = _planted_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["docs_ccnet_ppl_buckets"](spark, sf).collect()}
    assert len(out) == 30
    by_bucket = {}
    for r in out.values():
        by_bucket.setdefault(r["bucket"], []).append(r["lp"])
    assert {b: len(v) for b, v in by_bucket.items()} == {"head": 10, "middle": 10, "tail": 10}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"]) >= min(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])


def test_ccnet_buckets_ties_go_to_better_bucket(spark, tmp_path):
    """All docs identical -> one score value -> threshold semantics put
    EVERY doc in head (ties at the cut are included, never split)."""
    rows = [("same words repeated here", "en", "web")] * 9
    sf = _planted_docs(spark, tmp_path, rows)
    out = QUERIES["docs_ccnet_ppl_buckets"](spark, sf).collect()
    assert len(out) == 9 and all(r["bucket"] == "head" for r in out)


def test_ccnet_buckets_per_lang_and_short_docs_excluded(spark, tmp_path):
    rows = [
        ("the cat sat on the mat again and again", "en", "web"),
        ("one", "en", "web"),  # < 2 tokens -> no bigrams -> excluded
        ("der hund lief durch den wald der hund", "de", "web"),
        (None, "fr", "web"),  # empty -> excluded
    ]
    sf = _planted_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["docs_ccnet_ppl_buckets"](spark, sf).collect()}
    assert set(out) == {0, 2}
    assert out[0]["lang"] == "en" and out[2]["lang"] == "de"


def test_ccnet_buckets_match_oracle_on_planted(spark, tmp_path):
    rows = [
        ((("common words here " * (1 + i % 5)) + f"rare{i % 7} " * (i % 3)),
         f"l{i % 2}", "web")
        for i in range(50)
    ] + [(None, None, None)]
    sf = _planted_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in QUERIES["docs_ccnet_ppl_buckets"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_ccnet_ppl_buckets")]
    assert got == want


# ---------------------------------------------------------------------------
# _ratio_micro — the overflow-free (1e6 * c) div t (review r10)
# ---------------------------------------------------------------------------

from etl_from_s3_to_postgresql_template_spark.plans.llm_ops12 import _ratio_micro


def test_ratio_micro_identity_in_range(spark):
    rows = [
        (c, t)
        for c in [0, 1, 7, 999_999, 10**12, 9_223_372_036_854]
        for t in [1, 2, 3, 97, 10**9]
    ]
    df = spark.createDataFrame(rows, "c long, t long")
    bad = df.selectExpr(
        f"{_ratio_micro('c', 't', 'div')} AS decomp",
        "(1000000 * c) div t AS naive",
    ).filter("decomp <> naive")
    assert bad.count() == 0


def test_ratio_micro_exact_past_naive_overflow(spark):
    """100 TB scale: c = 1e14 chars, t = 2.5e13 tokens — 1e6 * c wraps
    int64; the decomposed form returns the true quotient on Spark, and
    the DuckDB spelling agrees."""
    import duckdb as _duck

    c, t = 100_000_000_000_000, 25_000_000_000_000
    true = c * 1_000_000 // t
    df = spark.createDataFrame([(c, t)], "c long, t long")
    naive, decomp = df.selectExpr(
        "(1000000 * c) div t AS n", f"{_ratio_micro('c', 't', 'div')} AS d"
    ).first()
    assert decomp == true and naive != true
    got = _duck.connect().execute(
        f"SELECT {_ratio_micro(str(c), str(t), '//')}"
    ).fetchone()[0]
    assert got == true


# ---------------------------------------------------------------------------
# docs_ccnet_ppl_buckets_hashed — production tier
# ---------------------------------------------------------------------------


def test_ccnet_hashed_matches_exact_on_planted(spark, tmp_path):
    """At planted scale (hundreds of distinct bigrams vs 2^20 buckets)
    collisions are absent, so the hashed tier must reproduce the exact
    tier row for row."""
    rows = []
    for i in range(30):
        if i < 10:
            rows.append(("the cat sat on the mat " * 5, "en", "web"))
        elif i < 20:
            rows.append((f"the cat sat on uniq{i} mat " * 3, "en", "web"))
        else:
            rows.append((f"zq{i} xv{i} qq{i} jj{i} ww{i} kk{i}", "en", "web"))
    sf = _planted_docs(spark, tmp_path, rows)
    hashed = [tuple(r) for r in QUERIES["docs_ccnet_ppl_buckets_hashed"](spark, sf).collect()]
    exact = [tuple(r) for r in QUERIES["docs_ccnet_ppl_buckets"](spark, sf).collect()]
    assert hashed == exact


def test_ccnet_hashed_matches_oracle_on_planted(spark, tmp_path):
    rows = [
        ((("common words here " * (1 + i % 5)) + f"rare{i % 7} " * (i % 3)),
         f"l{i % 2}", "web")
        for i in range(50)
    ] + [(None, None, None)]
    sf = _planted_docs(spark, tmp_path, rows)
    got = [tuple(r) for r in QUERIES["docs_ccnet_ppl_buckets_hashed"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "docs_ccnet_ppl_buckets_hashed")]
    assert got == want
