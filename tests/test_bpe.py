"""BPE fit: reference equality on planted corpora (ties, overlaps,
early stop), encoder behavior, determinism."""

from __future__ import annotations

from etl_from_s3_to_postgresql_template_spark.operators.bpe import (
    encode_word,
    fit_bpe_merges,
    word_frequencies,
)
from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

SF001 = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_single_merge_and_stop(spark):
    merges = fit_bpe_merges(_docs(spark, ["ab ab ab"]), n_merges=5, min_count=2)
    assert merges == [("a", "b", 3)]  # after the merge no pair remains


def test_overlap_counting_and_nonoverlapping_merge(spark):
    """'aaa' contributes (a,a) twice to the count (overlaps count), but
    merging is left-to-right non-overlapping: aaa -> (aa, a)."""
    merges = fit_bpe_merges(_docs(spark, ["aaa aaa"]), n_merges=5, min_count=2)
    assert merges == [("a", "a", 4), ("aa", "a", 2)]


def test_tie_break_lexicographic(spark):
    """Equal support -> lexicographically smallest (left, right) merges
    first; the runner-up merges next."""
    merges = fit_bpe_merges(_docs(spark, ["ab cd ab cd"]), n_merges=2, min_count=2)
    assert merges == [("a", "b", 2), ("c", "d", 2)]


def test_min_count_stops_early(spark):
    merges = fit_bpe_merges(_docs(spark, ["ab cd ef"]), n_merges=5, min_count=2)
    assert merges == []  # every pair is a hapax


def test_merged_symbols_compose(spark):
    """Successive merges build longer units: 'abab abab' learns (a,b)
    then (ab,ab)."""
    merges = fit_bpe_merges(_docs(spark, ["abab abab abab"]), n_merges=5, min_count=2)
    assert merges[0] == ("a", "b", 6)
    assert merges[1] == ("ab", "ab", 3)


def test_encode_word_applies_merges_in_order(spark):
    merges = fit_bpe_merges(_docs(spark, ["abab abab abab"]), n_merges=5, min_count=2)
    assert encode_word("abab", merges) == ["abab"]
    assert encode_word("aba", merges) == ["ab", "a"]
    assert encode_word("xy", merges) == ["x", "y"]  # unseen stays chars


def test_fit_is_deterministic_on_fixture(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    a = fit_bpe_merges(docs, n_merges=8)
    b = fit_bpe_merges(docs, n_merges=8)
    assert a == b and len(a) == 8


def test_registered_entry_monotone_support(spark):
    """Merge support is non-increasing in rank ONLY within equal symbol
    lengths in general BPE, but the registry entry must at least produce
    the declared schema, unique ranks, and step-1 == the pair-stats
    argmax (the oracle gate checks the value cross-engine)."""
    rows = QUERIES["corpus_bpe_merges"](spark, SF001).collect()
    assert rows and [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    gate = QUERIES["corpus_bpe_first_merge_gate"](spark, SF001).collect()
    assert len(gate) == 1
    assert (gate[0]["left_sym"], gate[0]["right_sym"]) == (rows[0]["left"], rows[0]["right"])


def test_word_frequencies_cap_is_deterministic(spark):
    vf = word_frequencies(_docs(spark, ["b b a a c"]), max_vocab=2).collect()
    assert [(r["word"], r["freq"]) for r in vf] == [("a", 2), ("b", 2)]


def test_gate_uncapped_fit_matches_oracle_on_high_cardinality(spark, tmp_path):
    """The driver-gate contract (VERDICT r6 item 7): the gate fits with
    max_vocab=None because its oracle counts bigrams over ALL word
    occurrences. Planted divergence corpus: one hot word whose bigram
    ('aa') wins WITHIN any small capped vocabulary, and a long tail of
    distinct rare words that collectively make 'zz' the true corpus-wide
    argmax. The uncapped fit must agree with the DuckDB oracle ('zz');
    the capped fit provably picks the wrong pair — the exact drift the
    None cap closes."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops6 import (
        _BPE_GATE_ORACLE,
    )

    # 'aa' appears in one word with frequency 5 -> support 5
    # 'zz' appears once in each of 10 DISTINCT rare words -> support 10
    texts = ["aa aa aa aa aa"] + [f"w{i}zz" for i in range(10)]
    docs = _docs(spark, texts)
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")

    uncapped = fit_bpe_merges(docs, n_merges=1, min_count=1, max_vocab=None)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = con.execute(_BPE_GATE_ORACLE).fetchall()
    assert [(l, r, c) for l, r, c in uncapped[:1]] == [tuple(w) for w in want]
    assert uncapped[0][:2] == ("z", "z") and uncapped[0][2] == 10

    # a vocabulary cap smaller than the tail demonstrably diverges:
    # top-1-by-frequency keeps only the 'aa' word, so the capped fit's
    # first merge is (a, a) — NOT the corpus-wide argmax
    capped = fit_bpe_merges(docs, n_merges=1, min_count=1, max_vocab=1)
    assert capped[0][:2] == ("a", "a")
