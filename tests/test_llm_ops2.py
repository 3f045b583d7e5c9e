"""Behavioral tests for the round-2 LLM-pipeline operators (llm_ops2) —
the oracle pair proves cross-engine equality; these pin the semantics."""

from __future__ import annotations

import hashlib

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_text_normalize_is_canonical(spark):
    rows = QUERIES["text_normalize"](spark, SF).collect()
    assert rows
    for r in rows[:50]:
        assert r["norm_text"] == " ".join(r["norm_text"].split())  # collapsed
        assert r["norm_text"] == r["norm_text"].lower()
        assert r["norm_md5"] == hashlib.md5(r["norm_text"].encode()).hexdigest()
        assert r["norm_len"] == len(r["norm_text"])


def test_gopher_gate_consistent_with_metrics(spark):
    rows = QUERIES["docs_gopher_quality"](spark, SF).collect()
    assert rows
    n_pass = 0
    for r in rows:
        want = (
            50 <= r["n_tokens"] <= 100000
            and 2.0 <= r["mean_token_len"] <= 10.0
            and r["n_stop"] >= 2
        )
        assert r["passes"] == want, r
        n_pass += bool(r["passes"])
    # the gate must be a filter, not a constant: both outcomes occur
    assert 0 < n_pass


def test_bigram_logprob_is_negative_and_complete(spark):
    rows = QUERIES["docs_bigram_logprob"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["avg_logprob"] < 0.0  # log of a probability < 1
        assert r["n_bigrams"] >= 1


def test_pii_scan_finds_planted_pii(spark):
    rows = {r["doc_id"]: r for r in QUERIES["docs_pii_scan"](spark, SF).collect()}
    assert rows
    for doc_id, r in rows.items():
        # synthetic corpus is PII-free; exactly the injected items match
        assert r["n_emails"] == (1 if doc_id % 5 == 0 else 0)
        assert r["n_ips"] == (1 if doc_id % 7 == 0 else 0)
    # redaction changes the text iff something matched
    md5s = {r["redacted_md5"] for r in rows.values()}
    assert len(md5s) == len(rows)  # all docs distinct post-redaction


def test_chunk_windows_cover_all_tokens(spark):
    """Every token of every doc lands in at least one chunk; consecutive
    chunks overlap by exactly 8 tokens (except the truncated tail)."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    chunks = QUERIES["docs_chunk_windows"](spark, SF)
    docs = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("tok_in_chunks"),
        F.max("n_tokens").alias("max_chunk"),
    )
    j = per_doc.join(docs, "doc_id").collect()
    assert j
    for r in j:
        assert r["max_chunk"] <= 32
        # stride 24 windows over n tokens: full coverage means the summed
        # chunk sizes equal n + 8 * (n_chunks - 1) (each overlap counted twice)
        assert r["tok_in_chunks"] == r["n"] + 8 * (r["n_chunks"] - 1), r


def test_mixing_weights_normalize(spark):
    rows = QUERIES["corpus_mixing_weights"](spark, SF).collect()
    assert rows
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # weight * share == uniform target share (up to rounding)
        assert abs(r["uniform_weight"] * r["token_share"] - 1.0 / len(rows)) < 1e-3


def test_dedup_survivors_is_a_partition_of_docs(spark):
    """Survivors' `replaces` counts must sum to the corpus size, and every
    survivor is its own cluster's minimum doc_id."""
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    surv = QUERIES["dedup_survivors"](spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["replaces"] for r in surv) == n_docs
    assert len(surv) <= n_docs
    assert any(r["replaces"] > 1 for r in surv)  # fixture has near-dups


def test_quantized_search_tiers_recall_vs_float(spark):
    """int8 and sign-bit search must be APPROXIMATIONS of the float
    ranking, not noise: require recall@10 floors against the exact cosine
    top-10 (int8 preserves dot products closely -> high floor; 64-bit sign
    sketches are coarse -> lower floor)."""
    exact = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["similarity_topk_bruteforce"](spark, SF).collect()
    }
    int8 = {
        (r["q_id"], r["n_id"]) for r in QUERIES["similarity_topk_int8"](spark, SF).collect()
    }
    ham = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["similarity_topk_hamming"](spark, SF).collect()
    }
    n_queries = len({q for q, _ in exact})
    assert len(int8 & exact) / len(exact) >= 0.5, "int8 recall collapsed"
    assert len(ham & exact) / len(exact) >= 0.1, "hamming recall collapsed"
    assert len(ham) == 10 * n_queries
