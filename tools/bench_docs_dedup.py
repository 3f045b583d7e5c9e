"""Dedup/ANN/text scale-stress over the controlled-duplication corpora
(tools/make_big_docs.py): the text-side companion to bench_scale.py.

Two groups, by scale contract:

- **k-independent plans** run straight from the registry at both scales —
  their blocking (minhash bands, LSH buckets, hash groups, PQ codes,
  windowed n-grams) adapts to n by construction.
- **centroid-blocked plans** (SemDeDup, the leakage scan) are measured
  with k SCALED as their contract requires (k ~ n/target_cell: the
  registered k=16 artifact at the small scale, k = 16*factor at the big
  scale, same seed family). Running them with k fixed at 100x the data
  would measure a configuration their own docstrings forbid — cell size,
  and therefore the within-cell pair term per row, must stay bounded.

Usage: python tools/bench_docs_dedup.py [small_dir] [big_dir] [factor]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark

K_INDEPENDENT = [
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_exact_docs",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_topk_ivfpq",
    "docs_repeated_spans",
    "text_quality",
    "doc_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    # round-8 addition (interval-form ExactSubstr cleaning; gram shuffle
    # measured 98.4x records at 100x data)
    "docs_exactsubstr_clean",
    # round-9 additions: DSIR two-pass importance weights, n-gram
    # benchmark decontamination, the CJK-aware Gopher gate
    "dsir_importance_weights",
    "docs_decontaminate_ngram",
    "docs_gopher_quality_cjk",
    # round-9 extension: line-wise corpus dedup (hash-keyed line stream),
    # SoftDeDup commonness (exact two-pass + hashed broadcast tiers),
    # and the distinct-word BPE corpus encoder
    "docs_line_dedup",
    "docs_softdedup_weights",
    "docs_softdedup_weights_hashed",
    "corpus_bpe_encode",
    # round-9 third session: Gopher repetition rules (zero-shuffle Arrow
    # kernel; dup-line / top-n-gram / dup-5-gram-union counts per doc),
    # integer-exact Lloyd k-means (K fixed by contract), and the
    # distributed-prefix-sum shard planner
    "docs_gopher_repetition",
    "embedding_kmeans_micro",
    "corpus_shard_plan",
    "docs_gopher_full_gate",
    "docs_gopher_repetition_cjk",
    "dedup_keep_best_quality",
    # round-6 additions (all blocking adapts to n by construction)
    "docs_quality_classifier",
    "dedup_jaccard_prefix_filter",
    "docs_chunk_dedup_stats",
    "corpus_inverted_index",
    "text_bm25_topk",
    "similarity_range_query",
    "similarity_mmr_rerank",
    "similarity_hard_negatives",
    "embedding_pca_project",
    "corpus_coreset_kcenter",
    # round-11 additions: external-LM CCNet scoring (bounded broadcast
    # LM from the held-out slice), Bloom paragraph dedup (128 KB packed
    # bitset, k broadcast joins — NB the registered fixture-sized m
    # saturates at the big corpus; this times the plan shape, and
    # production sizes m ~16 bits/paragraph per shard), and the
    # late-added xxhash64 CCNet bucket tier (the production hash)
    "docs_ccnet_ppl_score_external",
    "docs_bloom_paragraph_dedup",
    "docs_ccnet_ppl_buckets_fast",
    "docs_ccnet_ppl_score_external_perlang",
    # round-12 additions: the composed production funnel (Bloom clean ->
    # per-lang CCNet -> selection -> quality gates) and the cross-shard
    # Bloom merge (per-shard filters OR-merged, third shard probed)
    "corpus_prep_funnel4_bloom",
    "docs_bloom_merge_shards",
    # round-12 second session (llm_ops15): KN bigram LM exact tier
    # (windows over the aggregated pairs frame — grows with bigram
    # TYPES, the contrast the bucketed tier exists to remove), the
    # 2^20-bucketed KN tier (type-capped), the per-lang KN document
    # scorer (bounded broadcast LM tables), the Matryoshka two-stage
    # retrieval (prefix coarse pass + |Q|*100 rescore), and the
    # per-domain quality median cut (histogram-side window)
    "corpus_bigram_lm_kn",
    "corpus_trigram_lm_kn",
    "corpus_bigram_lm_kn_bucketed",
    "corpus_bigram_lm_kn_fast",
    "docs_ccnet_ppl_score_kn",
    "similarity_topk_matryoshka",
    "docs_quality_domain_cut",
    # streaming incremental Bloom dedup: the whole streaming run
    # executes at plan construction (stage shards -> stream -> land),
    # so it MUST be thunk-timed (EAGER_PLANS)
    "streaming_bloom_paragraph_dedup",
    # unigram-LM EM step + Viterbi encoder: seed-piece collect + E-step
    # materialization run at construction — thunk-timed
    "corpus_unigram_lm_em",
    "corpus_unigram_encode",
]


#: plans whose CONSTRUCTION runs eager Spark jobs (fitted artifacts:
#: k-means centroid init + Lloyd-round aggregation). Passing their
#: DataFrame into _time would leave that work outside the timed region
#: and understate the scale ratio — these are timed as thunks that
#: rebuild the plan (and so re-run the eager jobs) every pass.
#: also thunk-timed: plans whose internal localCheckpoint(eager=False)
#: would otherwise be materialized once in the warm pass and silently
#: reused by the timed pass (r10: the checkpoint covers the whole heavy
#: chain in these two — a DataFrame-reuse measurement would time only
#: the post-checkpoint tail)
EAGER_PLANS = {
    "embedding_kmeans_micro",
    "docs_ccnet_ppl_buckets",
    "docs_ccnet_ppl_buckets_hashed",
    "docs_ccnet_ppl_score_external",
    "docs_ccnet_ppl_buckets_fast",
    "docs_ccnet_ppl_score_external_perlang",
    # ADVICE r11: the Bloom tiers run a construction-time sizing
    # ref.count() AND wrap the whole paragraph-extraction chain in an
    # internal localCheckpoint(eager=False) — DataFrame-reuse timing
    # would let the warm pass materialize the checkpoint and the timed
    # pass silently read it, understating tokenize/explode cost (the
    # exact r10 hazard this set documents). Thunk-timed like the rest.
    "docs_bloom_paragraph_dedup",
    "docs_bloom_paragraph_clean",
    # r12: same checkpoint+sizing-count shape as the single-shard tiers
    "corpus_prep_funnel4_bloom",
    "docs_bloom_merge_shards",
    # r12 second session: the streaming run executes eagerly at plan
    # construction (shard staging + the stream itself); the unigram EM
    # step collects its seed inventory and materializes the E-step
    # checkpoint at construction
    "streaming_bloom_paragraph_dedup",
    "corpus_unigram_lm_em",
    "corpus_unigram_encode",
}


def _time(df, warms: int = 1) -> float:
    """df: a DataFrame, or a zero-arg callable returning one (thunk form
    for EAGER_PLANS — construction is part of the measured cost)."""
    mk = df if callable(df) else (lambda: df)
    for _ in range(warms):
        mk().write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    mk().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _calib() -> float:
    """Single-thread Python work loop — the house co-tenant-load marker."""
    import time as _t

    t0 = _t.perf_counter()
    x = 0
    for i in range(2_000_000):
        x ^= hash((i, i * 31))
    return round(_t.perf_counter() - t0, 3)


def main() -> None:
    # --only NAME runs a single registry plan and exits: the r8 sweep
    # discovered that measuring many plans in ONE session contaminates
    # later readings (accumulated checkpoint RDD blocks + GC: 51 s vs
    # 7.4 s on the same plan — SCALING.md r8 methodology note), so the
    # round-of-record sweep drives this tool once per plan in fresh
    # subprocesses.
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1]
        del argv[i : i + 2]
    small = argv[0] if len(argv) > 0 else "/tmp/docs_scale/small"
    big = argv[1] if len(argv) > 1 else "/tmp/docs_scale/big"
    factor = int(argv[2]) if len(argv) > 2 else 100
    spark = get_spark("bench-docs")
    if only is not None:
        if only in ("dedup_semantic_clusters", "split_leakage_scan"):
            from etl_from_s3_to_postgresql_template_spark.operators.intquant import int8_centroids
            from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import _leak_blocked_pairs
            from etl_from_s3_to_postgresql_template_spark.plans.llm_ops5 import semantic_dedup_frame

            fn = (
                semantic_dedup_frame
                if only == "dedup_semantic_clusters"
                else _leak_blocked_pairs
            )
            t = {
                "calib": _calib(),
                "small": _time(fn(spark, small, centroids=int8_centroids(16)), warms=2),
                "big": _time(fn(spark, big, centroids=int8_centroids(16 * factor)), warms=2),
            }
            label = f"{only} (k 16->{16 * factor})"
        else:
            # fresh-session steady state needs TWO warm passes (JIT +
            # Python-worker ramp; one warm measured 2.3x the steady wall)
            def _arg(d, name=only):
                if name in EAGER_PLANS:
                    return lambda: QUERIES[name](spark, d)
                return QUERIES[name](spark, d)

            t = {
                "calib": _calib(),
                "small": _time(_arg(small), warms=2),
                "big": _time(_arg(big), warms=2),
            }
            label = only
        t["ratio"] = round(t["big"] / t["small"], 2)
        print(json.dumps({label: t}), flush=True)
        return
    out = {}
    for name in K_INDEPENDENT:
        def _arg(d, name=name):
            if name in EAGER_PLANS:
                return lambda: QUERIES[name](spark, d)
            return QUERIES[name](spark, d)

        t = {
            "small": _time(_arg(small)),
            "big": _time(_arg(big)),
        }
        t["ratio"] = round(t["big"] / t["small"], 2)
        out[name] = t
        print(json.dumps({name: t}), flush=True)

    from etl_from_s3_to_postgresql_template_spark.operators.intquant import int8_centroids
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import _leak_blocked_pairs
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops5 import semantic_dedup_frame

    k_small, k_big = 16, 16 * factor
    for name, fn in (
        ("dedup_semantic_clusters", semantic_dedup_frame),
        ("split_leakage_scan", _leak_blocked_pairs),
    ):
        t = {
            "small": _time(fn(spark, small, centroids=int8_centroids(k_small))),
            "big": _time(fn(spark, big, centroids=int8_centroids(k_big))),
        }
        t["ratio"] = round(t["big"] / t["small"], 2)
        out[f"{name} (k {k_small}->{k_big})"] = t
        print(json.dumps({f"{name} (k {k_small}->{k_big})": t}), flush=True)

    ratios = sorted(v["ratio"] for v in out.values())
    print(
        json.dumps({"median_ratio": ratios[len(ratios) // 2], "data_factor": factor}),
        flush=True,
    )


if __name__ == "__main__":
    main()
