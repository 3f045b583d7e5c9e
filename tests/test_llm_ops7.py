"""Round-6 ops: classifier fold parity, PPJoin losslessness + integer
boundary, MMR reference equality + dot-parity pin, range-search
losslessness, covariance-vs-numpy, PCA fit properties."""

from __future__ import annotations

import math

import numpy as np
import pytest

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _planted_docs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _planted_embeddings(spark, tmp_path, vecs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


# ---------------------------------------------------------------------------
# docs_quality_classifier
# ---------------------------------------------------------------------------


def _ref_margin(text: str) -> float | None:
    """Pure-Python reference: md5-bucket weights, sequential-fold mean."""
    import hashlib

    toks = [t for t in text.strip().lower().split() if t]
    if not toks:
        return None
    acc = 0.0
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        acc += ((h % 2001) - 1000) / 1000.0
    return -0.02 + acc / len(toks)


def test_classifier_matches_reference_and_handles_empties(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",  # empty -> NULL margin/keep
        "   \t  ",  # whitespace-only -> NULL
        "single",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    ]
    sf = _planted_docs(spark, tmp_path, texts)
    rows = {r["doc_id"]: r for r in QUERIES["docs_quality_classifier"](spark, sf).collect()}
    for i, t in enumerate(texts):
        ref = _ref_margin(t)
        if ref is None:
            assert rows[i]["quality_margin"] is None and rows[i]["keep"] is None, i
        else:
            assert rows[i]["quality_margin"] == pytest.approx(round(ref, 6), abs=0), i
            assert rows[i]["keep"] == (ref >= 0), i


# ---------------------------------------------------------------------------
# dedup_jaccard_prefix_filter
# ---------------------------------------------------------------------------


def test_ppjoin_integer_boundary_and_short_docs(spark, tmp_path):
    """Docs engineered to land exactly ON the tau=0.8 boundary (9 shingles
    each, 8 shared -> J = 8/10 = 0.8, include) and just BELOW (7 shared
    -> 7/11, exclude); plus <3-token docs (whole-string shingle)."""
    base = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10".split()
    on_a = " ".join(base + ["x"])  # 11 tokens -> 9 shingles
    on_b = " ".join(base + ["y"])  # shares shingles at starts 1..8 -> i=8
    below_a = " ".join(base[:9] + ["x", "xx"])
    below_b = " ".join(base[:9] + ["y", "yy"])  # i=7, union 11 -> 0.636
    texts = [on_a, on_b, below_a, below_b, "a b", "a b", "lone doc here"]
    sf = _planted_docs(spark, tmp_path, texts)
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["dedup_jaccard_prefix_filter"](spark, sf).collect()
    }
    assert got[(0, 1)] == 0.8  # exact boundary is INCLUDED (9i >= 4(na+nb))
    assert (2, 3) not in got
    assert got[(4, 5)] == 1.0  # short docs: whole-string shingle, exact dup
    assert all(6 not in p for p in got)


def test_ppjoin_lossless_vs_bruteforce_on_fixture(spark):
    """Prefix filtering must lose nothing: same pairs as the unfiltered
    all-pairs verify over the sf0.001 corpus."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.text import shingles_col
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    docs = load_table(spark, SF001, "documents")
    sh = docs.select("doc_id", F.array_distinct(shingles_col("text", 3)).alias("s"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    na, nb = F.size("sa").cast("long"), F.size("sb").cast("long")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(9 * inter >= 4 * (na + nb))
        .select("id_a", "id_b")
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_jaccard_prefix_filter"](spark, SF001).collect()
    }
    assert got == brute and len(got) > 0


def test_ppjoin_plan_has_no_cartesian(spark):
    plan = QUERIES["dedup_jaccard_prefix_filter"](spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# similarity_mmr_rerank
# ---------------------------------------------------------------------------


def test_python_loop_dot_matches_duckdb_bitwise():
    """The invariant the MMR kernel rests on: a plain left-to-right Python
    accumulation is bit-identical to DuckDB's list_dot_product (numpy's
    pairwise summation is NOT — this pins the choice)."""
    import struct

    import duckdb

    con = duckdb.connect()
    con.sql(f"create view e as select * from '{SF01}/embeddings.parquet'")
    rows = con.sql(
        """select a.vec_id, b.vec_id,
                  list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])),
                  CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
           from e a join e b on a.vec_id < b.vec_id
           where a.vec_id < 12 and b.vec_id < 12"""
    ).fetchall()
    assert rows
    for _, _, d, va, vb in rows:
        acc = 0.0
        for x, y in zip(va, vb):
            acc += x * y
        assert struct.pack("d", acc) == struct.pack("d", d)


def _ref_mmr(vecs: dict[int, list[float]], q_id: int, pool: int, k: int, lam: float):
    """Straight-from-the-paper greedy MMR, sequential-fold arithmetic."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    qv = vecs[q_id]
    rel = sorted(
        ((cos(qv, v), -i) for i, v in vecs.items() if i != q_id), reverse=True
    )[:pool]
    cands = [(-ni, s) for s, ni in rel]
    chosen = [cands[0]]
    out = [(cands[0][0], cands[0][1])]
    while len(out) < min(k, len(cands)):
        best = None
        for i, s in cands:
            if any(i == c[0] for c in chosen):
                continue
            mx = max(cos(vecs[i], vecs[j]) for j, _ in chosen)
            sc = lam * s - (1 - lam) * mx
            if best is None or (sc, -i) > (best[1], -best[0]):
                best = (i, sc)
        chosen.append((best[0], best[1]))
        out.append(best)
    return out


def test_mmr_matches_reference_impl(spark):
    import duckdb

    con = duckdb.connect()
    vecs = {
        int(r[0]): list(r[1])
        for r in con.sql(
            f"select vec_id, CAST(embedding AS DOUBLE[]) from '{SF001}/embeddings.parquet'"
        ).fetchall()
    }
    got = QUERIES["similarity_mmr_rerank"](spark, SF001).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["n_id"], r["mmr_score"]))
    assert set(by_q) == set(range(8))
    for q in range(8):
        ref = _ref_mmr(vecs, q, pool=30, k=10, lam=0.7)
        rows = sorted(by_q[q])
        assert [nid for _, nid, _ in rows] == [i for i, _ in ref], q
        for (_, _, sc), (_, ref_sc) in zip(rows, ref):
            assert sc == pytest.approx(round(ref_sc, 6), abs=0), q


def test_mmr_rank1_is_topk_seed(spark):
    """Rank 1 must equal the plain cosine argmax (MMR's boundary case)."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
        as_double_vec,
        cosine_col,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    emb = load_table(spark, SF001, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    s = cosine_col(as_double_vec(F.col("qv")), as_double_vec(F.col("nv")))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("s"), F.col("n_id"))
    top1 = {
        r["q_id"]: r["n_id"]
        for r in c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", s.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    got = {
        r["q_id"]: r["n_id"]
        for r in QUERIES["similarity_mmr_rerank"](spark, SF001).filter("rank = 1").collect()
    }
    assert got == top1


# ---------------------------------------------------------------------------
# similarity_range_query
# ---------------------------------------------------------------------------


def test_range_query_lossless_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
        as_double_vec,
        cosine_col,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    emb = load_table(spark, SF001, "embeddings")
    q = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    cos = cosine_col(as_double_vec(F.col("qv")), as_double_vec(F.col("nv")))
    brute = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in c.crossJoin(F.broadcast(q))
        .filter((F.col("q_id") != F.col("n_id")) & (cos >= 0.3))
        .select("q_id", "n_id", F.round(cos, 6).alias("cosine"))
        .collect()
    }
    got = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in QUERIES["similarity_range_query"](spark, SF001).collect()
    }
    assert got == brute and len(got) > 0


def test_range_query_lossless_on_planted_clusters(spark, tmp_path):
    """Two tight antipodal clusters: pruning provably fires (cells are
    tight), and the result must still equal brute force."""
    rng = np.random.default_rng(11)
    base_a = rng.standard_normal(64)
    base_b = -base_a
    vecs = [
        (b + rng.standard_normal(64) * 0.05)
        for b in ([base_a] * 40 + [base_b] * 40)
    ]
    sf = _planted_embeddings(spark, tmp_path, vecs)
    got = {
        (r["q_id"], r["n_id"])
        for r in QUERIES["similarity_range_query"](spark, sf).collect()
    }
    # brute force reference in numpy (membership only; cosines ~1 in-cluster)
    x = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    brute = {
        (q, n)
        for q in range(16)
        for n in range(len(vecs))
        if q != n and sims[q, n] >= 0.3
    }
    # float64 numpy vs fold cosine can differ only at the threshold boundary;
    # this fixture keeps cosines far from 0.3 (in-cluster ~1, cross ~-1)
    assert got == brute and len(got) > 0


# ---------------------------------------------------------------------------
# embedding covariance / PCA
# ---------------------------------------------------------------------------


def test_covariance_matches_numpy(spark):
    import duckdb

    x = np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in duckdb.sql(
                f"select CAST(embedding AS DOUBLE[]) from '{SF001}/embeddings.parquet'"
            ).fetchall()
        ]
    )
    ref = np.cov(x, rowvar=False, ddof=1)
    rows = QUERIES["embedding_covariance"](spark, SF001).collect()
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert r["i"] <= r["j"]
        # cov_micro is round(cov * 1e6) computed over 1e-9-quantized
        # elements: within ~1 micro-unit + quantization drift of numpy
        assert r["cov_micro"] / 1e6 == pytest.approx(
            ref[r["i"] - 1, r["j"] - 1], abs=3e-6
        )


def test_gram_moments_equivalent_to_oracle_tier(spark):
    """Production float kernel (fit_pca/gram_moments) == the registered
    integer-unit covariance entry (within quantization tolerance)."""
    from etl_from_s3_to_postgresql_template_spark.operators.pca import fit_pca
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    emb = load_table(spark, SF001, "embeddings")
    model = fit_pca(emb, "embedding", q=8)
    oracle_rows = QUERIES["embedding_covariance"](spark, SF001).collect()
    cov = np.zeros((64, 64))
    for r in oracle_rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov_micro"] / 1e6
        cov[r["j"] - 1, r["i"] - 1] = r["cov_micro"] / 1e6
    evals = np.linalg.eigvalsh(cov)[::-1][:8]
    assert np.allclose(sorted(model.explained_variance, reverse=True), evals, atol=1e-5)


def test_covariance_posexplode_tier_hash_exact_vs_kernel(spark):
    """The d^2-row posexplode self-join tier (the DuckDB oracle's shape,
    re-expressed in Spark with the same floor(x*1e9+0.5) quantization and
    integer division) must equal the registered zero-shuffle kernel entry
    EXACTLY — every cov_micro bit-identical, not approx. This pins that
    the integer-unit contract really is order/engine-independent."""
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF001, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "i0", "v"
        ),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "v")
    a = x.select("vec_id", "i", F.col("v").alias("va"))
    b = x.select("vec_id", F.col("i").alias("j"), F.col("v").alias("vb"))
    dec = "decimal(38,0)"
    p = (
        a.join(b, "vec_id")
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.floor(F.col("va") * F.col("vb") * F.lit(1e9) + F.lit(0.5)).cast(dec)
            ).alias("pp")
        )
    )
    m = x.groupBy("i").agg(
        F.sum(F.floor(F.col("v") * F.lit(1e9) + F.lit(0.5)).cast(dec)).alias("s"),
        F.count("*").cast(dec).alias("n"),
    )
    ma = m.select("i", F.col("s").alias("s_i"), "n")
    mb = m.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    unit = F.lit(10**9).cast(dec)
    tier = (
        p.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (F.col("pp") * F.col("n") * unit - F.col("s_i") * F.col("s_j")).alias("nn"),
            (F.col("n") * (F.col("n") - F.lit(1).cast(dec)) * unit * unit).alias("dd"),
        )
        .select(
            "i",
            "j",
            F.expr(
                "CAST(CASE WHEN nn >= 0 THEN (2 * nn * 1000000 + dd) DIV (2 * dd)"
                "          ELSE -((2 * (-nn) * 1000000 + dd) DIV (2 * dd))"
                "     END AS BIGINT)"
            ).alias("cov_micro"),
        )
    )
    got = {
        (r["i"], r["j"]): r["cov_micro"]
        for r in QUERIES["embedding_covariance"](spark, SF001).collect()
    }
    ref = {(r["i"], r["j"]): r["cov_micro"] for r in tier.collect()}
    assert got == ref and len(got) == 64 * 65 // 2


def test_pca_projection_properties_and_numpy_parity(spark):
    from etl_from_s3_to_postgresql_template_spark.operators.pca import fit_pca
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    emb = load_table(spark, SF001, "embeddings")
    model = fit_pca(emb, "embedding", q=8)
    comps = np.asarray(model.components)
    # orthonormal rows, descending EVR
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    # projection matches numpy under the same sign convention
    import duckdb

    raw = duckdb.sql(
        f"select vec_id, CAST(embedding AS DOUBLE[]) from '{SF001}/embeddings.parquet' order by vec_id"
    ).fetchall()
    x = np.stack([np.asarray(r[1]) for r in raw])
    ref = (x - np.asarray(model.mean)) @ comps.T
    rows = QUERIES["embedding_pca_project"](spark, SF001).orderBy("vec_id").collect()
    got = np.asarray([[r[f"pc{i + 1}"] for i in range(8)] for r in rows])
    assert np.allclose(got, ref, atol=2e-6)


# ---------------------------------------------------------------------------
# corpus_inverted_index / text_bm25_topk
# ---------------------------------------------------------------------------


def test_inverted_index_bounds_and_df_on_planted_hot_token(spark, tmp_path):
    """A token in 30 docs: df reports the FULL count while postings are
    truncated to the 20 lowest doc_ids — the bound that keeps stopword
    posting arrays from growing with the corpus."""
    texts = [f"hot filler{i} " + ("pad " * 12) for i in range(30)]
    texts += [f"cold{i} only here" for i in range(5)]
    sf = _planted_docs(spark, tmp_path, texts)
    rows = {r["token"]: r for r in QUERIES["corpus_inverted_index"](spark, sf).collect()}
    assert rows["hot"]["df"] == 30
    # postings are a comma-joined STRING (driver-hashable; r7 contract)
    assert rows["hot"]["postings"] == ",".join(str(i) for i in range(20))
    assert rows["pad"]["df"] == 30
    assert "cold0" not in rows  # below the df floor


def _ref_bm25(texts, terms=("table", "stream", "vector"), k1=1.2, b=0.75):
    import math as m

    toks = [[t for t in x.strip().lower().split() if t] for x in texts]
    n = len(toks)
    sum_dl = sum(len(t) for t in toks)
    out = []
    for d, tk in enumerate(toks):
        dl = len(tk)
        score = 0.0
        for q in terms:
            tf = sum(1 for x in tk if x == q)
            df = sum(1 for t2 in toks if q in t2)
            idf = m.log((n - df + 0.5) / (df + 0.5) + 1.0)
            score += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl * n / sum_dl))
        out.append((d, dl, round(score, 6)))
    return out


def test_bm25_matches_reference_with_df_extremes(spark, tmp_path):
    """Planted corpus covering: term in EVERY doc (idf floor), term in one
    doc (idf ceiling), term absent everywhere (zero contribution), tf
    saturation (many repeats), and short/long docs."""
    texts = [
        "table " * 20 + "stream end",   # tf saturation on 'table'
        "table stream stream pad pad pad",
        "table pad " * 30,
        "table short",
    ]
    sf = _planted_docs(spark, tmp_path, texts)
    ref = {d: s for d, _, s in _ref_bm25(texts)}
    got = {r["doc_id"]: r["bm25"] for r in QUERIES["text_bm25_topk"](spark, sf).collect()}
    for d, s in got.items():
        assert s == pytest.approx(ref[d], abs=1e-6), d
    # ranking: round-then-rank, doc_id tie-break
    ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    got_rows = sorted(
        (r["rank"], r["doc_id"])
        for r in QUERIES["text_bm25_topk"](spark, sf).collect()
    )
    assert [d for _, d in got_rows] == [d for d, _ in ranked]


# ---------------------------------------------------------------------------
# text_rrf_fusion / docs_chunk_dedup_stats / corpus_prep_funnel3
# ---------------------------------------------------------------------------


def test_rrf_fusion_matches_composed_rankings(spark):
    """RRF output must equal fusing the engine's own two rankings by the
    published formula — computed independently here from the scored
    frame."""
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import (
        _bm25_scored_frame,
    )

    scored = _bm25_scored_frame(spark, SF001).collect()
    ra = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(scored, key=lambda r: (-r["bm25"], r["doc_id"]))[:50]
        )
    }
    rb = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(scored, key=lambda r: (-r["tfidf"], r["doc_id"]))[:50]
        )
    }
    fused = {
        d: round(
            (1.0 / (60 + ra[d]) if d in ra else 0.0)
            + (1.0 / (60 + rb[d]) if d in rb else 0.0),
            6,
        )
        for d in set(ra) | set(rb)
    }
    ref = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["rrf_score"])
        for r in QUERIES["text_rrf_fusion"](spark, SF001).orderBy("rank").collect()
    ]
    assert got == ref


def test_chunk_dedup_planted_shared_and_within_doc_chunks(spark, tmp_path):
    block = " ".join(f"w{i}" for i in range(32))
    other = " ".join(f"u{i}" for i in range(32))
    texts = [
        block + " " + other,          # chunk0 shared with doc1, chunk1 unique? no — shared with doc3
        block + " tail words here",   # chunk0 == doc0 chunk0 -> dup
        "short doc",                  # single partial chunk, unique
        other + " " + other,          # within-doc repeat: both chunks identical
    ]
    sf = _planted_docs(spark, tmp_path, texts)
    rows = {r["doc_id"]: r for r in QUERIES["docs_chunk_dedup_stats"](spark, sf).collect()}
    assert rows[0]["n_chunks"] == 2
    assert rows[0]["n_dup_chunks"] == 2  # block shared with doc1, other shared with doc3
    assert rows[1]["n_chunks"] == 2 and rows[1]["n_dup_chunks"] == 1
    assert rows[2]["n_chunks"] == 1 and rows[2]["n_dup_chunks"] == 0
    assert rows[3]["n_chunks"] == 2 and rows[3]["n_dup_chunks"] == 2  # self-repeat counts
    assert rows[3]["dup_frac"] == 1.0


def test_funnel3_composes_its_stage_operators(spark):
    """The funnel's cumulative counts must equal composing the three
    registered operators independently."""
    clf = {
        r["doc_id"]: bool(r["keep"]) if r["keep"] is not None else False
        for r in QUERIES["docs_quality_classifier"](spark, SF001).collect()
    }
    chunk_ok = {
        r["doc_id"]: r["dup_frac"] < 0.5
        for r in QUERIES["docs_chunk_dedup_stats"](spark, SF001).collect()
    }
    losers = {
        r["id_b"] for r in QUERIES["dedup_jaccard_prefix_filter"](spark, SF001).collect()
    }
    docs = set(clf)
    s1 = sum(clf[d] for d in docs)
    s2 = sum(clf[d] and chunk_ok.get(d, False) for d in docs)
    s3 = sum(clf[d] and chunk_ok.get(d, False) and d not in losers for d in docs)
    row = QUERIES["corpus_prep_funnel3"](spark, SF001).collect()[0]
    assert (row["input_docs"], row["after_classifier"]) == (len(docs), s1)
    assert (row["after_chunk_gate"], row["after_dedup"]) == (s2, s3)
    assert row["input_docs"] >= row["after_classifier"] >= row["after_chunk_gate"] >= row["after_dedup"]


# ---------------------------------------------------------------------------
# corpus_coreset_kcenter
# ---------------------------------------------------------------------------


def test_kcenter_matches_reference_and_covering_radius_decays(spark):
    import duckdb

    vecs = {
        int(r[0]): list(r[1])
        for r in duckdb.sql(
            f"select vec_id, CAST(embedding AS DOUBLE[]) from '{SF001}/embeddings.parquet'"
        ).fetchall()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def dist(a, b):
        return 1 - dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    chosen = [min(vecs)]
    ref = [(1, chosen[0], None)]
    while len(chosen) < 8:
        best = None
        for i in vecs:
            if i in chosen:
                continue
            md = min(dist(vecs[i], vecs[j]) for j in chosen)
            if best is None or (md, -i) > (best[1], -best[0]):
                best = (i, md)
        chosen.append(best[0])
        ref.append((len(chosen), best[0], round(best[1], 6)))
    got = [
        (r["rank"], r["vec_id"], r["sel_dist"])
        for r in QUERIES["corpus_coreset_kcenter"](spark, SF001).orderBy("rank").collect()
    ]
    assert got == ref
    # greedy k-center invariant: the covering radius is non-increasing
    radii = [sd for _, _, sd in got if sd is not None]
    assert all(radii[i] >= radii[i + 1] - 1e-12 for i in range(len(radii) - 1))


def test_unicode_lower_parity_boundary(spark):
    """Documents the cross-engine lower() boundary every text oracle sits
    on: Spark (Java) and DuckDB agree on all probed non-ASCII case
    mappings EXCEPT U+0130 (Turkish dotted capital I), where Spark emits
    the Unicode-correct 'i' + U+0307 combining dot and DuckDB emits plain
    'i'. The fixtures are ASCII so every oracle is unaffected; this test
    pins the known divergence so a change in either engine surfaces."""
    from pyspark.sql import functions as F

    agree = ["STRASSE", "ΣΙΓΜΑ", "ĄĆĘŁ", "ÀÉÎÕÜ", "ДОМ", "ẞ", "ǅungla", "ﬁne"]
    diverge = ["İstanbul"]
    import duckdb

    rows = (
        spark.createDataFrame([(t,) for t in agree + diverge], "s string")
        .select("s", F.lower("s").alias("lo"))
        .collect()
    )
    con = duckdb.connect()
    got = {r["s"]: r["lo"] for r in rows}
    for t in agree:
        assert got[t] == con.sql("select lower(?)", params=[t]).fetchone()[0], t
    for t in diverge:
        duck = con.sql("select lower(?)", params=[t]).fetchone()[0]
        assert got[t] == "i̇stanbul" and duck == "istanbul"


# ---------------------------------------------------------------------------
# similarity_hard_negatives / embedding_knn_label_accuracy
# ---------------------------------------------------------------------------


def _planted_labeled_embeddings(spark, tmp_path, vecs_labels):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], int(l)) for i, (v, l) in enumerate(vecs_labels)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_hard_negatives_are_cross_label_and_ranked(spark, tmp_path):
    rng = np.random.default_rng(5)
    a, b = rng.standard_normal(64), rng.standard_normal(64)
    vecs = [(a + rng.standard_normal(64) * 0.1, 0) for _ in range(10)]
    vecs += [(b + rng.standard_normal(64) * 0.1, 1) for _ in range(10)]
    sf = _planted_labeled_embeddings(spark, tmp_path, vecs)
    rows = QUERIES["similarity_hard_negatives"](spark, sf).collect()
    assert rows
    for r in rows:
        assert r["n_label"] != r["q_label"]
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        # ranked by descending cosine
        cs = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)


def test_knn_label_accuracy_detects_mislabel(spark, tmp_path):
    rng = np.random.default_rng(9)
    a, b = rng.standard_normal(64), rng.standard_normal(64)
    clean = [(a + rng.standard_normal(64) * 0.05, 0) for _ in range(12)]
    clean += [(b + rng.standard_normal(64) * 0.05, 1) for _ in range(12)]
    sf = _planted_labeled_embeddings(spark, tmp_path, clean)
    rows = {r["label"]: r for r in QUERIES["embedding_knn_label_accuracy"](spark, sf).collect()}
    assert rows[0]["agree_frac"] == 1.0 and rows[1]["agree_frac"] == 1.0
    # plant one mislabel: a label-1 point sitting in cluster A
    noisy = clean + [(a + rng.standard_normal(64) * 0.05, 1)]
    sf2 = _planted_labeled_embeddings(spark, tmp_path.joinpath("noisy"), noisy)
    rows2 = {r["label"]: r for r in QUERIES["embedding_knn_label_accuracy"](spark, sf2).collect()}
    assert rows2[1]["n"] == 13 and rows2[1]["n_agree"] == 12  # the planted point disagrees
    assert rows2[0]["agree_frac"] == 1.0


def test_pipeline_classifier_stage_composes(spark):
    """annotate_corpus(use_classifier=True) must equal intersecting the
    rule gate with the registered classifier's keep flag, and the whole
    downstream funnel must still be cumulative."""
    from etl_from_s3_to_postgresql_template_spark.corpus_pipeline import (
        annotate_corpus,
        corpus_funnel_stats,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    docs = load_table(spark, SF001, "documents")
    base = {r["doc_id"]: r["ok_quality"] for r in annotate_corpus(docs).collect()}
    keep = {
        r["doc_id"]: bool(r["keep"]) if r["keep"] is not None else False
        for r in QUERIES["docs_quality_classifier"](spark, SF001).collect()
    }
    ann = annotate_corpus(docs, use_classifier=True)
    got = {r["doc_id"]: r["ok_quality"] for r in ann.collect()}
    for d in base:
        assert got[d] == (base[d] and keep[d]), d
    st = corpus_funnel_stats(ann)
    assert st.input_docs >= st.after_quality >= st.after_dedup >= st.after_decontam
    assert st.after_quality == sum(got.values())


def test_mmr_lambda_one_degenerates_to_plain_topk(spark):
    """MMR's boundary case: lambda=1 removes the diversity term, so the
    selection must equal the plain cosine top-10 in rank order."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
        as_double_vec,
        cosine_col,
    )
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import (
        similarity_mmr_rerank,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    emb = load_table(spark, SF001, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"))
    sim = cosine_col(as_double_vec(F.col("qv")), as_double_vec(F.col("nv")))
    w = W.partitionBy("q_id").orderBy(F.desc("s"), F.col("n_id"))
    topk = {
        (r["q_id"], r["rn"]): r["n_id"]
        for r in c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", sim.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    got = {
        (r["q_id"], r["rank"]): r["n_id"]
        for r in similarity_mmr_rerank(spark, SF001, lam=1.0).collect()
    }
    assert got == topk


def test_ppjoin_lossless_on_random_corpora(spark, tmp_path):
    """Seeded random corpora (Zipf-ish small vocab so shingle overlap is
    common): prefix-filtered pairs must equal the brute-force tau=0.8
    verify on every corpus."""
    import itertools
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        texts = []
        for d in range(24):
            n = rng.randint(2, 40)
            toks = [rng.choice(vocab) for _ in range(n)]
            texts.append(" ".join(toks))
        # plant a few near-dup pairs by copying with a small tail change
        for i in (0, 5, 9):
            texts.append(texts[i] + " tailtok")
        sf = _planted_docs(spark, tmp_path.joinpath(f"s{seed}"), texts)

        def shingles(t):
            tk = t.strip().split()
            if len(tk) >= 3:
                return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
            return {" ".join(tk)}

        sets = [shingles(t) for t in texts]
        brute = set()
        for a, b in itertools.combinations(range(len(texts)), 2):
            i = len(sets[a] & sets[b])
            if 9 * i >= 4 * (len(sets[a]) + len(sets[b])):
                brute.add((a, b))
        got = {
            (r["id_a"], r["id_b"])
            for r in QUERIES["dedup_jaccard_prefix_filter"](spark, sf).collect()
        }
        assert got == brute, seed


def test_hashing_vectorizer_properties(spark, tmp_path):
    """Unit norm, determinism, same-text -> same vector, distinct text ->
    (almost surely) different vector, empty docs excluded; and the vector
    plugs into the engine's cosine machinery (self-similarity = 1)."""
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import (
        _hashing_vectorizer_frame,
    )

    texts = ["alpha beta gamma delta", "alpha beta gamma delta", "omega psi chi", ""]
    sf = _planted_docs(spark, tmp_path, texts)
    rows = {
        r["doc_id"]: list(r["vec"])
        for r in _hashing_vectorizer_frame(spark, sf).collect()
    }
    assert set(rows) == {0, 1, 2}  # empty doc excluded
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
    for v in rows.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-4  # unit norm (post round-6)
    # the REGISTERED entry stringifies to integer micro-units quantized
    # from the UNROUNDED normalized vector (driver-hashable; no round-6
    # double under the quantization — review r7)
    raw_rows = {
        r["doc_id"]: list(r["vec"])
        for r in _hashing_vectorizer_frame(spark, sf, rounded=False).collect()
    }
    reg = {
        r["doc_id"]: r["vec_micro"]
        for r in QUERIES["docs_hashing_vectorizer"](spark, sf).collect()
    }
    assert set(reg) == {0, 1, 2}
    import math

    for did, v in raw_rows.items():
        want = ",".join(str(int(math.floor(x * 1e6 + 0.5))) for x in v)
        assert reg[did] == want
    # cross-check one vector against the pure-Python reference
    import hashlib

    def ref(text):
        toks = [t for t in text.strip().lower().split() if t]
        raw = [0.0] * 64
        for t in toks:
            hv = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            raw[hv % 64] += 1.0 if (hv >> 6) & 1 == 0 else -1.0
        nn = sum(x * x for x in raw) ** 0.5
        return [round(x / nn, 6) if nn else 0.0 for x in raw]

    assert rows[2] == ref(texts[2])


def test_mmr_oracle_parity_on_tiny_pool(spark, tmp_path):
    """Pool smaller than k: both engines must emit the PARTIAL ranking
    (the oracle previously dropped such queries entirely)."""
    import duckdb

    rng = np.random.default_rng(3)
    vecs = [rng.standard_normal(64) for _ in range(6)]  # pool of 5 < k=10
    sf = _planted_embeddings(spark, tmp_path, vecs)
    got = sorted(
        (r["q_id"], r["rank"], r["n_id"], r["mmr_score"])
        for r in QUERIES["similarity_mmr_rerank"](spark, sf).collect()
    )
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import _MMR_ORACLE

    con = duckdb.connect()
    con.sql(f"create view embeddings as select * from '{sf}/embeddings.parquet/*.parquet'")
    ref = sorted(tuple(r) for r in con.sql(_MMR_ORACLE).fetchall())
    assert got == ref and len(got) == 6 * 5


def test_corpus_quality_report_composes_its_inputs(spark):
    """Every report number must equal re-deriving it from the registered
    component operators."""
    row = QUERIES["corpus_quality_report"](spark, SF001).collect()[0]
    clf = QUERIES["docs_quality_classifier"](spark, SF001).collect()
    assert row["n_docs"] == len(clf)
    assert row["n_tokens_total"] == sum(r["n_tokens"] for r in clf)
    keep = sum(1 for r in clf if r["keep"])
    assert row["pct_classifier_keep"] == round(keep / len(clf), 4)
    ch = QUERIES["docs_chunk_dedup_stats"](spark, SF001).collect()
    assert row["pct_docs_with_dup_chunks"] == round(
        sum(1 for r in ch if r["n_dup_chunks"] > 0) / len(ch), 4
    )
    ppj = QUERIES["dedup_jaccard_prefix_filter"](spark, SF001).count()
    assert row["n_neardup_pairs"] == ppj


def test_shingle_oracle_parity_on_edge_whitespace(spark, tmp_path):
    """Cross-engine shingle parity on docs whose leading/trailing
    whitespace is NOT 0x20 (trim strips spaces only, so split-on-\\s+
    emits empty edge tokens): shingles_col filters empties — including
    in its token COUNT, so a 2-token doc with a trailing newline takes
    the whole-doc fallback on both engines instead of the regex branch —
    and every shingle oracle applies the matching list_filter (ADVICE
    r6). Asserts hash-exact pair/jaccard equality through the PPJoin
    entry, plus the shingle sets themselves via a python reference."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.functions.text import shingles_col
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import _PPJOIN_ORACLE
    from pyspark.sql import functions as F

    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        near + "\n",            # trailing newline: near-dup of #1
        near + " tail",         # plain near-dup partner
        "\tone two three\n",    # leading tab + trailing newline
        "a b\n",                # 2 real tokens + empty artifact: MUST fall back to 'a b'
        "a b c\n",              # ADVICE's verified case: exactly {'a b c'}
        "only spaces inside here",  # control
    ]
    sf = _planted_docs(spark, tmp_path, texts)

    def ref_shingles(t):
        tk = [x for x in t.strip().split() if x]
        if len(tk) >= 3:
            return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        return {" ".join(tk)}

    got_sh = {
        r["doc_id"]: set(r["s"])
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", F.array_distinct(shingles_col("text", 3)).alias("s"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert got_sh[i] == ref_shingles(t), (i, t)

    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in QUERIES["dedup_jaccard_prefix_filter"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_PPJOIN_ORACLE).fetchall())
    assert got == want and (0, 1) in {(a, b) for a, b, _ in got}


def test_covariance_registered_plan_is_kernel_not_self_join(spark):
    """VERDICT r6 item 3: the REGISTERED covariance plan must be the
    zero-shuffle mapInPandas kernel — no d^2-row posexplode self-join
    anywhere (that form stays oracle/pytest-side). The only joins allowed
    are the broadcast attach of the tiny (d) moment rows."""
    plan = (
        QUERIES["embedding_covariance"](spark, SF001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the kernel pass sits behind the lazy localCheckpoint, which the plan
    # shows as Scan ExistingRDD[n, s, p] — per-batch partials, not rows
    assert "Scan ExistingRDD[n" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the d^2 self-join form joined posexploded vector elements on vec_id;
    # the kernel plan never touches vec_id at all
    assert "vec_id" not in plan


def test_inverted_index_plan_single_pass_single_exchange(spark):
    """r7 restructure pin: one tokenize+explode pass (single parquet
    scan), ONE hash exchange (the window's; the groupBy reuses its
    partitioning), no join — the r6 two-consumer form scanned and
    exploded twice, shuffled twice, and joined the legs."""
    plan = (
        QUERIES["corpus_inverted_index"](spark, SF001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_fused_quality_stats_matches_expression_forms(spark):
    """The r7 fused Arrow kernel (quality_stats_counts: class counts +
    token count + stopword hits in one pass) must equal the original
    Spark expression forms CELL-EXACTLY on adversarial inputs: non-space
    edge whitespace (split's empty-token artifacts count toward
    n_tokens), consecutive stopwords, multi-separator runs, stopwords at
    string edges, uppercase stopwords, 'a' as a one-char stopword beside
    'and'/'that' in the alternation, empty and null text."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.text import (
        LANG_STOPWORDS,
        char_class_counts,
        quality_stats_counts,
        stopword_hits_col,
        token_count_col,
    )

    texts = [
        "The quick brown fox and the lazy dog",
        "the the the",              # consecutive stopwords, single spaces
        "the  and\tof",             # multi-space + tab separators
        "a b a",                    # 1-char stopword at start/middle
        "that",                     # whole doc is one stopword
        "athe thea the",            # substrings must NOT match
        "the\n",                    # trailing newline: token artifact
        "\nand more\t\n",           # leading+trailing non-space whitespace
        " \t ",                     # whitespace-only
        "",                         # empty
        None,                       # null
        "THE AND OF TO",            # uppercase stopwords
        "punct, and. digits 123!",  # classes + stopword mix
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    st = quality_stats_counts("text")
    cc = char_class_counts("text")
    rows = df.select(
        "i",
        st.getField("n_alpha").alias("ka"),
        st.getField("n_digit").alias("kd"),
        st.getField("n_punct").alias("kp"),
        st.getField("n_tokens").alias("kt"),
        st.getField("n_stop").alias("ks"),
        cc.getField("n_alpha").alias("ea"),
        cc.getField("n_digit").alias("ed"),
        cc.getField("n_punct").alias("ep"),
        token_count_col("text").alias("et"),
        stopword_hits_col("text", LANG_STOPWORDS["en"]).alias("es"),
    ).collect()
    for r in rows:
        assert (r["ka"], r["kd"], r["kp"], r["kt"], r["ks"]) == (
            r["ea"], r["ed"], r["ep"], r["et"], r["es"],
        ), (r["i"], texts[r["i"]], dict(r.asDict()))


def test_hashed_margin_kernel_bit_exact_vs_expression(spark, tmp_path):
    """The factorized-md5 Arrow kernel behind hashed_margin_col must be
    BIT-identical to the expression form (hashed_margin_expr_col) — same
    md5 bucket weights, same sequential fold order — on adversarial docs
    (repeated tokens, edge whitespace, empty/null, one long doc crossing
    the column-sweep cap) and on the sf0.01 fixture corpus."""
    import struct

    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.text import (
        hashed_margin_col,
        hashed_margin_expr_col,
    )

    long_doc = " ".join(f"w{i % 97}" for i in range(5000))  # > sweep cap
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "repeat repeat repeat repeat",
        "\tmixed  Spacing\nhere\t\n",
        "single",
        "",
        "   ",
        None,
        long_doc,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select(
        "i",
        hashed_margin_col("text").alias("k"),
        hashed_margin_expr_col("text").alias("e"),
    ).collect()
    for r in rows:
        if r["e"] is None:
            assert r["k"] is None, r["i"]
        else:
            assert struct.pack("d", r["k"]) == struct.pack("d", r["e"]), (
                r["i"], r["k"], r["e"],
            )
    fx = spark.read.parquet(f"{SF01}/documents.parquet")
    got = fx.select(
        hashed_margin_col("text").alias("k"), hashed_margin_expr_col("text").alias("e")
    ).collect()
    assert all(
        (r["k"] is None and r["e"] is None)
        or struct.pack("d", r["k"]) == struct.pack("d", r["e"])
        for r in got
    ) and len(got) == 500


def test_fused_lang_scores_match_expression_form(spark):
    """The fused 5-language stopword kernel behind lang_scores must equal
    stopword_hits_col per language exactly — including the Chinese
    (non-ASCII, often unsegmented) list, uppercase stopwords, edge
    whitespace, and the -1-on-null sentinel lang_id_col's guard uses."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.text import (
        LANG_STOPWORDS,
        lang_scores,
        stopword_hits_col,
    )

    texts = [
        "the quick fox and the dog",
        "el que la y en un los de",
        "der die und das von zu mit den",
        "LE LA DE et les",
        "的 是 在 了",          # segmented zh stopwords
        "的是在了",              # unsegmented: ONE token, no whole-token hit
        "\nder die\t",
        "",
        "   ",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    sc_cols = lang_scores("text")
    expr_cols = {
        lang: stopword_hits_col("text", sw) for lang, sw in LANG_STOPWORDS.items()
    }
    sel = ["i"]
    for lang in sorted(LANG_STOPWORDS):
        sel += [sc_cols[lang].alias(f"k_{lang}"), expr_cols[lang].alias(f"e_{lang}")]
    for r in df.select(*sel).collect():
        for lang in sorted(LANG_STOPWORDS):
            assert r[f"k_{lang}"] == r[f"e_{lang}"], (r["i"], lang, texts[r["i"]])


def test_covariance_single_vector_nulls_match_oracle(spark, tmp_path):
    """n=1: ddof=1 covariance is undefined — D = n*(n-1)*1e18 = 0 and
    BOTH engines define integer-division-by-zero as NULL (Spark DIV,
    DuckDB //), so every upper-triangle cell is a NULL cov_micro on both
    sides: hash-consistent, no crash. Pins the degenerate input the
    empty-table guard does not cover."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import _COV_ORACLE

    rng = np.random.default_rng(11)
    sf = _planted_embeddings(spark, tmp_path, [rng.standard_normal(8)])
    rows = QUERIES["embedding_covariance"](spark, sf).collect()
    assert len(rows) == 8 * 9 // 2
    assert all(r["cov_micro"] is None for r in rows)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    orows = con.execute(_COV_ORACLE).fetchall()
    assert len(orows) == len(rows) and all(r[2] is None for r in orows)


def test_kcenter_terminates_on_corpus_smaller_than_k(spark, tmp_path):
    """ADVICE r6: 1-7 vectors used to IndexError once every vector was
    chosen; now the loop breaks like the oracle's recursive CTE — the
    result is ALL vectors, ranked, matching the oracle row-for-row."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops7 import (
        _KC_K,
    )
    import __spark_entry__ as entrymod

    rng = np.random.default_rng(12)
    n = 3
    assert n < _KC_K
    sf = _planted_embeddings(spark, tmp_path, [rng.standard_normal(8) for _ in range(n)])
    rows = QUERIES["corpus_coreset_kcenter"](spark, sf).collect()
    assert len(rows) == n and [r["rank"] for r in rows] == [1, 2, 3]
    oracle = entrymod.oracle_sql()["corpus_coreset_kcenter"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    want = con.execute(oracle).fetchall()
    got = [(r["rank"], r["vec_id"], r["sel_dist"]) for r in rows]
    assert got == [tuple(w) for w in want]


# ---------------------------------------------------------------------------
# embedding_pca_variance_gate
# ---------------------------------------------------------------------------


def test_pca_variance_gate_all_green_on_testdata(spark):
    row = QUERIES["embedding_pca_variance_gate"](spark, SF001).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_vecs"] > 0 and r["trace_micro"] > 0
    assert r["eig_trace_ok"] and r["proj_var_ok"] and r["orthonormal_ok"]


def test_pca_variance_gate_tolerances_catch_planted_defects(spark, tmp_path):
    """The gate's identities must FAIL on a garbled projection: scaling
    one component by 1% moves that component's projected variance by ~2%
    of its eigenvalue — four orders above the 1e-6 tolerance — and breaks
    orthonormality."""
    import numpy as np

    from etl_from_s3_to_postgresql_template_spark.operators.pca import (
        PcaModel,
        fit_pca,
        project_pca,
    )

    rng = np.random.default_rng(7)
    sf = _planted_embeddings(
        spark, tmp_path, [rng.standard_normal(6) for _ in range(40)]
    )
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    model = fit_pca(emb, "embedding", q=6)
    comps = np.asarray(model.components)
    assert np.max(np.abs(comps @ comps.T - np.eye(6))) < 1e-9
    bad = PcaModel(
        mean=model.mean,
        components=[[1.01 * x for x in model.components[0]]]
        + model.components[1:2],
        explained_variance=model.explained_variance[:2],
    )
    badc = np.asarray(bad.components)
    assert not np.max(np.abs(badc @ badc.T - np.eye(2))) < 1e-9
    proj = project_pca(emb, bad, "embedding", out_col="pc")
    from pyspark.sql import functions as F

    v0 = proj.agg(F.var_samp(F.col("pc")[0])).collect()[0][0]
    lam0 = bad.explained_variance[0]
    assert abs(v0 - lam0) > 1e-6 * max(1.0, lam0) * 100


def test_pca_variance_gate_degenerate_input_empty_frame(spark, tmp_path):
    sf = _planted_embeddings(spark, tmp_path, [[1.0, 2.0, 3.0]])
    out = QUERIES["embedding_pca_variance_gate"](spark, sf)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "n_vecs",
        "trace_micro",
        "eig_trace_ok",
        "proj_var_ok",
        "orthonormal_ok",
    ]


def test_pca_variance_gate_oracle_degenerate_parity(spark, tmp_path):
    """ADVICE r8 (low): on a single-vector corpus the plan returns an
    empty frame; the oracle must too (its var_samp denominator is 0 and
    HUGEINT // 0 is NULL, so without the cardinality guard it emitted a
    spurious (1, NULL, TRUE, ...) row)."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans import ORACLE

    sf = _planted_embeddings(spark, tmp_path, [[1.0, 2.0, 3.0]])
    con = duckdb.connect()
    con.execute(
        # Spark writes a directory of part files; glob inside it
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    rows = con.execute(ORACLE["embedding_pca_variance_gate"]).fetchall()
    assert rows == []  # matches the plan's < 2-vector empty-frame contract
    # and the guard must not fire on a healthy corpus
    con2 = duckdb.connect()
    con2.execute(
        "CREATE VIEW embeddings AS SELECT * "
        "FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    healthy = con2.execute(ORACLE["embedding_pca_variance_gate"]).fetchall()
    assert len(healthy) == 1 and healthy[0][1] is not None
