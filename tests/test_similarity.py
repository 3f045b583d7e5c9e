"""ANN: brute force vs numpy ground truth; LSH recall floor."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.operators.similarity import brute_force_topk, lsh_topk
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def _cands(emb):
    return emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"))


def test_brute_force_matches_numpy(spark, emb):
    out = brute_force_topk(_queries(emb), _cands(emb), k=10).collect()
    pdf = emb.toPandas()
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(M, axis=1)
    for q in range(5):
        qi = np.where(ids == q)[0][0]
        cos = (M @ M[qi]) / (norms * norms[qi])
        cos_r = np.round(cos, 6)
        order = sorted(
            [(c, i) for c, i in zip(cos_r, ids) if i != q], key=lambda t: (-t[0], t[1])
        )[:10]
        got = sorted([(r["cosine"], r["n_id"]) for r in out if r["q_id"] == q],
                     key=lambda t: (-t[0], t[1]))
        want = [(round(float(c), 6), int(i)) for c, i in order]
        got = [(round(float(c), 6), int(i)) for c, i in got]
        assert got == want, f"query {q}"


def test_ivf_recall_floor(spark, emb):
    from etl_from_s3_to_postgresql_template_spark.operators.similarity import ivf_topk

    bf = brute_force_topk(_queries(emb), _cands(emb), k=10).collect()
    ap = ivf_topk(_queries(emb), _cands(emb), k=10).collect()
    bf_sets, ap_sets = {}, {}
    for r in bf:
        bf_sets.setdefault(r["q_id"], set()).add(r["n_id"])
    for r in ap:
        ap_sets.setdefault(r["q_id"], set()).add(r["n_id"])
    recalls = [len(bf_sets[q] & ap_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets]
    # probing 4/16 lists over 500 random vectors: guard against broken
    # assignment (recall ~0), not against ANN's inherent approximation
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_lsh_recall_floor(spark, emb):
    bf = brute_force_topk(_queries(emb), _cands(emb), k=10).collect()
    ap = lsh_topk(_queries(emb), _cands(emb), dim=64, k=10).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["q_id"], set()).add(r["n_id"])
    ap_sets = {}
    for r in ap:
        ap_sets.setdefault(r["q_id"], set()).add(r["n_id"])
    recalls = [len(bf_sets[q] & ap_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets]
    # sign-LSH with 4 bands on 500 random vectors: recall is imperfect by
    # design; the floor guards against blocking bugs (recall ~0).
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_ivf_precomputed_centroids_identical(spark, emb):
    """The production split: fit_ivf_centroids once, query many times. Same
    seed => same centroids => byte-identical result to inline training."""
    from etl_from_s3_to_postgresql_template_spark.operators.similarity import (
        fit_ivf_centroids,
        ivf_topk,
    )

    queries = emb.filter(emb.vec_id < 3).selectExpr("vec_id as q_id", "embedding as q_vec")
    cands = emb.selectExpr("vec_id as n_id", "embedding as n_vec")
    cents = fit_ivf_centroids(cands, n_lists=8)
    assert len(cents) == 8 and all(len(c) == len(cents[0]) for c in cents)
    inline = ivf_topk(queries, cands, k=5, n_lists=8).collect()
    fitted = ivf_topk(queries, cands, k=5, n_lists=8, centroids=cents).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, fitted))
