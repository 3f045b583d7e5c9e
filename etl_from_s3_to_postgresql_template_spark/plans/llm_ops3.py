"""Round-3 LLM-pipeline additions.

First entries: recall-gate companions for the approximate similarity tiers
(north-star E2). ``similarity_topk_lsh`` / ``similarity_topk_ivf`` are
rows-only in the driver's gate by nature (an ANN result has no SQL oracle).
These companions close that gap: each computes recall@k of the approximate
tier against the exact brute-force ranking ENTIRELY inside Spark, reduces
it to one deterministic row, and pairs it with a constant-valued DuckDB
oracle — so the driver gets a hash-checkable green row certifying the ANN
tier's quality instead of a bare row-count.

Scale stance: the recall join touches only the two top-k result sets
(|Q| * k rows each — tiny by construction), so the gate costs the same as
running the two tiers; everything else is the tiers' own scale shape
(documented in operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

__all__ = [
    "similarity_lsh_recall_gate",
    "similarity_ivf_recall_gate",
]


def _query_candidate_split(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    candidates = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_vec"))
    return queries_df, candidates


def _recall_gate(exact: DataFrame, approx: DataFrame, floor: float) -> DataFrame:
    """One-row recall@k gate: mean over queries of |approx ∩ exact| / |exact|.

    Both inputs are (q_id, n_id, cosine, rank) top-k frames — |Q|*k rows, so
    the semi join and the final aggregate are negligible next to the tiers
    themselves. Output is deterministic (seeded hyperplanes / seeded k-means,
    fixed data): (n_queries, recall_ok) hash-matches a constant oracle.
    """
    hits = (
        exact.select("q_id", "n_id")
        .join(approx.select("q_id", "n_id").withColumn("__hit", F.lit(1)), ["q_id", "n_id"], "left")
        .groupBy("q_id")
        .agg((F.sum("__hit") / F.count(F.lit(1))).alias("recall"))
    )
    return hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.avg(F.coalesce(F.col("recall"), F.lit(0.0))) >= F.lit(floor)).alias("recall_ok"),
    )


_GATE_ORACLE = "SELECT CAST(5 AS BIGINT) AS n_queries, TRUE AS recall_ok"


@query("similarity_lsh_recall_gate", oracle=_GATE_ORACLE)
def similarity_lsh_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 quality gate: sign-LSH top-10 must hold mean recall@10 >= 0.3 vs
    exact brute force (the floor the recall pytest enforces at 500 random
    vectors — sign-LSH with 4 bands is imperfect by design; the gate
    catches blocking bugs, which drive recall to ~0)."""
    from etl_from_s3_to_postgresql_template_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    queries_df, candidates = _query_candidate_split(spark, sf_dir)
    exact = brute_force_topk(queries_df, candidates, k=10)
    approx = lsh_topk(queries_df, candidates, dim=64, k=10)
    return _recall_gate(exact, approx, floor=0.3)


@query("similarity_ivf_recall_gate", oracle=_GATE_ORACLE)
def similarity_ivf_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 quality gate: IVF (probe 4/16 lists) top-10 must hold mean
    recall@10 >= 0.3 vs exact brute force (same floor as the pytest;
    guards against degenerate k-means assignment)."""
    from etl_from_s3_to_postgresql_template_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    queries_df, candidates = _query_candidate_split(spark, sf_dir)
    exact = brute_force_topk(queries_df, candidates, k=10)
    approx = ivf_topk(queries_df, candidates, k=10)
    return _recall_gate(exact, approx, floor=0.3)
