"""Round-4 plans: semantic-cluster dedup and incremental partial-agg merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_semantic_dedup_covers_every_vector_once(spark):
    out = QUERIES["dedup_semantic_clusters"](spark, SF01)
    rows = out.collect()
    n_emb = spark.read.parquet(f"{SF01}/embeddings.parquet").count()
    assert len(rows) == n_emb  # verdict per vector, none dropped/duplicated
    assert len({r["vec_id"] for r in rows}) == n_emb


def test_semantic_dedup_keep_lowest_id_survivor_per_pair(spark):
    """A flagged duplicate must have a LOWER-id cell-mate above tau; the
    lowest id in every cluster is never flagged (it has no smaller mate)."""
    out = QUERIES["dedup_semantic_clusters"](spark, SF01).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(r["is_semantic_dup"] for r in out) > 0  # fixture exercises the path
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r["vec_id"])
        assert not lowest["is_semantic_dup"]
    for r in out:
        if r["is_semantic_dup"]:
            assert r["max_cos_smaller"] is not None and r["max_cos_smaller"] >= 0.40


def test_semantic_dedup_plan_has_no_cartesian_join(spark):
    plan = QUERIES["dedup_semantic_clusters"](spark, SF01)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_incremental_merge_is_split_invariant(spark):
    """The merged rollup must not depend on WHERE the base/delta split
    falls — recompute with a plain single-scan groupBy and compare."""
    out = {r["o_custkey"]: r for r in QUERIES["incremental_agg_merge"](spark, SF).collect()}
    flat = {
        r["o_custkey"]: r
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_spend"),
        )
        .collect()
    }
    assert set(out) == set(flat)
    for k, r in out.items():
        assert r["n_orders"] == flat[k]["n_orders"]
        assert r["total_spend"] == flat[k]["total_spend"]


def test_ivfpq_rerank_top1_matches_bruteforce_top1(spark):
    """ADC candidates + exact rerank: the exact-rerank top-1 must agree
    with brute force whenever brute force's best is inside the ADC
    candidate set — and for the fixture's 5 queries the self-match
    (q_id == n_id, maximal dot) must always be rank 1."""
    out = QUERIES["similarity_topk_ivfpq"](spark, SF01).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q_id, rows in by_q.items():
        assert len(rows) == 10
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(range(1, 11))
        top = min(rows, key=lambda r: r["rank"])
        assert top["n_id"] == q_id  # self is the max int8 dot; ADC must keep it
        # rerank order is by exact int_dot, not by the ADC approximation
        ordered = sorted(rows, key=lambda r: r["rank"])
        dots = [r["int_dot"] for r in ordered]
        assert dots == sorted(dots, reverse=True)


def test_semantic_dedup_cell_cap_excludes_oversized_and_reports(spark):
    """Planted-degenerate-cell test: with 2 centroids most vectors land in
    few cells; a small max_cell_size must exclude the oversized cells from
    pair generation (members come back undecided, like singletons) and
    the report must name exactly the cells above the cap."""
    from etl_from_s3_to_postgresql_template_spark.operators.intquant import int8_centroids
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops5 import semantic_dedup_frame

    cen = int8_centroids(2)
    uncapped = semantic_dedup_frame(spark, SF01, centroids=cen)
    sizes = {
        r["cluster_id"]: r["n"]
        for r in uncapped.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cap = min(sizes.values())  # only the smallest cell survives the cap
    big_cells = {c for c, n in sizes.items() if n > cap}
    assert big_cells  # the plant worked: at least one oversized cell
    out, oversized = semantic_dedup_frame(
        spark, SF01, centroids=cen, max_cell_size=cap, return_oversized=True
    )
    rep = {r["cluster_id"]: r["cell_size"] for r in oversized.collect()}
    assert set(rep) == big_cells and all(rep[c] == sizes[c] for c in big_cells)
    rows = out.collect()
    assert len(rows) == sum(sizes.values())  # every vector still gets a row
    for r in rows:
        if r["cluster_id"] in big_cells:
            assert not r["is_semantic_dup"] and r["max_cos_smaller"] is None


def test_semantic_dedup_with_fitted_centroids(spark):
    """The production path: k-means centroids fitted on the corpus
    (operators/similarity.py::fit_ivf_centroids), rounded to the int8
    grid, drive the SAME semantic-dedup plan. Coverage and determinism
    must hold exactly as with the static artifact, and fitted cells must
    still surface the fixture's near-dup pairs."""
    from etl_from_s3_to_postgresql_template_spark.operators.similarity import (
        fit_ivf_centroids,
    )
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops5 import (
        semantic_dedup_frame,
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    fitted = fit_ivf_centroids(
        emb.select(F.col("embedding").alias("n_vec")), n_lists=8, seed=7
    )
    # int8 grid: same artifact shape as the seeded centroids; scale to the
    # int8 range so BIGINT distance arithmetic stays exact
    cen = [[int(round(x * 127)) for x in c] for c in fitted]
    out1 = semantic_dedup_frame(spark, SF01, centroids=cen).collect()
    out2 = semantic_dedup_frame(spark, SF01, centroids=cen).collect()
    n_emb = emb.count()
    assert len(out1) == n_emb and len({r["vec_id"] for r in out1}) == n_emb
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]  # deterministic
    assert sum(r["is_semantic_dup"] for r in out1) > 0
