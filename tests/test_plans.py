"""Physical-plan assertions: the plan *shape* is part of the contract.

A correct-but-mis-planned query (filter not pushed, dim not broadcast,
accidental cartesian) passes value checks and then dies at 100 TB; these
tests pin the properties that matter."""

from __future__ import annotations

import pytest

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_and_columns_pruned(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]  # pruned
    # map-side combine: partial aggregation must run before the exchange
    simple = (
        QUERIES["q1_pricing_summary"](spark, SF)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert "partial_sum" in simple


def test_q6_all_predicates_pushed(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    scan = plan.split("PushedFilters")[1].splitlines()[0]
    for col in ["l_shipdate", "l_discount", "l_quantity"]:
        assert col in scan, f"{col} not pushed: {scan}"


def test_broadcast_dim_joins_are_broadcast(spark):
    for name in ["join_broadcast_dim", "q5_region_revenue", "q10_returned_items"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_topn_uses_take_ordered(spark):
    plan = _plan(spark, "sort_limit_topn")
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_no_accidental_cartesian(spark):
    # BNLJ/cross is legitimate ONLY where semantics demand it
    allowed = {
        "similarity_topk_bruteforce",
        "dedup_embedding_pairs",
        "join_range_bands",
        # quantized/binary search tiers: same broadcast-queries brute-force
        # contract as similarity_topk_bruteforce
        "similarity_topk_int8",
        "similarity_topk_hamming",
    }
    for name in sorted(QUERIES):
        if name in allowed or name.startswith(("streaming_", "multimodal_", "scan_")):
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_window_queries_partition_before_sort(spark):
    # a Window.orderBy without partitionBy collapses to a single task
    for name in ["window_topk_per_group", "window_running_sum", "dedup_latest_per_key"]:
        plan = _plan(spark, name)
        assert "SinglePartition" not in plan.split("Window")[0].splitlines()[-1], name


def test_salted_join_equivalence(spark):
    from etl_from_s3_to_postgresql_template_spark.operators.skew import salted_join
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    n = load_table(spark, SF, "nation")
    r = load_table(spark, SF, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    plain = n.join(r, "n_regionkey").select("n_nationkey", "r_name")
    salted = salted_join(n, r, "n_regionkey").select("n_nationkey", "r_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_cube_expands_single_scan(spark):
    plan = _plan(spark, "agg_cube_orders")
    assert "Expand" in plan  # grouping sets expand map-side...
    simple = (
        QUERIES["agg_cube_orders"](spark, SF)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert simple.count("FileScan") == 1  # ...over ONE scan of orders


def test_rolling_sum_uses_range_frame(spark):
    plan = _plan(spark, "window_rolling_hour_sum")
    assert "RangeFrame" in plan  # time-range frame, not RowFrame
    assert "SinglePartition" not in plan  # partitioned by user_id


def test_q20_uses_semi_joins(spark):
    plan = _plan(spark, "q20_promo_supplier_semi")
    assert "LeftSemi" in plan  # both nestings stay semi (no payload dup)


def test_minhash_pairs_self_join_is_smj(spark):
    """The bucket-key self-join must be a shuffle join (skew-splittable,
    no UDF-branch duplication through a broadcast)."""
    from etl_from_s3_to_postgresql_template_spark.operators.dedup import minhash_candidates
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    docs = load_table(spark, SF, "documents")
    plan = minhash_candidates(docs)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" in plan


def test_q2_single_window_no_self_join(spark):
    # Correlated-min via row_number: one Window, one shuffle on l_partkey,
    # no groupBy-min + join-back (which would double the lineitem shuffles).
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "Window" in plan
    assert plan.count("SortMergeJoin") == 0  # all dims broadcast
    assert "BroadcastHashJoin" in plan


def test_q12_date_predicate_not_pushed_but_join_is_equi(spark):
    # l_shipdate > o_orderdate + 45d is a residual on the equi-join, not a
    # cartesian: the join itself must stay hash/merge on l_orderkey.
    plan = _plan(spark, "q12_late_lines_priority")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q16_anti_join_is_broadcast(spark):
    # The NOT IN exclusion list (6 suppliers) must compile to a broadcast
    # left-anti, never a shuffle.
    plan = _plan(spark, "q16_supplier_part_counts")
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )


def test_q21_semi_and_anti_with_residual(spark):
    # EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, both with the suppkey<>
    # residual conjunct on an equi l_orderkey join (no nested-loop).
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q15_max_is_broadcast_scalar(spark):
    # The MAX(total_revenue) scalar joins back via broadcast (1 row), and
    # the supplier dim is broadcast too — no shuffle beyond the groupBy.
    plan = _plan(spark, "q15_top_supplier")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_hinted_broadcast_on_sf_scaled_tables(spark):
    """Explicit broadcast hints are reserved for tables whose size is
    CONSTANT in SF (nation=25, region=5) or 1-row aggregates. part and
    supplier grow with SF, so a hard hint on them overrides AQE's size
    check and OOMs at 100x scale (SCALING.md) — assert none exists in any
    registered query by auditing the analyzed logical plan: the first
    Relation directly under a ResolvedHint (no cardinality-reducing
    Aggregate in between) must not be the part/supplier table."""
    for name in sorted(QUERIES):
        if name.startswith(("streaming_", "multimodal_", "scan_")):
            continue
        df = QUERIES[name](spark, SF)
        tree = df._jdf.queryExecution().analyzed().treeString()
        lines = tree.splitlines()
        for i, line in enumerate(lines):
            if "ResolvedHint" not in line:
                continue
            depth = len(line) - len(line.lstrip(" :+-"))
            for sub in lines[i + 1 :]:
                sub_depth = len(sub) - len(sub.lstrip(" :+-"))
                if sub_depth <= depth:
                    break  # left the hint's subtree
                if "Aggregate" in sub:
                    break  # 1-row/grouped scalar: cardinality no longer the relation's
                if "Relation" in sub:
                    assert not any(
                        c in sub
                        for c in (
                            "p_partkey",
                            "s_suppkey",
                            "o_orderkey,",
                            "c_custkey,",
                            # corpus-scaled tables: a hint here OOMs at 100 TB
                            "doc_id,",
                            "vec_id,",
                            "event_id,",
                        )
                    ), f"{name}: broadcast hint on an SF-scaled table:\n{sub}"
                    break


def test_dynamic_partition_pruning_on_partitioned_lake(spark, tmp_path):
    """Joining a day-partitioned lake table against a filtered dim must
    insert a dynamic-pruning subquery on the partition column — at 100 TB
    this is what keeps a fact-dim join from scanning every partition when
    the selective filter sits on the dim side."""
    import pyspark.sql.functions as F

    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    ev = load_table(spark, SF, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "lake")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("2024-01-03", "keep"), ("2024-01-05", "drop")], "day string, tag string"
    ).where(F.col("tag") == "keep")
    joined = fact.join(dim, "day")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "dynamicpruning" in plan.lower()
    assert joined.count() == ev.where(F.col("day") == "2024-01-03").count()


def test_runtime_bloom_filter_injected_on_selective_join(spark):
    """Spark's runtime row-level filtering: a selective dim-side filter
    makes the optimizer build a bloom filter and inject might_contain on
    the fact side's scan, pruning shuffle input before the join. The
    size thresholds default to 10 GB scans — correct in production, never
    reached at fixture scale — so the test lowers them (restored after)
    purely to prove the engine configuration supports the rewrite."""
    import pyspark.sql.functions as F

    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").where(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "o_totalprice")
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "might_contain" in plan.lower()
        # bloom filters admit false positives only: the join result is exact
        expected = (
            load_table(spark, SF, "lineitem")
            .join(
                load_table(spark, SF, "orders").where(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_split_leakage_scan_is_blocked(spark):
    """The registered leakage audit must be the IVF-blocked plan: every join
    an equi-join (list_id candidates, then rescore) — no unblocked cross
    join anywhere. The all-pairs form lives only in split_leakage_scan_exact
    (the fixture-scale ground truth)."""
    plan = _plan(spark, "split_leakage_scan")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r6_classifier_and_bm25_plan_shapes(spark):
    """Round-6 single-scan entries: the classifier is shuffle-free (one
    projection over the scan, only the output sort exchanges); BM25 reads
    only (doc_id, text) and reduces corpus stats with a partial (map-side)
    aggregate before its single-row exchange."""
    simple = QUERIES["docs_quality_classifier"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # one scan; the output-sort rangepartitioning is the only exchange
    exchanges = [ln for ln in simple.splitlines() if "Exchange" in ln]
    assert all("rangepartitioning" in ln for ln in exchanges), exchanges
    plan = _plan(spark, "docs_quality_classifier")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan

    bm25 = QUERIES["text_bm25_topk"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "partial_count" in bm25 or "partial_sum" in bm25  # map-side combine
    # r8 single-scan restructure: both consumers read the materialized
    # per-doc counts frame (doc_id + dl + per-term tf, no text column) —
    # the corpus text is tokenized exactly once, behind the checkpoint
    assert "Scan ExistingRDD[doc_id" in bm25
    for ln in bm25.splitlines():
        if "Scan ExistingRDD" in ln:
            assert "text" not in ln and "dl" in ln and "tf1" in ln, ln


def test_r6_range_query_corpus_never_shuffles(spark):
    """The IVF range search must not exchange the candidate side on any
    corpus-sized key: allowed exchanges are the 16-row cell summary, the
    query side, and single-partition collapses — never hashpartitioning
    on n_id/doc-sized data before the verify filter."""
    plan = _plan(spark, "similarity_range_query")
    body = plan.split("== Physical Plan ==")[-1]
    for ln in body.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "n_id" not in ln, ln
    assert "CartesianProduct" not in plan


def test_r6_ppjoin_and_chunk_dedup_plan_shapes(spark):
    """Chunk dedup must map-side combine its chunk-hash count (visible:
    the count runs after the kernel checkpoint); PPJoin's prefix subtree
    sits behind a lazy localCheckpoint (by design — it feeds two legs),
    so assert its scan-side contract instead: only (doc_id, text) read,
    no cartesian anywhere."""
    simple = QUERIES["docs_chunk_dedup_stats"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "partial_count" in simple
    plan = _plan(spark, "dedup_jaccard_prefix_filter")
    assert "CartesianProduct" not in plan
    # the scans sit behind the shingle frame's lazy localCheckpoint, so
    # assert column pruning on the pre-checkpoint frame it wraps
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.text import shingles_col
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    sh = load_table(spark, SF, "documents").select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles_col("text", 3), lambda g: F.xxhash64(g))
        ).alias("s"),
    )
    inner = sh._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in inner
