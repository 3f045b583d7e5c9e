"""Semantic tests for the round-3 wave-2 operators: planted cases with
hand-computable answers, complementing the DuckDB oracle agreement that
tests/test_queries.py already enforces."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestRepeatedSpans:
    """docs_repeated_spans finds maximal cross-document token spans whose
    every 8-gram occurs in >=2 docs."""

    def _spans(self, spark, docs):
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            docs_repeated_spans,
        )
        import etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 as m

        # run the registered plan against a temp parquet dir built from docs
        import tempfile, os

        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        return docs_repeated_spans(spark, d).collect()

    def test_planted_shared_span_found_with_exact_bounds(self, spark):
        # 12 shared tokens (positions 5..16 in doc 1, 1..12 in doc 2)
        # => 8-gram windows at spans of length 12 - 8 + 1 = 5 grams,
        # merged into ONE maximal island per doc of span_tokens=12.
        shared = " ".join(f"tok{i}" for i in range(12))
        uniq_a = " ".join(f"aaa{i}" for i in range(4))
        uniq_b = " ".join(f"bbb{i}" for i in range(9))
        docs = _docs(
            spark,
            [
                (1, f"{uniq_a} {shared}", "s1"),
                (2, f"{shared} {uniq_b}", "s1"),
            ],
        )
        rows = {r["doc_id"]: r for r in self._spans(spark, docs)}
        assert rows[1]["span_start"] == 5 and rows[1]["span_tokens"] == 12
        assert rows[2]["span_start"] == 1 and rows[2]["span_tokens"] == 12
        assert rows[1]["n_dup_grams"] == 5 and rows[2]["n_dup_grams"] == 5

    def test_no_cross_doc_repeat_no_spans(self, spark):
        docs = _docs(
            spark,
            [
                (1, " ".join(f"a{i}" for i in range(20)), "s1"),
                (2, " ".join(f"b{i}" for i in range(20)), "s1"),
            ],
        )
        assert self._spans(spark, docs) == []

    def test_within_doc_repeat_alone_not_flagged(self, spark):
        # a doc repeating its own 8-gram (twice) but shared with no other
        # doc: the cross-doc test is min(doc_id) != max(doc_id), so pure
        # self-repetition must not produce spans.
        eight = " ".join(f"x{i}" for i in range(8))
        docs = _docs(
            spark,
            [
                (1, f"{eight} filler1 filler2 {eight}", "s1"),
                (2, " ".join(f"z{i}" for i in range(20)), "s1"),
            ],
        )
        assert self._spans(spark, docs) == []


class TestHeavyHittersGate:
    def test_misra_gries_superset_guarantee_planted(self, spark):
        # one token at 30% frequency, long uniform tail; MG(k=50) per
        # partition must retain it, and the gate must report it found.
        import tempfile, os

        rows = [(i, ("hot " * 30) + " ".join(f"w{i}_{j}" for j in range(70)), "s", 100)
                for i in range(50)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            tokens_heavy_hitters_gate,
        )

        out = tokens_heavy_hitters_gate(spark, d).collect()[0]
        assert out["n_heavy"] == 1  # only 'hot' exceeds N/50
        assert out["all_heavy_found"] is True


class TestZoneMapAndZorder:
    def test_zone_map_skippable_iff_range_misses_day(self, spark):
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            events_zone_map_skip,
        )

        rows = events_zone_map_skip(spark, "/root/testdata/sf0.001").collect()
        import datetime

        lo = datetime.datetime(2024, 1, 15)
        hi = datetime.datetime(2024, 1, 16)
        for r in rows:
            overlaps = r["min_ts"] < hi and r["max_ts"] >= lo
            assert r["skippable"] == (not overlaps)

    def test_zorder_buckets_tighter_than_random_layout(self, spark):
        # figure of merit: total bbox area under z-order must beat bucketing
        # by raw event_id (which is uncorrelated with (user_id, value)).
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            events_zorder_layout,
        )
        from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

        z = events_zorder_layout(spark, "/root/testdata/sf0.001").collect()
        z_area = sum(r["bbox_area"] for r in z)

        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id",
            F.col("user_id").alias("x"),
            F.floor(F.col("value") / 2.0).cast("long").alias("y"),
        )
        from pyspark.sql import Window as W

        naive = (
            ev.withColumn("b", F.ntile(16).over(W.orderBy("event_id")))
            .groupBy("b")
            .agg(
                ((F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)).alias("area")
            )
            .agg(F.sum("area"))
            .collect()[0][0]
        )
        assert z_area < naive


class TestLeakageScan:
    def test_planted_cross_split_duplicate_detected(self, spark):
        # vec_id 0 hashes to holdout (md5('0')='cfcd2084...' -> 'c', train);
        # find one holdout id and one train id, plant identical vectors.
        import hashlib, tempfile, os

        def is_holdout(i):
            return hashlib.md5(str(i).encode()).hexdigest()[0] in ("0", "1")

        hold = next(i for i in range(100) if is_holdout(i))
        train = next(i for i in range(100) if not is_holdout(i))
        other = next(i for i in range(100) if not is_holdout(i) and i != train)
        v = [float(j % 7 - 3) for j in range(16)]
        w = [float((j * 3) % 5 - 2) for j in range(16)]
        rows = [(hold, v, 0), (train, v, 0), (other, w, 1)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        d = tempfile.mkdtemp()
        emb.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            split_leakage_scan,
        )

        out = split_leakage_scan(spark, d).collect()
        pairs = {(r["holdout_id"], r["train_id"]): r["cos_q"] for r in out}
        assert pairs[(hold, train)] == 1.0  # identical vector -> exact cosine 1


class TestParetoAbc:
    def test_classes_partition_and_order(self, spark):
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            orders_pareto_abc,
        )
        from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

        rows = orders_pareto_abc(spark, "/root/testdata/sf0.001").collect()
        by_cls = {r["abc_class"]: r for r in rows}
        n_cust = (
            load_table(spark, "/root/testdata/sf0.001", "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert sum(r["n_customers"] for r in rows) == n_cust
        # boundary invariants: A holds at most 50% of revenue, A+B at most
        # 80% (the class of the customer that CROSSES a boundary is the
        # next class, by the <= threshold on cumulative share). The fixture
        # revenue is near-uniform, so no Pareto-shape assertion — the
        # operator classifies by share, it doesn't create skew.
        total = sum(r["class_revenue"] for r in rows)
        assert by_cls["A"]["class_revenue"] / total <= 0.5
        assert (by_cls["A"]["class_revenue"] + by_cls["B"]["class_revenue"]) / total <= 0.8
