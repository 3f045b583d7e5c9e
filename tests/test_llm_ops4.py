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


class TestWauRolling:
    def test_hand_computed_wau(self, spark):
        import tempfile, os

        rows = [
            # (event_id, ts, user) — 3 days, users overlap
            (1, "2024-01-01 01:00:00", 10),
            (2, "2024-01-01 02:00:00", 11),
            (3, "2024-01-02 01:00:00", 10),
            (4, "2024-01-09 01:00:00", 12),  # 8 days later: day1/2 outside its window
        ]
        ev = spark.createDataFrame(
            [(i, t, u, "click", 1.0, "{}") for i, t, u in rows],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        d = tempfile.mkdtemp()
        ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import events_wau_rolling

        got = {r["day"].strftime("%Y-%m-%d"): r["wau"] for r in events_wau_rolling(spark, d).collect()}
        # day1: {10,11}; day2: day1+day2 {10,11}; day9 (>6d after day2): {12}
        assert got == {"2024-01-01": 2, "2024-01-02": 2, "2024-01-09": 1}


class TestNullSafeJoin:
    def test_null_bucket_survives(self, spark):
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import join_null_safe

        rows = join_null_safe(spark, "/root/testdata/sf0.001").collect()
        keys = [r["k"] for r in rows]
        assert None in keys  # the whole point: NULL==NULL under <=>
        # and the NULL bucket's counts equal the user_id%10==0 slices
        from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        nc = ev.where((F.col("user_id") % 10 == 0) & (F.col("event_type") == "click")).count()
        nv = ev.where((F.col("user_id") % 10 == 0) & (F.col("event_type") == "view")).count()
        null_row = next(r for r in rows if r["k"] is None)
        assert (null_row["n_click"], null_row["n_view"]) == (nc, nv)


class TestTopkWithTies:
    def test_ties_all_surface(self, spark):
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import (
            window_topk_with_ties,
        )

        rows = window_topk_with_ties(spark, "/root/testdata/sf0.001").collect()
        # rank semantics: within a customer, equal rounded prices share a
        # rank, and every rnk<=2 row appears — so a customer may have >2 rows
        by_cust: dict = {}
        for r in rows:
            by_cust.setdefault(r["o_custkey"], []).append(r)
        for cust, rs in by_cust.items():
            rnks = sorted(r["rnk"] for r in rs)
            assert rnks[0] == 1
            assert all(r <= 2 for r in rnks)
