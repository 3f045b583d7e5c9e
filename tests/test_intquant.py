"""Vectorized int kernels == the Catalyst expression forms, bit for bit.

The refactor claim (operators/intquant.py): the Arrow/numpy hot path
computes exactly what the interpreted HOF expression tree computed. These
tests pin that equivalence directly on the fixture, independent of the
oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.operators.intquant import (
    dot_long,
    int8_centroids,
    quantize_int8,
)

SF01 = "/root/testdata/sf0.01"


def _expression_quantized(emb):
    """The original Column-expression form (interpreted HOFs), kept here
    as the reference implementation."""
    max_abs = F.array_max(F.transform("embedding", lambda v: F.abs(v.cast("double"))))
    q8 = (
        emb.withColumn("max_abs", max_abs)
        .where(F.col("max_abs") > 0)
        .select(
            "vec_id",
            "max_abs",
            F.transform(
                "embedding",
                lambda v: F.floor(v.cast("double") * (F.lit(127.0) / F.col("max_abs")) + F.lit(0.5)),
            ).alias("q"),
        )
    )
    dot_qq = F.aggregate(
        F.zip_with("q", "q", lambda x, y: x * y), F.lit(0).cast("long"), lambda a, v: a + v
    )
    return q8.withColumn("nrm", dot_qq)


def test_quantize_matches_expression_form(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    fast = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    ref = {r["vec_id"]: r for r in _expression_quantized(emb).collect()}
    assert set(fast) == set(ref)
    for vid, r in ref.items():
        f = fast[vid]
        assert list(f["q"]) == list(r["q"])  # every int8 code identical
        assert f["nrm"] == r["nrm"]
        assert f["max_abs"] == r["max_abs"]  # same IEEE double, bit-equal


def test_assignment_matches_struct_sort_form(spark):
    """lids prefix == the array_sort-of-(d2, lid)-structs prefix."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    cen = int8_centroids(16)
    fast = {r["vec_id"]: list(r["lids"]) for r in quantize_int8(emb, centroids=cen).collect()}
    ref_q = _expression_quantized(emb)
    structs = []
    for i, c in enumerate(cen):
        lits = F.array(*[F.lit(v) for v in c])
        cc = sum(v * v for v in c)
        dot_qc = F.aggregate(
            F.zip_with("q", lits, lambda x, y: x * y.cast("long")),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        )
        structs.append(
            F.struct(
                (F.col("nrm") - F.lit(2) * dot_qc + F.lit(cc)).cast("long").alias("d2"),
                F.lit(i).alias("lid"),
            )
        )
    ref = {
        r["vec_id"]: [s["lid"] for s in r["dl"][:8]]
        for r in ref_q.withColumn("dl", F.array_sort(F.array(*structs))).collect()
    }
    assert fast == ref


def test_dot_long_matches_zip_with_fold(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    q = quantize_int8(emb).select("vec_id", "q")
    a = q.where(F.col("vec_id") < 20).select(F.col("vec_id").alias("ia"), F.col("q").alias("qa"))
    b = q.where(F.col("vec_id") < 20).select(F.col("vec_id").alias("ib"), F.col("q").alias("qb"))
    pairs = a.crossJoin(b)
    ref_dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    out = pairs.select("ia", "ib", dot_long("qa", "qb").alias("fast"), ref_dot.alias("ref"))
    assert out.where(F.col("fast") != F.col("ref")).count() == 0


def test_shingles_regex_form_equals_zip_with_form(spark):
    """The codegen-friendly regexp_extract_all shingle builder must emit
    BYTE-IDENTICAL arrays to the reference zip_with-of-slices form, for
    several k, including the short-text fallback."""
    import functools

    from etl_from_s3_to_postgresql_template_spark.functions.text import (
        shingles_col,
        tokens_col,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(9001, "one"), (9002, "two  tokens"), (9003, "  padded   text with   runs  "), (9004, "")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)

    def reference(text, k):
        toks = tokens_col(text)
        n = F.size(toks)
        m = F.greatest(n - (k - 1), F.lit(1))
        parts = [F.slice(toks, j + 1, m) for j in range(k)]
        joined = functools.reduce(
            lambda a, b: F.zip_with(a, b, lambda x, y: F.concat_ws(" ", x, y)), parts
        )
        return F.when(n >= k, joined).otherwise(F.array(F.concat_ws(" ", toks)))

    for k in (1, 2, 3, 5):
        bad = docs.select(
            shingles_col("text", k).alias("a"), reference("text", k).alias("b")
        ).where(F.col("a") != F.col("b"))
        assert bad.count() == 0, f"k={k}"


def test_cell_pair_max_cos_matches_join_form(spark):
    """The grouped blocked-gemm pair term must be BIT-IDENTICAL to the
    join-per-pair form it replaced (llm_ops5 round-5 rewrite) — including
    across gemm block boundaries (block_rows=3 forces multi-block cells)
    and on singleton cells (no row emitted)."""
    import numpy as np

    from etl_from_s3_to_postgresql_template_spark.operators.intquant import (
        cell_pair_max_cos,
        dot_long,
    )

    rng = np.random.default_rng(11)
    rows = []
    for vid in range(40):
        q = [int(x) for x in rng.integers(-127, 128, size=8)]
        rows.append((vid, vid % 5 if vid < 35 else 90 + vid, q, int(sum(v * v for v in q))))
    cells = spark.createDataFrame(
        rows, "vec_id long, cluster_id long, q array<long>, nrm long"
    )

    lo = cells.select(
        "cluster_id",
        F.col("vec_id").alias("lo_id"),
        F.col("q").alias("lo_q"),
        F.col("nrm").alias("lo_nrm"),
    )
    hi = cells.select("cluster_id", "vec_id", F.col("q").alias("hi_q"), F.col("nrm").alias("hi_nrm"))
    ref = (
        lo.join(hi, "cluster_id")
        .where(F.col("lo_id") < F.col("vec_id"))
        .withColumn("int_dot", dot_long("lo_q", "hi_q"))
        .withColumn(
            "cos",
            F.col("int_dot").cast("double")
            / F.sqrt((F.col("lo_nrm") * F.col("hi_nrm")).cast("double")),
        )
        .groupBy("vec_id")
        .agg(F.max("cos").alias("max_cos"))
    )
    got = {r["vec_id"]: r["max_cos"] for r in cell_pair_max_cos(cells, block_rows=3).collect()}
    want = {r["vec_id"]: r["max_cos"] for r in ref.collect()}
    assert got == want  # exact float equality: same IEEE op sequence
    # the 5 singleton cells (vec_id 35..39) must be absent, not null/-inf
    assert all(v not in got for v in range(35, 40))


def test_cogroup_pair_scores_matches_join_form(spark):
    """Cogrouped blocked cross-scoring == equi-join + per-pair dot +
    threshold, bit-for-bit, including keys present on only one side."""
    import numpy as np

    from etl_from_s3_to_postgresql_template_spark.operators.intquant import (
        cogroup_pair_scores,
        dot_long,
    )

    rng = np.random.default_rng(12)

    def mk(n, ids, key_mod):
        rows = []
        for i in range(n):
            q = [int(x) for x in rng.integers(-127, 128, size=8)]
            rows.append((ids + i, i % key_mod, q, int(sum(v * v for v in q))))
        return rows

    hold = spark.createDataFrame(mk(25, 1000, 4), "holdout_id long, list_id long, qh array<long>, nh long")
    train = spark.createDataFrame(mk(60, 2000, 6), "train_id long, list_id long, qt array<long>, nt long")
    # list_id 4,5 exist only on the train side; threshold 0.0 keeps ~half
    ref = (
        hold.join(train, "list_id")
        .withColumn("int_dot", dot_long("qh", "qt"))
        .withColumn(
            "cos",
            F.col("int_dot").cast("double") / F.sqrt((F.col("nh") * F.col("nt")).cast("double")),
        )
        .where(F.col("cos") >= 0.0)
        .select("holdout_id", "train_id", "int_dot", "cos")
    )
    got = cogroup_pair_scores(
        hold, train, "list_id", "holdout_id", "train_id", min_cos=0.0, block_rows=7
    )
    key = lambda r: (r["holdout_id"], r["train_id"])
    gm = {key(r): (r["int_dot"], r["cos"]) for r in got.collect()}
    rm = {key(r): (r["int_dot"], r["cos"]) for r in ref.collect()}
    assert gm == rm


def test_char_class_counts_equal_regex_forms(spark):
    """The one-pass Arrow class counter must equal the regexp_replace
    complement forms count-for-count — on the fixture corpus plus planted
    edge strings (empty, null, digits-only, unicode letters incl.
    multi-byte, whitespace runs, punctuation runs)."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import char_class_counts

    docs = spark.read.parquet(f"{SF01}/documents.parquet").select("text")
    extra = spark.createDataFrame(
        [
            ("",),
            (None,),
            ("12345",),
            ("héllo wörld é 的是 9!",),
            ("   ",),
            ("...,,,!!!???;;;:::",),
            ("a1.b2,c3!",),
        ],
        "text string",
    )
    docs = docs.unionByName(extra)
    cc = char_class_counts("text")
    checked = docs.select(
        cc.getField("n_alpha").alias("fa"),
        cc.getField("n_digit").alias("fd"),
        cc.getField("n_punct").alias("fp"),
        cc.getField("n_space").alias("fs"),
        F.length(F.regexp_replace("text", r"[^A-Za-z]", "")).cast("long").alias("ra"),
        F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long").alias("rd"),
        F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast("long").alias("rp"),
        F.length(F.regexp_replace("text", r"[^ ]", "")).cast("long").alias("rs"),
    )
    bad = checked.where(
        ~(
            F.col("fa").eqNullSafe(F.col("ra"))
            & F.col("fd").eqNullSafe(F.col("rd"))
            & F.col("fp").eqNullSafe(F.col("rp"))
            & F.col("fs").eqNullSafe(F.col("rs"))
        )
    )
    assert bad.count() == 0


def test_char_class_counts_oversized_doc_fallback(spark):
    """A doc over the 2^21-byte packed-lane bound must NOT fail the job
    (ADVICE r5: one >2MB doc at corpus scale would previously raise and
    kill the whole batch): oversized rows route through the unpacked
    per-class fallback and still count exactly, and normal rows sharing
    the batch are unaffected."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import char_class_counts

    big = "ab1. " * ((1 << 19) + 100)  # 5 bytes/rep -> > 2^21 bytes
    reps = (1 << 19) + 100
    docs = spark.createDataFrame(
        [(0, big), (1, "small a1. doc"), (2, None)], "doc_id long, text string"
    ).repartition(1)  # same Arrow batch: oversized + normal + null together
    cc = char_class_counts("text")
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            cc.getField("n_alpha").alias("na"),
            cc.getField("n_digit").alias("nd"),
            cc.getField("n_punct").alias("np"),
            cc.getField("n_space").alias("ns"),
        ).collect()
    }
    assert rows[0]["na"] == 2 * reps
    assert rows[0]["nd"] == reps
    assert rows[0]["np"] == reps
    assert rows[0]["ns"] == reps
    assert (rows[1]["na"], rows[1]["nd"], rows[1]["np"], rows[1]["ns"]) == (9, 1, 1, 2)
    assert rows[2]["na"] is None


def test_quality_columns_single_arrow_eval(spark):
    """All field extractions of the class-count struct must collapse to
    ONE ArrowEvalPython (one Arrow pass over the text), not one per
    field."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import quality_columns

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    q = quality_columns("text")
    plan = (
        docs.select("doc_id", *[c.alias(n) for n, c in q.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
