"""A/B: docs_strip_markup codegen chain vs a fused single-pass Arrow
kernel (VERDICT r9 item 5).

The registered plan is 3 JVM regex passes + 5 literal replaces per doc
(plans/llm_ops11.py::docs_strip_markup). The candidate twin fuses the
whole transform into ONE mapInPandas kernel: one tag pass with an
accumulating replacement callback (so n_tag_chars needs no second
regex pass), the 5 entity replaces as C-level str.replace, one
whitespace-collapse pass — 2 regex passes total instead of 4, but in
Python's regex engine over Arrow-transferred strings instead of
Tungsten codegen.

Semantics are asserted identical on the measured corpus before timing
(row count + order-free sum of per-row xxhash64 over all columns).

Usage:
  python tools/exp_strip_markup.py --plan codegen [corpus_dir]
  python tools/exp_strip_markup.py --plan kernel  [corpus_dir]
  python tools/exp_strip_markup.py --check        [corpus_dir]

One fresh process per measured plan (the r8 sweep methodology:
cross-plan session contamination is documented in SCALING.md).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark

# The measured kernel IS the shipped one (review r10: an earlier
# private copy here would have silently diverged from the registered
# tier on any future functions/markup.py edit).
from etl_from_s3_to_postgresql_template_spark.functions.markup import (  # noqa: E402
    STRIP_SCHEMA,
    strip_markup_batches,
)


def kernel_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return docs.mapInPandas(strip_markup_batches, STRIP_SCHEMA).orderBy("doc_id")


def _fingerprint(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("doc_id", "clean_text", "n_tag_chars", "n_entity_chars")
        ).alias("h"),
    ).first()
    return row["n"], row["h"]


def _time_plan(mk, warms: int = 1, passes: int = 3) -> list[float]:
    for _ in range(warms):
        mk().write.format("noop").mode("overwrite").save()
    out = []
    for _ in range(passes):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def _calib() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(2_000_000):
        x ^= hash((i, i * 31))
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    argv = list(sys.argv[1:])
    mode = None
    if "--plan" in argv:
        i = argv.index("--plan")
        mode = argv[i + 1]
        del argv[i : i + 2]
    elif "--check" in argv:
        mode = "check"
        argv.remove("--check")
    elif "--ab" in argv:
        mode = "ab"
        argv.remove("--ab")
    corpus = argv[0] if argv else "/tmp/docs_scale/big"
    calib = _calib()
    spark = get_spark("exp-strip-markup")
    if mode == "check":
        a = _fingerprint(QUERIES["docs_strip_markup"](spark, corpus))
        b = _fingerprint(kernel_plan(spark, corpus))
        print(json.dumps({"mode": "check", "codegen": a, "kernel": b, "equal": a == b}))
        return
    if mode == "ab":
        # Same-session alternating passes (the exactsubstr A/B precedent):
        # fresh-process arms can land in different co-tenant regimes (one
        # pair measured calib 0.319 vs 1.628); alternation shares the
        # regime so the RATIO is trustworthy even when seconds are not.
        mk_a = lambda: QUERIES["docs_strip_markup"](spark, corpus)  # noqa: E731
        mk_b = lambda: kernel_plan(spark, corpus)  # noqa: E731
        for mk in (mk_a, mk_b):
            mk().write.format("noop").mode("overwrite").save()
        pairs = []
        for _ in range(3):
            t0 = time.perf_counter()
            mk_a().write.format("noop").mode("overwrite").save()
            ta = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            mk_b().write.format("noop").mode("overwrite").save()
            tb = round(time.perf_counter() - t0, 3)
            pairs.append({"codegen": ta, "kernel": tb})
        print(json.dumps({"mode": "ab", "corpus": corpus, "calib": calib, "pairs": pairs}))
        return
    mk = (
        (lambda: QUERIES["docs_strip_markup"](spark, corpus))
        if mode == "codegen"
        else (lambda: kernel_plan(spark, corpus))
    )
    passes = _time_plan(mk)
    print(
        json.dumps(
            {"mode": mode, "corpus": corpus, "calib": calib, "passes": passes, "best": min(passes)}
        )
    )


if __name__ == "__main__":
    main()
