"""One-off experiment: repeated-span gram-frequency pre-filter variants.

Compares, at the 500k-doc controlled-duplication corpus:
  A: current registered plan (window over gm)
  B: agg(min,max doc_id by gm) -> dup gm set -> semi-join positioned grams
     (AQE picks the join strategy)
Usage: python tools/exp_spans.py <docs_dir> [A|B|counts ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

N = 8


def _grams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    pat = r"(?:^| )(?=(\S+" + r" \S+" * (N - 1) + r"))"
    gram_strs = F.when(
        F.length(norm) > 0, F.regexp_extract_all(norm, F.lit(pat), F.lit(1))
    ).otherwise(F.array().cast("array<string>"))
    with_g = docs.select("doc_id", gram_strs.alias("g")).where(F.size("g") >= 1)
    return with_g.select("doc_id", F.posexplode("g").alias("pos0", "gs")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), F.xxhash64("gs").alias("gm")
    )


def variant_b(spark, sf_dir):
    grams = _grams(spark, sf_dir)
    dup = (
        grams.groupBy("gm")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .where(F.col("mn") != F.col("mx"))
        .select("gm")
    )
    hits = grams.join(dup, "gm", "left_semi").select("doc_id", "pos")
    grp = F.col("pos") - F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
    return (
        hits.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + N).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select("doc_id", "span_start", "span_tokens", "n_dup_grams")
        .orderBy("doc_id", "span_start")
    )


def main():
    sf_dir = sys.argv[1]
    which = sys.argv[2:] or ["counts", "B"]
    spark = get_spark("exp-spans")
    for w in which:
        t0 = time.perf_counter()
        if w == "counts":
            grams = _grams(spark, sf_dir)
            total = grams.count()
            t1 = time.perf_counter()
            dup = (
                grams.groupBy("gm")
                .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
                .where(F.col("mn") != F.col("mx"))
                .count()
            )
            print(
                f"counts: total_grams={total} ({t1 - t0:.1f}s) dup_gms={dup} "
                f"({time.perf_counter() - t1:.1f}s)"
            )
            continue
        df = QUERIES["docs_repeated_spans"](spark, sf_dir) if w == "A" else variant_b(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"{w}: {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
