"""Corpus-preparation pipeline: raw documents -> training-ready shards.

The end-to-end composition of the E1/E3/E6 operators, in the order a
pretraining data pipeline actually runs them (cheapest cut first, so every
later, more expensive stage sees fewer bytes):

1. quality gate    — length + alpha-ratio thresholds (row-local, no shuffle)
2. exact dedup     — min-id winner per normalized text (1 shuffle)
3. decontaminate   — drop docs sharing an 8-gram with the benchmark split
                     (broadcast semi-join, no corpus shuffle)
4. split           — md5 train/holdout assignment (row-local)
5. pack            — per-bucket sequence chunking (1 shuffle)

Mechanically the pipeline builds ONE annotated frame (every doc + a flag
per stage) and derives both the clean output and the funnel report from
it: the report is one conditional-aggregate pass, not one count() job per
stage — at 100 TB, five count() jobs would quintuple the scan bill. All
stage decisions are deterministic (md5 splits, min-id dedup winners), so
re-running the pipeline on the same input reproduces the same corpus
bit-for-bit — the auditability property the whole repo is built around.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.functions.text import quality_columns
from etl_from_s3_to_postgresql_template_spark.operators.corpus import (
    benchmark_flag_col,
    decontaminate,
    md5_prefix_col,
    pack_sequences,
)
from etl_from_s3_to_postgresql_template_spark.operators.dedup import dedup_exact_by_hash

__all__ = ["CorpusStats", "annotate_corpus", "prepare_corpus", "corpus_funnel_stats"]


@dataclass
class CorpusStats:
    input_docs: int
    after_quality: int
    after_dedup: int
    after_decontam: int
    train_docs: int
    holdout_docs: int


def annotate_corpus(
    docs: DataFrame,
    min_chars: int = 50,
    min_alpha_ratio: float = 0.5,
    ngram: int = 8,
    use_classifier: bool = False,
) -> DataFrame:
    """One frame, one flag per funnel stage. Flags are CUMULATIVE in the
    pipeline order (a doc only reaches dedup if it passed quality), so the
    funnel report is a stack of conditional counts over this single frame.

    ``use_classifier=True`` inserts the round-6 hashed linear classifier
    (functions/text.py::hashed_margin_col — the fasttext-shaped model
    gate) between the rule gate and dedup: ``ok_quality`` then requires
    BOTH the shape rules and a non-negative margin, still row-local and
    shuffle-free, so every downstream flag and the funnel report compose
    unchanged. Default off: the rule-only funnel stays bit-identical to
    prior rounds.

    Join shapes: the dedup-winner and contamination sets are (doc_id)-only
    frames joined back; both shuffles carry 8-byte keys. Decontamination
    itself never shuffles the corpus (broadcast benchmark hash set)."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import hashed_margin_col

    q = quality_columns("text")
    rule_ok = (F.length("text") >= min_chars) & (q["alpha_ratio"] >= min_alpha_ratio)
    if use_classifier:
        rule_ok = rule_ok & (hashed_margin_col("text") >= 0)
    gated = docs.withColumn("ok_quality", rule_ok)
    survivors = gated.where("ok_quality")
    winners = dedup_exact_by_hash(survivors).select("doc_id", F.lit(True).alias("ok_dedup"))
    contaminated = decontaminate(survivors, n=ngram).select(
        "doc_id", F.lit(True).alias("is_contaminated")
    )
    return (
        gated.join(winners, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .withColumn("ok_dedup", F.col("ok_quality") & F.coalesce("ok_dedup", F.lit(False)))
        .withColumn(
            "ok_decontam",
            F.col("ok_dedup")
            & ~F.coalesce("is_contaminated", F.lit(False))
            & ~benchmark_flag_col("doc_id"),
        )
        .withColumn(
            # Holdout keys off first-hex in {2,3} — DISJOINT from the
            # benchmark split's {0,1} (which already left the pool), so
            # ~1/7 of surviving docs hold out.
            "split",
            F.when(~F.col("ok_decontam"), F.lit(None).cast("string"))
            .when(md5_prefix_col("doc_id").isin("2", "3"), "holdout")
            .otherwise("train"),
        )
        .drop("is_contaminated")
    )


def prepare_corpus(
    docs: DataFrame,
    min_chars: int = 50,
    min_alpha_ratio: float = 0.5,
    ngram: int = 8,
    capacity: int = 2048,
) -> tuple[DataFrame, DataFrame]:
    """Run the full prep funnel; returns (clean_docs, packed_chunks).

    ``clean_docs``: (doc_id, text, lang, source, split) — quality-gated,
    exact-deduped, decontaminated (benchmark-split docs also leave: they
    ARE the benchmark). ``packed_chunks``: sequence chunks of the TRAIN
    split only — holdout exists to be read, not trained on."""
    ann = annotate_corpus(docs, min_chars, min_alpha_ratio, ngram)
    clean = ann.where("ok_decontam").select("doc_id", "text", "lang", "source", "split")
    packed = pack_sequences(clean.where(F.col("split") == "train"), capacity=capacity)
    return clean, packed


def corpus_funnel_stats(annotated: DataFrame) -> CorpusStats:
    """The whole funnel in ONE aggregation job over the annotated frame."""
    row = annotated.agg(
        F.count(F.lit(1)).alias("input_docs"),
        F.sum(F.col("ok_quality").cast("long")).alias("after_quality"),
        F.sum(F.col("ok_dedup").cast("long")).alias("after_dedup"),
        F.sum(F.col("ok_decontam").cast("long")).alias("after_decontam"),
        F.sum((F.col("split") == "train").cast("long")).alias("train_docs"),
        F.sum((F.col("split") == "holdout").cast("long")).alias("holdout_docs"),
    ).collect()[0]
    return CorpusStats(**{k: int(row[k]) for k in row.asDict()})
