"""Multimodal queries (north-star E4): rows-only driver checks over the
deterministic synthetic media table (binary payloads are not meaningfully
SQL-expressible in the DuckDB oracle; pytest covers exact semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
    synthetic_media_table,
)
from etl_from_s3_to_postgresql_template_spark.plans.registry import query


@query("multimodal_decode_meta")
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: decode binary containers -> typed metadata (deterministic)."""
    media = synthetic_media_table(spark, n=300)
    return decode_media(media).select(
        "media_id", "kind", "fmt", "width", "height", "sample_rate",
        "n_samples", "n_frames", "payload_bytes",
    ).orderBy("media_id")


@query("multimodal_feature_norms")
def multimodal_feature_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: binary -> feature vector (stub extractor), reporting L2 norms."""
    from etl_from_s3_to_postgresql_template_spark.functions.vectors import norm_col

    media = synthetic_media_table(spark, n=300)
    feats = extract_features(media)
    return feats.select(
        "media_id", F.round(norm_col(F.col("feature")), 6).alias("feature_norm")
    ).orderBy("media_id")


@query("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: video frame sampling -> (media_id, frame_idx, frame md5)."""
    media = synthetic_media_table(spark, n=300)
    return (
        sample_frames(media, every=2)
        .select("media_id", "frame_idx", F.md5("frame").alias("frame_md5"))
        .orderBy("media_id", "frame_idx")
    )
