"""Multimodal queries (north-star E4) over the deterministic synthetic
media table. decode and frame-sample are ORACLE-paired: every metadata
field (and even the md5 of each sampled frame) is a closed-form function
of media_id, so DuckDB reconstructs the expected output from range() —
the oracle checks the full encode->decode round trip without ever holding
a blob. feature_norms stays rows-only (the byte-histogram stub is not
worth re-expressing in SQL); pytest covers its exact semantics."""

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


@query(
    "multimodal_decode_meta",
    oracle="""
    SELECT media_id,
           CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
           CASE media_id % 3 WHEN 0 THEN CAST(16 + (media_id % 8) * 4 AS INT)
                WHEN 2 THEN 32 END AS width,
           CASE media_id % 3 WHEN 0 THEN CAST(16 + (media_id % 5) * 4 AS INT)
                WHEN 2 THEN 24 END AS height,
           CASE media_id % 3 WHEN 1 THEN 8000 END AS sample_rate,
           CASE media_id % 3 WHEN 1 THEN CAST(256 + (media_id % 16) * 32 AS INT) END AS n_samples,
           CASE media_id % 3 WHEN 2 THEN CAST(2 + media_id % 6 AS INT) END AS n_frames,
           CAST(CASE media_id % 3
                WHEN 0 THEN (16 + (media_id % 8) * 4) * (16 + (media_id % 5) * 4)
                WHEN 1 THEN 256 + (media_id % 16) * 32
                ELSE (2 + media_id % 6) * 64 END AS BIGINT) AS payload_bytes
    FROM range(300) t(media_id)
    ORDER BY media_id
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: decode binary containers -> typed metadata. Oracle-paired: the
    synthetic container fields are closed-form in media_id, so the oracle
    validates the whole encode->parse round trip (a header-layout bug on
    either side breaks the hash match)."""
    media = synthetic_media_table(spark, n=300)
    return decode_media(media).select(
        "media_id", "kind", "fmt", "width", "height", "sample_rate",
        "n_samples", "n_frames", "payload_bytes",
    ).orderBy("media_id")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
      SELECT media_id, CAST(2 + media_id % 6 AS INT) AS nf
      FROM range(300) t(media_id) WHERE media_id % 3 = 2
    ),
    f AS (
      SELECT media_id, CAST(u.k AS INT) AS frame_idx
      FROM v, UNNEST(range(nf)) u(k)
      WHERE u.k % 2 = 0
    )
    SELECT media_id, frame_idx,
           md5(media_id || ':' || (frame_idx * 4))
            || md5(media_id || ':' || (frame_idx * 4 + 1))
            || md5(media_id || ':' || (frame_idx * 4 + 2))
            || md5(media_id || ':' || (frame_idx * 4 + 3)) AS frame_hex
    FROM f
    ORDER BY media_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: video frame sampling -> (media_id, frame_idx, frame bytes as
    hex). Oracle-paired down to the BYTES: each 64-byte frame is four md5
    digests of '{id}:{i}' concatenated, so the oracle's expected hex IS
    the digest concatenation — payload slicing must be byte-exact, not
    just shape-exact."""
    media = synthetic_media_table(spark, n=300)
    return (
        sample_frames(media, every=2)
        .select("media_id", "frame_idx", F.lower(F.hex("frame")).alias("frame_hex"))
        .orderBy("media_id", "frame_idx")
    )


@query(
    "multimodal_resize_decode",
    oracle="""
    SELECT media_id,
           CASE media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
           CASE media_id % 3 WHEN 0 THEN 8 WHEN 2 THEN 32 END AS width,
           CASE media_id % 3 WHEN 0 THEN 8 WHEN 2 THEN 24 END AS height,
           CAST(CASE media_id % 3
                WHEN 0 THEN 64
                WHEN 1 THEN 256 + (media_id % 16) * 32
                ELSE (2 + media_id % 6) * 64 END AS BIGINT) AS payload_bytes
    FROM range(300) t(media_id)
    ORDER BY media_id
    """,
)
def multimodal_resize_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: resize -> decode round trip. Images re-encode at 8x8 (payload
    shrinks to 64 bytes), audio/video pass through untouched — the oracle
    pins both the transformed and the passed-through metadata."""
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import resize_images

    media = synthetic_media_table(spark, n=300)
    return (
        decode_media(resize_images(media, 8, 8))
        .select("media_id", "fmt", "width", "height", "payload_bytes")
        .orderBy("media_id")
    )


@query(
    "multimodal_feature_hist",
    oracle="""
    WITH m AS (
      SELECT media_id,
             CAST(CASE media_id % 3
                  WHEN 0 THEN (16 + (media_id % 8) * 4) * (16 + (media_id % 5) * 4)
                  WHEN 1 THEN 256 + (media_id % 16) * 32
                  ELSE (2 + media_id % 6) * 64 END AS BIGINT) AS n
      FROM range(300) t(media_id)
    ), hx AS (
      SELECT media_id, n,
             array_to_string(list_transform(range(CAST(ceil(n / 16.0) AS BIGINT)),
                                            i -> md5(media_id || ':' || i)), '') AS hexfull
      FROM m
    ), ch AS (
      SELECT media_id,
             instr('0123456789abcdef', substr(hexfull, CAST(2 * p.k + 2 AS BIGINT), 1)) - 1 AS v
      FROM hx, UNNEST(range(n)) p(k)
    ), hist AS (
      SELECT media_id, v, COUNT(*) AS c FROM ch GROUP BY media_id, v
    ), spine AS (
      SELECT m.media_id, j.v
      FROM m CROSS JOIN (SELECT UNNEST(range(16)) AS v) j
    ), filled AS (
      SELECT s.media_id, s.v, COALESCE(h.c, 0) AS c
      FROM spine s
      LEFT JOIN hist h ON h.media_id = s.media_id AND h.v = s.v
    )
    SELECT media_id, string_agg(CAST(c AS VARCHAR), ',' ORDER BY v) AS hist_csv
    FROM filled GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_feature_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: the feature extractor's raw byte histogram (mod 16), exact
    integers as CSV. The oracle re-synthesizes every payload from the md5
    construction and counts low hex nibbles (byte % 16 == low nibble), so
    the ENTIRE blob -> decode -> histogram path is hash-checked — the
    normalized variant (multimodal_feature_norms) stays rows-only because
    sqrt/divide-then-round is not cross-engine exact, but its input is
    this now-verified histogram."""
    media = synthetic_media_table(spark, n=300)
    feats = extract_features(media, normalize=False)
    return (
        feats.select(
            "media_id",
            F.concat_ws(",", F.transform("feature", lambda v: v.cast("string"))).alias("hist_csv"),
        )
        .orderBy("media_id")
    )


# Registered LAST on purpose: rows-only check (L2 norm's sqrt is not
# cross-engine exact, SURVEY §8), so it yields its verification-prefix
# slot to the oracle-paired multimodal queries above.
@query("multimodal_feature_norms")
def multimodal_feature_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: binary -> feature vector (stub extractor), reporting L2 norms."""
    from etl_from_s3_to_postgresql_template_spark.functions.vectors import norm_col

    media = synthetic_media_table(spark, n=300)
    feats = extract_features(media)
    return feats.select(
        "media_id", F.round(norm_col(F.col("feature")), 6).alias("feature_norm")
    ).orderBy("media_id")


@query(
    "multimodal_audio_pcm_stats",
    oracle="""
    WITH m AS (
      SELECT media_id, CAST(256 + (media_id % 16) * 32 AS BIGINT) AS ns
      FROM range(300) t(media_id) WHERE media_id % 3 = 1
    ), hx AS (
      SELECT media_id, ns,
             array_to_string(list_transform(range(CAST(ceil(ns / 16.0) AS BIGINT)),
                                            i -> md5(media_id || ':' || i)), '') AS hexfull
      FROM m
    ), smp AS (
      SELECT media_id, ns, p.k AS k,
             (instr('0123456789abcdef', substr(hexfull, CAST(2*p.k + 1 AS BIGINT), 1)) - 1) * 16
             + instr('0123456789abcdef', substr(hexfull, CAST(2*p.k + 2 AS BIGINT), 1)) - 1
             - 128 AS c
      FROM hx, UNNEST(range(ns)) p(k)
    ), x AS (
      SELECT media_id, ns, k, c,
             lead(c) OVER (PARTITION BY media_id ORDER BY k) AS c2
      FROM smp
    )
    SELECT media_id,
           MAX(ns) AS n_samples,
           CAST(MAX(ABS(c)) AS BIGINT) AS peak,
           FLOOR(sqrt(SUM(c*c) * 1.0 / MAX(ns)) * 10000 + 0.5) / 10000 AS rms,
           CAST(SUM(CASE WHEN c2 IS NOT NULL AND ((c < 0) <> (c2 < 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM x GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: REAL audio DSP, oracle-paired end to end — unsigned-8 PCM
    RMS / peak / zero-crossings via numpy in mapInPandas (no codec
    dependency, no stub: PCM is the actual decoded form every audio
    pipeline converges to). The oracle re-synthesizes each payload from
    the md5 construction and recomputes the statistics in SQL, including
    the explicit half-up rounding sequence, so the whole
    blob -> numpy -> feature path is hash-checked — this removes the
    'multimodal is stubbed' caveat for the audio modality entirely."""
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
        audio_pcm_stats,
        synthetic_media_table,
    )

    media = synthetic_media_table(spark, n=300)
    return audio_pcm_stats(media).orderBy("media_id")


@query(
    "multimodal_image_ahash",
    oracle="""
    WITH m AS (
      SELECT media_id,
             CAST(16 + (media_id % 8) * 4 AS BIGINT) AS w,
             CAST(16 + (media_id % 5) * 4 AS BIGINT) AS h
      FROM range(300) t(media_id) WHERE media_id % 3 = 0
    ), hx AS (
      SELECT media_id, w, h,
             array_to_string(list_transform(range(CAST(ceil(w*h / 16.0) AS BIGINT)),
                                            i -> md5(media_id || ':' || i)), '') AS hexfull
      FROM m
    ), pix AS (
      SELECT media_id, w, h, p.k AS k,
             (((p.k // 8) * h) // 8) * w + (((p.k % 8) * w) // 8) AS idx, hexfull
      FROM hx, UNNEST(range(64)) p(k)
    ), val AS (
      SELECT media_id, w, h, k,
             (instr('0123456789abcdef', substr(hexfull, CAST(2*idx + 1 AS BIGINT), 1)) - 1) * 16
             + instr('0123456789abcdef', substr(hexfull, CAST(2*idx + 2 AS BIGINT), 1)) - 1 AS v
      FROM pix
    ), bits AS (
      SELECT media_id, w, h, k,
             CASE WHEN v * 64 > SUM(v) OVER (PARTITION BY media_id) THEN 1 ELSE 0 END AS b
      FROM val
    ), nib AS (
      SELECT media_id, w, h, k // 4 AS n,
             SUM(b * (1 << CAST(3 - (k % 4) AS BIGINT))) AS nv
      FROM bits GROUP BY media_id, w, h, n
    )
    SELECT media_id, MAX(w) AS width, MAX(h) AS height,
           string_agg(substr('0123456789abcdef', CAST(nv + 1 AS BIGINT), 1), '' ORDER BY n)
             AS ahash
    FROM nib GROUP BY media_id ORDER BY media_id
    """,
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: REAL image perceptual hashing (aHash — 8x8 nearest-neighbor
    thumbnail, mean-threshold bits), oracle-paired bit-for-bit: the
    DuckDB twin re-synthesizes every raster from the md5 construction
    and rebuilds the 64-bit hash nibble by nibble, all in integer
    arithmetic (threshold written as pixel*64 > sum — no division). With
    audio PCM stats above, both non-video modalities now run REAL
    feature extraction with no codec dependency and full hash checks;
    Hamming distance over these hashes is the image near-dup detector
    (composes with the banded Hamming search tier at scale)."""
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
        image_ahash,
        synthetic_media_table,
    )

    media = synthetic_media_table(spark, n=300)
    return image_ahash(media).orderBy("media_id")


@query(
    "multimodal_video_shot_bounds",
    oracle="""
    WITH m AS (
      SELECT media_id, CAST(2 + media_id % 6 AS BIGINT) AS nf
      FROM range(300) t(media_id) WHERE media_id % 3 = 2
    ), hx AS (
      SELECT media_id, nf,
             array_to_string(list_transform(range(CAST(ceil(nf*64 / 16.0) AS BIGINT)),
                                            i -> md5(media_id || ':' || i)), '') AS hexfull
      FROM m
    ), v AS (
      SELECT media_id, p.k // 64 AS fi, p.k % 64 AS k,
             (instr('0123456789abcdef', substr(hexfull, CAST(2*p.k + 1 AS BIGINT), 1)) - 1) * 16
             + instr('0123456789abcdef', substr(hexfull, CAST(2*p.k + 2 AS BIGINT), 1)) - 1 AS px
      FROM hx, UNNEST(range(nf*64)) p(k)
    ), bits AS (
      SELECT media_id, fi, k,
             CASE WHEN px * 64 > SUM(px) OVER (PARTITION BY media_id, fi)
                  THEN 1 ELSE 0 END AS b
      FROM v
    ), nib AS (
      SELECT media_id, fi, k // 4 AS n,
             SUM(b * (1 << CAST(3 - (k % 4) AS BIGINT))) AS nv
      FROM bits GROUP BY media_id, fi, n
    ), hashes AS (
      SELECT media_id, fi,
             string_agg(substr('0123456789abcdef', CAST(nv + 1 AS BIGINT), 1), '' ORDER BY n)
               AS ahash
      FROM nib GROUP BY media_id, fi
    ), ham AS (
      SELECT a.media_id, a.fi,
             CAST(SUM(CASE WHEN a.b <> p.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming_prev
      FROM bits a JOIN bits p
        ON a.media_id = p.media_id AND a.k = p.k AND p.fi = a.fi - 1
      GROUP BY a.media_id, a.fi
    )
    SELECT h.media_id, h.fi AS frame_idx, h.ahash, ham.hamming_prev,
           COALESCE(ham.hamming_prev > 20, FALSE) AS is_shot_boundary
    FROM hashes h LEFT JOIN ham ON ham.media_id = h.media_id AND ham.fi = h.fi
    ORDER BY h.media_id, h.fi
    """,
)
def multimodal_video_shot_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: REAL video temporal analysis — per-frame aHash over the 8x8
    frame rasters plus consecutive-frame Hamming distance and shot-
    boundary flags (threshold 20 bits), the frame-sample -> hash ->
    segment pass every video dedup pipeline starts with. The oracle
    re-synthesizes every frame and recomputes hashes AND Hamming
    distances bit-for-bit in SQL. With audio PCM and image aHash, all
    three modalities now run real, fully hash-checked feature
    extraction; only container-format entropy decode remains
    dependency-gated."""
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
        synthetic_media_table,
        video_frame_hashes,
    )

    media = synthetic_media_table(spark, n=300)
    return video_frame_hashes(media).orderBy("media_id", "frame_idx")
