"""Round-9 extension: image near-duplicate detection — the LAION-style
curation step that was the one missing PAIR operator on the multimodal
side (multimodal_image_ahash computes the perceptual hash and its
docstring points at exactly this composition).

``multimodal_ahash_neardup`` finds re-encoded / slightly-edited image
copies: band the 64-bit aHash into 4 x 16-bit bands (the Hamming-space
LSH used by the similarity_topk_hamming tier), bucket-join candidates
on (band_index, band_value), then verify candidates with the EXACT
Hamming distance. Two images within ``_AHND_MAX_HAMMING`` bits agree on
at least one full band whenever their <= 16 differing bits avoid one
band (exact duplicates always collide on all four bands; the miss
probability for true near-dups is the standard LSH recall trade,
documented rather than hidden).

Fixture design: the synthetic media table has no duplicates, so the
corpus under test is the image set UNIONed with (a) exact re-uploads
(same raster, media_id + 1000 — the most common real-world duplicate)
and (b) pixel-perturbed copies (media_id + 2000, first 8 raster bytes
overwritten with 0xFF via binary ``overlay`` — a small edit whose hash
lands a few bits away). The DuckDB oracle replays the md5 raster
construction (the multimodal_image_ahash oracle), applies the SAME
byte perturbation arithmetically, and re-derives bands, candidate
pairs, and Hamming distances — every row hash-exact cross-engine.

64-bit signedness note: conv(hex, 16, 10) returns a decimal STRING and
a >= 2^63 value overflows the long cast to NULL under ANSI-off, so the
Hamming verify works on two 32-bit halves (conv of 8 hex chars is
always < 2^32) on BOTH engines — pure codegen, no HOF, no UDF.

Scale stance: hashes are 8 bytes/image; the band explode is 4 rows per
image (36 B each); the bucket join is the only shuffle and a windowed
cap-and-report guard (the minhash convention) bounds any degenerate
bucket (e.g. all-black images hashing identically) before the pair
blow-up. Blobs never shuffle — the hash projection drops them at scan.

Reference scope note: no multimodal surface exists in the reference
(etl_pipeline.py is CSV-only); north-star E4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_from_s3_to_postgresql_template_spark.plans.registry import query

__all__ = ["multimodal_ahash_neardup"]

_AHND_MAX_HAMMING = 16   # near-dup verify threshold (bits out of 64)
_AHND_MAX_BUCKET = 10_000  # cap-and-report guard on a band bucket
_AHND_PERT_BYTES = 8     # leading raster bytes overwritten in the copies

_AHND_ORACLE = rf"""
    WITH m0 AS (
      SELECT media_id FROM range(300) t(media_id) WHERE media_id % 3 = 0
    ), m AS (
      SELECT media_id, media_id AS seed, FALSE AS pert FROM m0
      UNION ALL
      SELECT media_id + 1000, media_id, FALSE FROM m0
      UNION ALL
      SELECT media_id + 2000, media_id, TRUE FROM m0
    ), dims AS (
      SELECT media_id, seed, pert,
             CAST(16 + (seed % 8) * 4 AS BIGINT) AS w,
             CAST(16 + (seed % 5) * 4 AS BIGINT) AS h
      FROM m
    ), hx AS (
      SELECT media_id, pert, w, h,
             array_to_string(list_transform(range(CAST(ceil(w*h / 16.0) AS BIGINT)),
                                            i -> md5(seed || ':' || i)), '') AS hexfull
      FROM dims
    ), pix AS (
      SELECT media_id, pert, w, h, p.k AS k,
             (((p.k // 8) * h) // 8) * w + (((p.k % 8) * w) // 8) AS idx, hexfull
      FROM hx, UNNEST(range(64)) p(k)
    ), val AS (
      SELECT media_id, k,
             CASE WHEN pert AND idx < {_AHND_PERT_BYTES} THEN 255 ELSE
               (instr('0123456789abcdef', substr(hexfull, CAST(2*idx + 1 AS BIGINT), 1)) - 1) * 16
               + instr('0123456789abcdef', substr(hexfull, CAST(2*idx + 2 AS BIGINT), 1)) - 1
             END AS v
      FROM pix
    ), bits AS (
      SELECT media_id, k,
             CASE WHEN v * 64 > SUM(v) OVER (PARTITION BY media_id) THEN 1 ELSE 0 END AS b
      FROM val
    ), nib AS (
      SELECT media_id, k // 4 AS n,
             SUM(b * (1 << CAST(3 - (k % 4) AS BIGINT))) AS nv
      FROM bits GROUP BY media_id, n
    ), ah AS (
      SELECT media_id,
             string_agg(substr('0123456789abcdef', CAST(nv + 1 AS BIGINT), 1), '' ORDER BY n)
               AS ahash
      FROM nib GROUP BY media_id
    ), bands AS (
      SELECT media_id, ahash, i AS band_i, substr(ahash, CAST(4*i + 1 AS BIGINT), 4) AS band_v
      FROM ah, UNNEST(range(4)) t(i)
    ), cand AS (
      SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
             a.ahash AS ha, b.ahash AS hb
      FROM bands a JOIN bands b
        ON a.band_i = b.band_i AND a.band_v = b.band_v AND a.media_id < b.media_id
    ), ham AS (
      SELECT id_a, id_b,
             bit_count(xor(('0x' || substr(ha, 1, 8))::BIGINT,
                           ('0x' || substr(hb, 1, 8))::BIGINT))
             + bit_count(xor(('0x' || substr(ha, 9, 8))::BIGINT,
                             ('0x' || substr(hb, 9, 8))::BIGINT)) AS hamming
      FROM cand
    )
    SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
    FROM ham WHERE hamming <= {_AHND_MAX_HAMMING}
    ORDER BY id_a, id_b
    """


@query("multimodal_ahash_neardup", oracle=_AHND_ORACLE)
def multimodal_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs (module docstring): (id_a, id_b, hamming)
    for every banded-candidate pair within {t} Hamming bits over the
    re-upload + perturbed-copy corpus. Exact re-uploads report
    hamming = 0 (found unconditionally: all four bands collide);
    perturbed copies report their true bit distance when at least one
    band survived the edit — the LSH recall contract."""
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
        image_ahash,
        synthetic_media_table,
    )

    media = synthetic_media_table(spark, n=300)
    imgs = media.where(F.col("kind") == "image")
    copies = imgs.select(
        (F.col("media_id") + 1000).alias("media_id"), "kind", "blob"
    )
    pert = imgs.select(
        (F.col("media_id") + 2000).alias("media_id"),
        "kind",
        # overwrite the first raster bytes (after the 12-byte IMG!+dims
        # header) — a small deterministic "edit"
        F.overlay(
            F.col("blob"), F.lit(bytes([255] * _AHND_PERT_BYTES)), F.lit(13)
        ).alias("blob"),
    )
    hashes = image_ahash(imgs.union(copies).union(pert)).select(
        "media_id", "ahash"
    )
    bands = hashes.select(
        "media_id",
        "ahash",
        F.posexplode(
            F.array(*[F.substring("ahash", 4 * i + 1, 4) for i in range(4)])
        ).alias("band_i", "band_v"),
    )
    # cap-and-report guard: a degenerate band value (constant-color
    # images) would make the bucket join quadratic; buckets beyond the
    # cap are excluded (and would be reported, the minhash convention —
    # unreachable on this fixture)
    bw = W.partitionBy("band_i", "band_v")
    ok = (
        bands.withColumn("bs", F.count(F.lit(1)).over(bw))
        .where((F.col("bs") > 1) & (F.col("bs") <= _AHND_MAX_BUCKET))
        .drop("bs")
    )
    a = ok.select("band_i", "band_v", F.col("media_id").alias("id_a"), F.col("ahash").alias("ha"))
    b = ok.select("band_i", "band_v", F.col("media_id").alias("id_b"), F.col("ahash").alias("hb"))
    cand = (
        a.join(b, ["band_i", "band_v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )

    def half(col, start):
        return F.conv(F.substring(col, start, 8), 16, 10).cast("long")

    ham = (
        F.bit_count(half(F.col("ha"), 1).bitwiseXOR(half(F.col("hb"), 1)))
        + F.bit_count(half(F.col("ha"), 9).bitwiseXOR(half(F.col("hb"), 9)))
    ).cast("long")
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= _AHND_MAX_HAMMING)
        .orderBy("id_a", "id_b")
    )
