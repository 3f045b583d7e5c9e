"""Image aHash near-dup pairs (plans/multimodal_ops2.py): exact
re-uploads at Hamming 0, band+verify equals the brute-force candidate
set, determinism."""

from __future__ import annotations

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

_SF = "/root/testdata/sf0.001"  # the entry's corpus is self-synthesized


def _hamming(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def _hashes(spark):
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
        image_ahash,
        synthetic_media_table,
    )
    from etl_from_s3_to_postgresql_template_spark.plans.multimodal_ops2 import (
        _AHND_PERT_BYTES,
    )
    from pyspark.sql import functions as F

    media = synthetic_media_table(spark, n=300)
    imgs = media.where(F.col("kind") == "image")
    copies = imgs.select((F.col("media_id") + 1000).alias("media_id"), "kind", "blob")
    pert = imgs.select(
        (F.col("media_id") + 2000).alias("media_id"),
        "kind",
        F.overlay(F.col("blob"), F.lit(bytes([255] * _AHND_PERT_BYTES)), F.lit(13)).alias(
            "blob"
        ),
    )
    rows = image_ahash(imgs.union(copies).union(pert)).collect()
    return {r["media_id"]: r["ahash"] for r in rows}


def test_exact_reuploads_all_found_at_hamming_zero(spark):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in QUERIES["multimodal_ahash_neardup"](spark, _SF).collect()
    }
    image_ids = [i for i in range(300) if i % 3 == 0]
    for i in image_ids:
        # an exact duplicate collides on all four bands — found always
        assert got[(i, i + 1000)] == 0


def test_band_verify_equals_bruteforce_within_contract(spark):
    """Every reported pair's hamming matches a pure-Python popcount,
    and every brute-force pair within the threshold that shares at
    least one 16-bit band is reported (the LSH recall contract:
    band-missed pairs are the only legal omissions)."""
    from etl_from_s3_to_postgresql_template_spark.plans.multimodal_ops2 import (
        _AHND_MAX_HAMMING,
    )

    h = _hashes(spark)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in QUERIES["multimodal_ahash_neardup"](spark, _SF).collect()
    }
    for (a, b), d in got.items():
        assert d == _hamming(h[a], h[b]) and d <= _AHND_MAX_HAMMING
    ids = sorted(h)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _hamming(h[a], h[b])
            shares_band = any(
                h[a][4 * k : 4 * k + 4] == h[b][4 * k : 4 * k + 4] for k in range(4)
            )
            if d <= _AHND_MAX_HAMMING and shares_band:
                assert (a, b) in got, (a, b, d)


def test_perturbed_copies_are_near_not_exact(spark):
    """The 8-byte pixel edit must move the hash a little, not a lot —
    the fixture exercises genuine NEAR-duplicates, not only exact ones."""
    h = _hashes(spark)
    dists = [
        _hamming(h[i], h[i + 2000]) for i in range(300) if i % 3 == 0
    ]
    assert any(0 < d <= 16 for d in dists)  # real near-dups exist
    assert all(d < 64 for d in dists)


def test_neardup_determinism(spark):
    a = QUERIES["multimodal_ahash_neardup"](spark, _SF).collect()
    b = QUERIES["multimodal_ahash_neardup"](spark, _SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
