"""Approximate-nearest-neighbor search over embedding columns (north-star E2).

Two strategies with one output contract (q_id, n_id, cosine, rank):

- **Brute force** (the correctness baseline): queries × candidates cosine,
  window top-k. Exact; cost O(|Q| * N). Right answer when |Q| is small —
  broadcast the queries and the "cross join" is a map-side operation with
  zero shuffle of the big side.
- **LSH-bucketed** (the scale path): random-hyperplane (sign) sketches ->
  band blocking -> cosine only within shared buckets -> top-k. Sub-linear
  candidate sets; recall tuned by (num_planes, num_bands). Hyperplanes are
  generated from a fixed seed on the driver and inlined as literals — a few
  KB in the plan, deterministic across runs.

For 100 TB/billions of vectors the same shape holds: sketches are a narrow
projection (one pass), bucket join shuffles (bucket_key, id) pairs, and only
in-bucket pairs touch full vectors (via a co-partitioned join on id).
An IVF variant (k-means coarse quantizer) drops in behind the same contract
once MLlib KMeans fits the centroid budget — noted for a later round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
    as_double_vec,
    dot_col,
    norm_col,
)

__all__ = ["brute_force_topk", "lsh_topk", "hyperplanes", "ivf_topk", "fit_ivf_centroids"]


def fit_ivf_centroids(
    candidates: DataFrame,
    n_lists: int = 16,
    n_vec: str = "n_vec",
    seed: int = 42,
    train_fraction: float = 1.0,
    max_train_rows: int = 100_000,
) -> list[list[float]]:
    """Train the IVF coarse quantizer ONCE and return plain centroid lists.

    This is the production split: centroids are a fitted artifact
    (train on a bounded sample, persist the few-KB list, reuse across every
    query), not something a query plan should re-train. ``ivf_topk`` accepts
    the result via ``centroids=`` and then builds a pure-projection plan.
    Training is bounded the same way as the inline path: optional sample
    fraction plus a hard row cap — k-means needs a representative sample,
    not the corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train_src = candidates
    if train_fraction < 1.0:
        train_src = train_src.sample(False, train_fraction, seed)
    train = train_src.limit(max_train_rows).select(
        array_to_vector(as_double_vec(F.col(n_vec))).alias("features")
    )
    # KMeans re-evaluates its input once per iteration; without the
    # persist the limit+projection chain re-scanned the source ~20x
    # (measured 33 MB input for a 2 MB table, r12). Same seed, same
    # sample, same centroids — output unchanged.
    train = train.persist()
    try:
        km = KMeans(k=n_lists, seed=seed, maxIter=20).fit(train)
    finally:
        train.unpersist()
    return [list(map(float, c)) for c in km.clusterCenters()]


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    n_id: str = "n_id",
    q_vec: str = "q_vec",
    n_vec: str = "n_vec",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k. ``queries`` is broadcast (it must be small — that
    is the contract of brute force); cosine is rounded before ranking so
    rank order is stable under float summation differences, with id as the
    final tie-break.

    r13: each side's norm is hoisted OUT of the pair loop — ||q|| once per
    query and ||n|| once per candidate, computed before the cross join —
    so the per-pair work is one interpreted fold (the dot) instead of
    three. Same expressions, same values, bit-identical cosines; measured
    2.1x on the O(n^2) pair shape (dedup_embedding_pairs A/B at sf0.1)."""
    q = queries.withColumn("_qn", norm_col(as_double_vec(F.col(q_vec))))
    c = candidates.withColumn("_nn", norm_col(as_double_vec(F.col(n_vec))))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col(q_id) != F.col(n_id))
    cos = F.round(
        dot_col(as_double_vec(F.col(q_vec)), as_double_vec(F.col(n_vec)))
        / (F.col("_qn") * F.col("_nn")),
        round_to,
    )
    w = W.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(n_id))
    return (
        pairs.select(F.col(q_id), F.col(n_id), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, inlined as literals)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def _sketch_col(vec_col, planes: list[list[float]]):
    """Sign-bit sketch: array<int> of 0/1 per hyperplane — the expression
    form (kept as the parity reference for the Arrow kernel twin
    functions/foldvec.py::make_lsh_sketch_udf, which lsh_topk uses)."""
    v = as_double_vec(vec_col)
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append((dot_col(v, plane) > 0).cast("int"))
    return F.array(*bits)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    q_id: str = "q_id",
    n_id: str = "n_id",
    q_vec: str = "q_vec",
    n_vec: str = "n_vec",
    seed: int = 42,
    round_to: int = 6,
    train_fraction: float = 1.0,
    max_train_rows: int = 100_000,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer -> probe the
    ``n_probe`` nearest centroid lists per query -> exact cosine inside.

    The scale shape: candidates are assigned to lists ONCE (one narrow
    pass + a partitioned write in a real deployment); per query only
    ``n_probe/n_lists`` of the corpus is scored. Centroids ride into the
    plan as literals, so list assignment is a pure projection — no model
    object at query time.

    Pass ``centroids`` from :func:`fit_ivf_centroids` to keep training out
    of query build entirely (the production split). When omitted, a seeded
    bounded-sample training pass runs inline — convenient for the oracle
    harness, identical output (same seed => same centroids).
    """
    if centroids is None:
        centroids = fit_ivf_centroids(
            candidates,
            n_lists=n_lists,
            n_vec=n_vec,
            seed=seed,
            train_fraction=train_fraction,
            max_train_rows=max_train_rows,
        )
    if len(centroids) != n_lists:
        raise ValueError(f"expected {n_lists} centroids, got {len(centroids)}")

    # r13: coarse assignment via the bit-exact Arrow fold kernel
    # (functions/foldvec.py::make_ivf_lists_udf). The expression form — 16
    # centroids x 64 dims of zip_with/aggregate per row — cost ~4.9 s of
    # py4j PLAN BUILD per bench pass plus an interpreted fold per centroid
    # per row at execution (measured: 6.5 s/pass total at sf0.1); the
    # kernel computes the same d2 folds (same IEEE order — argsort stable
    # on d2 ties to the smaller list_id, exactly array_sort over
    # (d2, list_id) structs) in one vectorized pass and also returns the
    # row's hoisted norm, so the pair scoring below pays one fold (the
    # dot) instead of three. Outputs verified bit-identical at all SFs.
    from etl_from_s3_to_postgresql_template_spark.functions.foldvec import (
        make_ivf_lists_udf,
    )

    # asNondeterministic (guide §4.4): the inner join on list_id infers an
    # isnotnull(element_at(lists, 1)) filter, and pushing it below the
    # candidate projection made the optimizer evaluate the kernel TWICE
    # per candidate row (two ArrowEvalPython nodes, seen in the r13 plan
    # capture). The kernel is pure — the marker is only an optimizer
    # fence against duplication; the candidate filters (none) and query
    # filters (vec_id bounds) already sit below the kernel.
    nearest = make_ivf_lists_udf(centroids).asNondeterministic()
    cand_lists = candidates.select(
        F.col(n_id), F.col(n_vec), nearest(F.col(n_vec)).alias("_nl")
    ).select(
        F.col(n_id),
        F.col(n_vec),
        F.element_at(F.col("_nl.lists"), 1).alias("list_id"),
        F.col("_nl.nrm").alias("_nn"),
    )
    q_lists = queries.select(
        F.col(q_id), F.col(q_vec), nearest(F.col(q_vec)).alias("_ql")
    ).select(
        F.col(q_id),
        F.col(q_vec),
        F.explode(F.slice(F.col("_ql.lists"), 1, n_probe)).alias("list_id"),
        F.col("_ql.nrm").alias("_qn"),
    )
    # explicit hint (guide §3.1): the probe side is |Q| * n_probe rows —
    # tiny by the operator's contract (queries must be small, like brute
    # force) — but the ArrowEvalPython node above it erases size
    # estimates, and the planner demoted this join to a SortMergeJoin at
    # 200k candidates (verified in the scale plan), shuffling the whole
    # assigned-candidate stream. Broadcasting the probe side keeps the
    # candidate stream shuffle-free until the top-k regroup.
    pairs = F.broadcast(q_lists).join(cand_lists, "list_id").filter(
        F.col(q_id) != F.col(n_id)
    )
    cos = F.round(
        dot_col(as_double_vec(F.col(q_vec)), as_double_vec(F.col(n_vec)))
        / (F.col("_qn") * F.col("_nn")),
        round_to,
    )
    w = W.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(n_id))
    return (
        pairs.select(F.col(q_id), F.col(n_id), cos.alias("cosine"))
        .dropDuplicates([q_id, n_id])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 16,
    num_bands: int = 4,
    q_id: str = "q_id",
    n_id: str = "n_id",
    q_vec: str = "q_vec",
    n_vec: str = "n_vec",
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Approximate cosine top-k via sign-LSH band blocking.

    A candidate reaches the scoring stage iff it shares >=1 band with the
    query. Bands of ``num_planes // num_bands`` bits each; more bands =
    higher recall, more candidates.
    """
    planes = hyperplanes(dim, num_planes, seed)
    rows_per_band = num_planes // num_bands
    # r13: sketch + hoisted norm via the bit-exact Arrow fold kernel
    # (functions/foldvec.py::make_lsh_sketch_udf — same folds, same IEEE
    # order as _sketch_col/norm_col; outputs verified bit-identical at all
    # SFs). The expression sketch was ~2.5 s of py4j plan build per bench
    # pass plus 16 interpreted folds per row; the hoisted norm makes the
    # pair scoring below one fold (the dot) instead of three.
    from etl_from_s3_to_postgresql_template_spark.functions.foldvec import (
        make_lsh_sketch_udf,
    )

    sketch = make_lsh_sketch_udf(planes)

    def banded(df: DataFrame, id_c: str, vec_c: str, out_id: str, norm_c: str) -> DataFrame:
        sk = df.select(
            F.col(id_c), F.col(vec_c), sketch(F.col(vec_c)).alias("_sb")
        ).select(
            F.col(id_c),
            F.col(vec_c),
            F.col("_sb.sk").alias("sk"),
            F.col("_sb.nrm").alias(norm_c),
        )
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.xxhash64(*[F.col("sk")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("band_hash"),
                )
                for b in range(num_bands)
            ]
        )
        return sk.select(
            F.col(id_c).alias(out_id), F.col(vec_c), F.col(norm_c), F.explode(bands).alias("band")
        ).select(
            out_id, vec_c, norm_c, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
        )

    qb = banded(queries, q_id, q_vec, q_id, "_qn")
    cb = banded(candidates, n_id, n_vec, n_id, "_nn")
    # explicit hint (guide §3.1): qb is |Q| * num_bands rows — tiny by the
    # operator's contract — but the kernel node erases size estimates and
    # the band join planned as a SortMergeJoin at 200k candidates
    # (verified in the scale plan), shuffling every banded candidate row
    # (vector payload included). Broadcasting qb keeps the candidate
    # stream shuffle-free until the pair dedup.
    pairs = (
        F.broadcast(qb)
        .join(cb, ["band_id", "band_hash"])
        .filter(F.col(q_id) != F.col(n_id))
        .select(q_id, n_id, q_vec, n_vec, "_qn", "_nn")
        .dropDuplicates([q_id, n_id])
    )
    cos = F.round(
        dot_col(as_double_vec(F.col(q_vec)), as_double_vec(F.col(n_vec)))
        / (F.col("_qn") * F.col("_nn")),
        round_to,
    )
    w = W.partitionBy(q_id).orderBy(F.desc("cosine"), F.col(n_id))
    return (
        pairs.select(F.col(q_id), F.col(n_id), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
