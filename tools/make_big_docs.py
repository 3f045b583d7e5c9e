"""Synthesize documents/embeddings corpora with CONTROLLED duplicate
structure at two scales, for dedup/ANN scale-stress runs.

Why this exists: the key-offset replica (make_big_sf.py) deliberately
excludes documents — naive text replication makes every replica an exact
dup of its source, planting a fake quadratic no real corpus has, which
would make any dedup timing meaningless. This generator instead produces
a corpus the way web corpora actually look: mostly-unique docs from a
Zipf vocabulary plus a bounded fraction of near-duplicate clusters of
bounded size (2-4 members, ~2% token perturbation) and a small exact-dup
fraction. Cluster size stays CONSTANT as n grows — so candidate-pair
counts grow linearly in n for a correctly-blocked dedup, and the big/small
wall-time ratio measures the plan, not the fixture.

Both scales come from the same process with the same parameters (only n
changes), so ratios are apples-to-apples.

Usage: python tools/make_big_docs.py [dst_root] [n_small] [factor]
Writes {dst_root}/small/{documents,embeddings}.parquet and
{dst_root}/big/... with n_small and n_small*factor docs; embeddings get
2/5 of the doc count (matching the sf0.1 fixture's 5000/2000 ratio).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.70, 0.10, 0.08, 0.07, 0.05])
DUP_CLUSTER_FRAC = 0.10  # fraction of docs that are near-dup cluster members
EXACT_DUP_FRAC = 0.02
PERTURB = 0.02  # token replacement rate inside a near-dup
DIM = 64


def _vocab(rng: np.random.Generator, size: int = 2000) -> np.ndarray:
    base = [
        "batch", "part", "spark", "line", "column", "order", "small", "sort",
        "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
        "query", "big", "key", "window", "join", "shuffle", "stream", "state",
    ]
    extra = [f"tok{i}" for i in range(size - len(base))]
    return np.array(base + extra)


def gen_docs(rng: np.random.Generator, n: int):
    vocab = _vocab(rng)
    # Zipf-ish token distribution
    ranks = np.arange(1, len(vocab) + 1)
    p = 1.0 / ranks
    p /= p.sum()
    lengths = rng.integers(50, 400, size=n)
    n_clustered = int(n * DUP_CLUSTER_FRAC)
    n_exact = int(n * EXACT_DUP_FRAC)

    docs = []
    for i in range(n):
        docs.append(rng.choice(vocab, size=lengths[i], p=p))

    # near-dup clusters: overwrite a slice of docs with perturbed copies of
    # bases, in clusters of 2-4 (bounded regardless of n)
    i = n - n_clustered - n_exact
    cluster_of = {}
    while i < n - n_exact:
        csize = int(rng.integers(2, 5))
        base_idx = int(rng.integers(0, n - n_clustered - n_exact))
        for j in range(min(csize, n - n_exact - i)):
            d = docs[base_idx].copy()
            flip = rng.random(len(d)) < PERTURB
            d[flip] = rng.choice(vocab, size=int(flip.sum()), p=p)
            docs[i] = d
            cluster_of[i] = base_idx
            i += 1
    # exact dups of random earlier docs
    for i in range(n - n_exact, n):
        docs[i] = docs[int(rng.integers(0, n - n_exact))]

    texts = [" ".join(d) for d in docs]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = np.array([f"src{int(s)}" for s in rng.integers(0, 20, size=n)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int):
    n_dup = int(n * DUP_CLUSTER_FRAC)
    base = rng.standard_normal((n, DIM)).astype(np.float32)
    # near-dup vectors: small perturbation of a random earlier vector
    src = rng.integers(0, n - n_dup, size=n_dup)
    base[n - n_dup :] = base[src] + 0.05 * rng.standard_normal((n_dup, DIM)).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(base), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 20, size=n).astype(np.int32)),
        }
    )


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/docs_scale"
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    for label, n in (("small", n_small), ("big", n_small * factor)):
        out = os.path.join(dst, label)
        os.makedirs(out, exist_ok=True)
        rng = np.random.default_rng(1234)  # same seed: same process, bigger n
        # Bounded row groups: a row group is Spark's intra-file parallelism
        # unit — pyarrow's default wrote the WHOLE 500k-doc corpus as ONE
        # group, so every scan of it ran in one task with 31 threads idle
        # (found round 5: the sweep was benchmarking the fixture's layout,
        # not the plans). ~10k rows/group ≈ 6 MB keeps 32-way splits busy,
        # the same shape as a real multi-file 100 TB lake.
        pq.write_table(gen_docs(rng, n), f"{out}/documents.parquet", row_group_size=10_000)
        pq.write_table(
            gen_embeddings(rng, int(n * 2 / 5)),
            f"{out}/embeddings.parquet",
            row_group_size=10_000,
        )
        print(f"{label}: {n} docs, {int(n * 2 / 5)} embeddings -> {out}")


if __name__ == "__main__":
    main()
