"""Round-2 LLM-pipeline additions (north-star E1/E3/E6 extensions): text
normalization, Gopher-style quality rules, bigram-LM document scoring
(perplexity-style quality), PII scanning, RAG-style token chunking,
domain-mixing weights, and the near-dup dedup keep list.

Registered LAST on purpose: the driver's correctness gate verifies a
bounded prefix of the registry per round, and that prefix is reserved for
the round-1 surface that still lacks driver evidence. These queries carry
full oracle pairs and pytest coverage now; they rotate forward next round.

Scale stance: every operator here is pure Column expressions over one
documents scan (whole-stage codegen, no UDFs, no driver loops); the LM
scorer's only wide operations are the token/bigram aggregations and one
shuffle join on the bigram key — both map-side-combined, both AQE-skew
splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

__all__ = [
    "text_normalize",
    "docs_gopher_quality",
    "docs_bigram_logprob",
    "docs_pii_scan",
    "docs_chunk_windows",
    "corpus_mixing_weights",
    "dedup_survivors",
    "similarity_topk_int8",
    "similarity_topk_hamming",
]


@query(
    "text_normalize",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm_text,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_md5,
           CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT)
             AS norm_len
    FROM documents
    ORDER BY doc_id
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 canonical normalization (the form exact dedup keys on): lowercase
    + whitespace collapse, with md5 fingerprint and normalized length.
    One projection, fused with the scan."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import normalize_text_col

    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text_col("text")
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    ).orderBy("doc_id")


@query(
    "docs_gopher_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             ROUND(list_sum(list_transform(toks, x -> CAST(len(x) AS DOUBLE)))
                   / len(toks), 4) AS mean_token_len,
             CAST(len(list_filter(toks,
                  x -> x IN ('the','and','of','to','in','is','a','that'))) AS BIGINT)
               AS n_stop
      FROM t
    )
    SELECT doc_id, n_tokens, mean_token_len, n_stop,
           (n_tokens BETWEEN 50 AND 100000
            AND mean_token_len BETWEEN 2.0 AND 10.0
            AND n_stop >= 2) AS passes
    FROM m
    ORDER BY doc_id
    """,
)
def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 Gopher-style quality gate (Rae et al. 2021 repetition/shape
    rules, the subset expressible on this fixture): token count bounds,
    mean token length bounds, minimum stopword evidence — emitted as the
    per-doc metrics plus the boolean gate, so the downstream filter is a
    plain ``WHERE passes``. All per-token arithmetic stays inside one
    higher-order-function projection; nothing leaves the scan stage."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import LANG_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    n_tokens = F.size(toks).cast("long")
    mean_len = F.round(
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n_tokens,
        4,
    )
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*LANG_STOPWORDS["en"]))).cast("long")
    out = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        n_stop.alias("n_stop"),
    )
    passes = (
        F.col("n_tokens").between(50, 100000)
        & F.col("mean_token_len").between(2.0, 10.0)
        & (F.col("n_stop") >= 2)
    )
    return out.withColumn("passes", passes).orderBy("doc_id")


@query(
    "docs_bigram_logprob",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(len(toks) - 1),
                    i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS s
      FROM t WHERE len(toks) >= 2
    ), doc_pairs AS (
      SELECT doc_id, s.w1 AS w1, s.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2, 3
    ), lm AS (
      SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS pair_cnt
      FROM doc_pairs GROUP BY 1, 2
    ), w1_tot AS (
      SELECT w1, CAST(SUM(pair_cnt) AS BIGINT) AS w1_cnt FROM lm GROUP BY 1
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT w1) AS DOUBLE) AS v FROM lm
    )
    SELECT d.doc_id,
           CAST(SUM(d.c) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(d.c * ln((lm.pair_cnt + 1.0) / (w1_tot.w1_cnt + vocab.v))
                              AS DECIMAL(38,15))) AS DOUBLE)
                 / SUM(d.c), 4) AS avg_logprob
    FROM doc_pairs d
    JOIN lm USING (w1, w2)
    JOIN w1_tot USING (w1)
    CROSS JOIN vocab
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """,
)
def docs_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E6 perplexity-style quality scoring: each document's mean
    Laplace-smoothed bigram log-probability under the corpus's own bigram
    LM (the classic KenLM-filter shape, self-contained on the fixture).

    Plan: ONE bigram extraction pass -> per-(doc, bigram) counts; the LM
    is the same table re-aggregated (no second corpus scan), so the join
    back to documents is a shuffle join on (w1, w2) between two outputs of
    the same exchange. Vocabulary size rides in as a 1-row broadcast. At
    web scale the LM table is huge — which is exactly why it is never
    broadcast and never collected."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("t")
    ).where(F.size("t") >= 2)
    n = F.size("t")
    bigrams = F.zip_with(
        F.slice("t", 1, n - 1),
        F.slice("t", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_pairs = (
        toks.select("doc_id", F.explode(bigrams).alias("s"))
        .groupBy("doc_id", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lm = doc_pairs.groupBy("w1", "w2").agg(F.sum("c").alias("pair_cnt"))
    w1_tot = lm.groupBy("w1").agg(F.sum("pair_cnt").alias("w1_cnt"))
    vocab = lm.agg(F.countDistinct("w1").cast("double").alias("v"))
    scored = (
        doc_pairs.join(lm, ["w1", "w2"])
        .join(w1_tot, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            # Accumulate the weighted terms as DECIMAL, not DOUBLE: decimal
            # addition is exact and order-independent, so the sum can't hit
            # the ROUND half-boundary flip that double sums show across
            # partition orders / engines (plans/money.py). Each term's
            # double->decimal(38,15) cast is deterministic per row; only
            # the final divide + round happen in floating point.
            F.round(
                F.sum(
                    (
                        F.col("c")
                        * F.log((F.col("pair_cnt") + 1.0) / (F.col("w1_cnt") + F.col("v")))
                    ).cast("decimal(38,15)")
                ).cast("double")
                / F.sum("c"),
                4,
            ).alias("avg_logprob"),
        )
    )
    return scored.orderBy("doc_id")


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


@query(
    "docs_pii_scan",
    oracle=rf"""
    WITH pii AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' host 10.0.' || (doc_id % 256) || '.1 up' ELSE '' END
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                              '{_IPV4_RE}', '[IP]', 'g')) AS redacted_md5
    FROM pii
    ORDER BY doc_id
    """,
)
def docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 PII scrubbing: per-doc email/IPv4 detection counts plus the md5
    of the redacted text (the hash proves the REDACTION is byte-identical
    cross-engine, not just the counts). The fixture corpus is synthetic
    and PII-free, so both engines deterministically inject addresses into
    a doc_id-keyed subset first — the scan/redact path is what's under
    test. Pure regexp Column expressions, fused with the scan; at 100 TB
    this is the cheapest kind of operator there is."""
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" host 10.0."), F.col("doc_id") % 256, F.lit(".1 up")),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(injected, _EMAIL_RE, "[EMAIL]"), _IPV4_RE, "[IP]"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(injected, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(injected, F.lit(_IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


@query(
    "docs_chunk_windows",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id,
             CAST(u.k AS BIGINT) AS chunk_idx,
             toks[(u.k * 24 + 1):(u.k * 24 + 32)] AS chunk
      FROM t, UNNEST(range(CAST(ceil(greatest(len(toks) - 8, 1) / 24.0) AS BIGINT))) u(k)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c
    ORDER BY doc_id, chunk_idx
    """,
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 RAG/context chunking: fixed token windows (size 32, stride 24,
    overlap 8) with per-chunk md5 over the joined tokens — the hash proves
    the SLICING is identical cross-engine, not just the counts. Window
    count per doc is ceil(max(n-overlap,1)/stride), so every token lands
    in >=1 chunk and the tail is kept (truncated, never dropped — dropping
    tail tokens silently loses training data). posexplode of a slice
    transform: one projection, chunk rows stream out of the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.greatest(F.size(toks) - 8, F.lit(1)) / 24.0).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.slice(toks, k * 24 + 1, 32),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("chunk").cast("long").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "corpus_mixing_weights",
    oracle=r"""
    WITH s AS (
      SELECT lang, source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT SUM(n_tokens) AS tok_total, COUNT(*) AS n_strata FROM s
    )
    SELECT lang, source, n_docs, n_tokens,
           ROUND(n_tokens / tot.tok_total, 6) AS token_share,
           ROUND((1.0 / tot.n_strata) / (n_tokens / tot.tok_total), 6) AS uniform_weight
    FROM s CROSS JOIN tot
    ORDER BY lang, source
    """,
)
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 domain-mixing weights: per-(lang, source) token shares plus the
    per-stratum sampling weight that would equalize the mixture (weight =
    target_share / actual_share with a uniform target; swap the numerator
    for any target distribution). The strata table is tiny whatever the
    corpus size — one grouped agg over the scan, totals via a 1-row
    broadcast — so this plan is corpus-scale-free."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).cast("long").alias("n_tokens"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("double").alias("tok_total"),
        F.count(F.lit(1)).cast("double").alias("n_strata"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tok_total"), 6).alias("token_share"),
            F.round(
                (1.0 / F.col("n_strata")) / (F.col("n_tokens") / F.col("tok_total")), 6
            ).alias("uniform_weight"),
        )
        .orderBy("lang", "source")
    )


@query(
    "dedup_survivors",
    oracle=r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, source,
             list_distinct(
               CASE WHEN len(toks) >= 3
                    THEN list_transform(range(1, len(toks)-1),
                                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    ELSE [array_to_string(toks, ' ')] END) AS s
      FROM (SELECT doc_id, source, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents)
    ),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id <> b.doc_id
      WHERE len(list_intersect(a.s, b.s)) * 1.0 /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.05
    ),
    reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
    SELECT c.doc_id, CAST(s.n AS BIGINT) AS replaces
    FROM comp c
    JOIN (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY cluster_id) s
      USING (cluster_id)
    WHERE c.doc_id = c.cluster_id
    ORDER BY c.doc_id
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 deliverable: the near-dup KEEP LIST — one canonical doc (min
    doc_id) per duplicate cluster, with how many docs it replaces. This is
    what a training pipeline actually ships downstream; clusters/pairs are
    diagnostics. Same edge graph + connected components as
    dedup_duplicate_clusters (llm_ops.py), filtered to the canonical
    representative per cluster."""
    from etl_from_s3_to_postgresql_template_spark.functions.text import shingles_col
    from etl_from_s3_to_postgresql_template_spark.operators.dedup import (
        connected_components,
    )

    from etl_from_s3_to_postgresql_template_spark.operators.dedup import blocked_pair_ids

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", F.array_distinct(shingles_col("text", 3)).alias("s")
    )
    cand = blocked_pair_ids(sh, "source")
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    pairs = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter((inter / union) >= 0.05)
        .select("id_a", "id_b")
    )
    comp = connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("replaces"))
    return (
        comp.where(F.col("id") == F.col("comp"))
        .join(sizes, "comp")
        .select(F.col("id").alias("doc_id"), "replaces")
        .orderBy("doc_id")
    )


@query(
    "similarity_topk_int8",
    oracle="""
    WITH m AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
      FROM embeddings
    ), q8 AS (
      SELECT e.vec_id, m.max_abs,
             list_transform(e.embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / m.max_abs) + 0.5) AS BIGINT)) AS q
      FROM embeddings e JOIN m USING (vec_id) WHERE m.max_abs > 0
    ), p AS (
      SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_dot_product(a.q, b.q) AS BIGINT) AS int_dot,
             (CAST(list_dot_product(a.q, b.q) AS DOUBLE) * a.max_abs * b.max_abs) / 16129.0
               AS approx_dot
      FROM q8 a, q8 b WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id
    ), r AS (
      SELECT q_id, n_id, int_dot, approx_dot,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY approx_dot DESC, n_id) AS rn
      FROM p
    )
    SELECT q_id, n_id, int_dot, ROUND(approx_dot, 6) AS approx_dot, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 10
    """,
)
def similarity_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 quantized search tier: top-10 by approximate dot product over
    symmetric-int8 codes (4x memory vs float32 — the difference between an
    in-RAM and a spilled ANN index at corpus scale). The integer dot is
    EXACT cross-engine (BIGINT arithmetic); the descaling to approx_dot is
    one per-row IEEE expression written in the same operation order in
    both engines, so the RANKING is deterministic too. Same broadcast-
    queries / corpus-never-shuffles contract as the float brute force."""
    from etl_from_s3_to_postgresql_template_spark.operators.intquant import (
        dot_long,
        quantize_int8,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # vectorized quantize (operators/intquant.py): the HOF expression form
    # is interpreted per element — measured bottleneck past ~1e5 vectors
    q8 = quantize_int8(emb).select("vec_id", "max_abs", "q")
    a = q8.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("max_abs").alias("ma_a"), F.col("q").alias("qa")
    )
    b = q8.select(
        F.col("vec_id").alias("n_id"), F.col("max_abs").alias("ma_b"), F.col("q").alias("qb")
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            dot_long("qa", "qb").alias("int_dot"),
            (
                (F.col("int_dot").cast("double") * F.col("ma_a") * F.col("ma_b")) / F.lit(16129.0)
            ).alias("approx_dot"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("approx_dot"), "n_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("q_id", "n_id", "int_dot", F.round("approx_dot", 6).alias("approx_dot"), "rank")
    )


@query(
    "similarity_topk_hamming",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_reduce(list_transform(range(32),
               i -> CASE WHEN embedding[i+1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END),
               (a, b) -> a | b) AS w1,
             list_reduce(list_transform(range(32),
               i -> CASE WHEN embedding[i+33] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END),
               (a, b) -> a | b) AS w2
      FROM embeddings
    ), p AS (
      SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(bit_count(xor(a.w1, b.w1)) + bit_count(xor(a.w2, b.w2)) AS BIGINT) AS hamming
      FROM s a, s b WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id
    ), r AS (
      SELECT q_id, n_id, hamming,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, n_id) AS rn
      FROM p
    )
    SELECT q_id, n_id, hamming, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 10
    """,
)
def similarity_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 binary-sketch search tier: 64-dim vectors collapse to 64 SIGN
    BITS (two 32-bit words — 32x memory vs float32), ranked by Hamming
    distance. Integer-only end to end, so the oracle is bit-exact. This is
    the coarsest, cheapest rerank funnel stage: hamming-prefilter ->
    int8-rescore -> float-verify, each tier ~an order of magnitude
    smaller. Bits pack via one fold per word; no shuffle for the corpus
    side."""
    emb = load_table(spark, sf_dir, "embeddings")

    def word(lo: int):
        # SQL-expr form: the DataFrame-API shiftleft only takes a literal
        # shift amount; the SQL function accepts the lambda variable
        return F.expr(
            f"""aggregate(
                  transform(sequence(0, 31),
                            i -> IF(element_at(embedding, i + {lo} + 1) > 0D,
                                    shiftleft(1L, i), 0L)),
                  0L, (a, b) -> a | b)"""
        )

    s = emb.select("vec_id", word(0).alias("w1"), word(32).alias("w2"))
    a = s.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("w1").alias("a1"), F.col("w2").alias("a2")
    )
    b = s.select(F.col("vec_id").alias("n_id"), F.col("w1").alias("b1"), F.col("w2").alias("b2"))
    hamming = (
        F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
        + F.bit_count(F.col("a2").bitwiseXOR(F.col("b2")))
    ).cast("long")
    from pyspark.sql import Window as W

    pairs = (
        a.crossJoin(b).where(F.col("q_id") != F.col("n_id")).select("q_id", "n_id", hamming.alias("hamming"))
    )
    w = W.partitionBy("q_id").orderBy("hamming", "n_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("q_id", "n_id", "hamming", "rank")
    )
