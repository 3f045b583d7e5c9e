"""Round-12 module: VERDICT r11 items 2-3 — the composed production
funnel and the cross-shard Bloom merge.

1. ``corpus_prep_funnel4`` (+ ``_bloom`` + ``_agreement_gate``) — the
   END-TO-END web-prep funnel composing the r11 production tiers in
   the order a real crawl pipeline runs them (mirroring the reference
   pipeline's own main() composition, etl_pipeline.py:252-545, at the
   extension surface):

     paragraph dedup against previously-processed shards
       -> per-language CCNet scoring against an external LM
       -> head-keep / middle-sample / tail-drop selection
       -> token-count + mean-word-length quality gates

   Shard convention: ``doc_id % 2 == 0`` is the REFERENCE shard
   (previously processed data — supplies both the dedup paragraph set
   and the curated LM corpus); ``doc_id % 2 == 1`` is the processing
   shard. Every processing-shard doc gets exactly one output row with
   its full decision trail (n_paragraphs, n_removed, n_tok, lp,
   bucket, quality_ok, kept) — a doc whose language has no LM is not
   scored (CCNet semantics, Wenzek et al. 2020 §3.3) and is dropped
   (bucket NULL, kept false).

   Two-tier convention (the repo standard): ``corpus_prep_funnel4``
   is the cross-engine-exact oracle tier — the dedup stage removes a
   paragraph iff its trimmed text EXACTLY matches a reference-shard
   paragraph (a DISTINCT-set left join DuckDB replicates verbatim).
   ``corpus_prep_funnel4_bloom`` is the production tier: the same
   chain with the clean stage swapped for the Bloom-filter probe
   (k=7 Kirsch-Mitzenmacher xxhash64, packed words table, broadcast)
   — no corpus-to-corpus shuffle join anywhere: the ONLY corpus-scale
   exchanges are the per-doc regroup of paragraph flags, the per-doc
   lp aggregate, and the output join-back + sort; the LM tables, the
   tercile cuts, and the Bloom words table all broadcast. xxhash64
   has no SQL twin, so the Bloom tier is rows-only and
   ``corpus_prep_funnel4_agreement_gate`` is its oracle-paired
   quality check: >= 90% of processing-shard docs must get the same
   final keep decision from both tiers (at the Bloom sizing's ~1e-3
   target fpp the tiers differ only when a false positive removes an
   extra paragraph and moves that doc's lp across a tercile cut).

2. ``docs_bloom_merge_shards`` (+ ``_gate``) — the 100 TB deployment
   shape of the Bloom tier (llm_ops13 module comment: "one filter per
   shard, OR-merge across shards"): build one filter per reference
   shard (doc_id % 3 == 0 and == 1) INDEPENDENTLY at a shared m,
   OR-merge the packed words tables (union -> bit_or per word index —
   bit_or is associative and commutative, so per-shard builds combine
   in any order), probe the third shard (doc_id % 3 == 2) against the
   merged filter. Rows-only (xxhash64); the gate is the oracle-paired
   no-false-negative check: a merged Bloom filter can only turn bits
   ON, so every paragraph duplicated from EITHER reference shard must
   be flagged (n_missed = 0, structural), with measured false
   positives among true non-duplicates under 5%.

Scale notes (100 TB): funnel4_bloom scans the corpus a bounded number
of times (paragraphs, LM bigrams, output join-back — each a pushed
column subset) and shuffles only per-doc rows; the Bloom/LM/cuts
sides are all bounded broadcasts. The shard merge is the associative
scale-out: N shards each build a <= 16 MB words table map-side, the
merge is a groupBy over <= N * m/64 rows, and the merged table still
broadcasts. The exact funnel tier keeps one corpus-to-corpus string
join (paragraph against DISTINCT reference paragraphs) — that join is
precisely what the Bloom tier deletes, which is the point of the
two-tier split.

Reference scope: the reference pipeline (a 734-line pandas/boto3 ETL)
has no dedup/CCNet surface; the funnel mirrors its main() composition
pattern (etl_pipeline.py:252-545) over the extension operators.

New module by policy (VERDICT r8 item 1): llm_ops13's helpers are
re-declared, not imported, so its fingerprints stay decoupled.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table
from etl_from_s3_to_postgresql_template_spark.util import shared_subtree, shared_subtree_eager

__all__ = [
    "corpus_prep_funnel4",
    "corpus_prep_funnel4_bloom",
    "corpus_prep_funnel4_agreement_gate",
    "docs_bloom_merge_shards",
    "docs_bloom_merge_shards_gate",
]

# explicit whitespace class — RE2 \s omits \x0B (the repo convention)
_WS = r"[ \t\n\x0B\f\r]+"

# ---------------------------------------------------------------------------
# Re-declared Bloom helpers (llm_ops13 text, independent fingerprint)
# ---------------------------------------------------------------------------

_BF_MIN_BITS = 1 << 20  # m floor: 16 Ki packed words = 128 KB broadcast
_BF_MAX_BITS = 1 << 27  # m ceiling: 2 Mi words = 16 MB — still broadcastable
_BF_K = 7  # hash functions — optimal near m/n ~ 10-16 bits/item


def _bf_bits_for(n_items: int) -> int:
    """Bitset size for n expected items: next power of two >= 16n
    (fpp ~ 1e-3 at k=7), clamped to [2^20, 2^27]. The count that feeds
    this is a bounded scalar action over the reference shard(s) only;
    a pipeline that knows its shard size passes it instead. Shards that
    will be OR-merged must share m — size for the UNION load."""
    return max(
        _BF_MIN_BITS,
        min(_BF_MAX_BITS, 1 << max(0, (16 * max(1, n_items) - 1).bit_length())),
    )


def _paragraphs(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, par): newline-split, trimmed, empties dropped —
    the Dolma paragraph unit; pos is the ORIGINAL line index so the
    clean stage can reconstruct untouched lines verbatim."""
    text = F.coalesce(F.col("text"), F.lit(""))
    return (
        docs.select("doc_id", F.posexplode(F.split(text, "\n", -1)).alias("pos", "raw"))
        .select("doc_id", "pos", F.trim(F.col("raw")).alias("par"))
        .where(F.col("par") != "")
    )


def _bf_positions(par: Column, bits: int) -> list[Column]:
    """k double-hashed bit positions (Kirsch-Mitzenmacher): pos_j =
    (h1 + j*h2) & (m-1). Long overflow wraps deterministically (ANSI
    off per registry confs); & with m-1 is non-negative for any sign."""
    h1 = F.xxhash64(par)
    h2 = F.xxhash64(par, F.lit(1))
    return [(h1 + F.lit(j) * h2).bitwiseAND(F.lit(bits - 1)) for j in range(_BF_K)]


def _bf_words(ref_pars: DataFrame, bits: int = _BF_MIN_BITS) -> DataFrame:
    """OR-fold the reference paragraphs' bit positions into the packed
    (wi, w) words table — <= m/64 rows, partial-aggregated map-side
    (bit_or combines associatively), always broadcastable."""
    pos = ref_pars.select(
        F.explode(F.array(*_bf_positions(F.col("par"), bits))).alias("p")
    )
    return pos.groupBy(F.expr("shiftright(p, 6)").alias("wi")).agg(
        F.expr("bit_or(shiftleft(1L, cast((p & 63) as int)))").alias("w")
    )


def _bf_merge_words(*words: DataFrame) -> DataFrame:
    """OR-merge per-shard packed words tables built at the SAME m:
    union -> bit_or per word index. bit_or is associative and
    commutative, so N per-shard filters merge in any order / any
    grouping — the cross-shard deployment primitive. The merge input
    is <= N * m/64 rows (never corpus-scale) and the result is the
    same words-table shape, still broadcastable."""
    return reduce(DataFrame.unionByName, words).groupBy("wi").agg(
        F.expr("bit_or(w)").alias("w")
    )


def _bf_flag_probe(
    probe_pars: DataFrame,
    words: DataFrame,
    bits: int = _BF_MIN_BITS,
    n_ref: int = 0,
) -> DataFrame:
    """Append might_contain as `dup`: k broadcast joins + bit tests —
    whole-stage codegen, the probe stream never shuffles here."""
    # each of the k broadcast builds evaluates its own copy of the words
    # subtree (the per-j renames defeat exchange reuse) — 7 full passes
    # of the reference-paragraph explode+agg without this checkpoint of
    # the <= m/64-row table. EAGER: the k broadcast jobs can launch
    # concurrently, and a lazy checkpoint materializing under a
    # concurrent first action lets the others compute from lineage
    # (byte-measured at 500k docs: the 7 passes survived eager=False).
    # UNCONDITIONAL here, unlike llm_ops13 (r13): this module's words
    # subtrees are deeper — the shard-merge words table carries a union +
    # second groupBy, and the funnel's probe nests under further
    # checkpointed stages — and an A/B with the llm_ops13 size gate
    # applied here regressed BOTH benched tiers at sf0.1
    # (corpus_prep_funnel4_bloom 3.04 -> 4.46 s, docs_bloom_merge_shards
    # 0.80 -> 1.03 s), so 7 rebuilds cost more than one eager job even at
    # fixture scale. n_ref is accepted for signature parity with
    # llm_ops13's probe (callers thread the count they already took).
    words = words.transform(shared_subtree_eager)
    out = probe_pars
    for j, pos in enumerate(_bf_positions(F.col("par"), bits)):
        out = out.withColumn(f"_p{j}", pos)
    flags = []
    for j in range(_BF_K):
        wj = words.select(F.col("wi").alias(f"_wi{j}"), F.col("w").alias(f"_w{j}"))
        out = out.join(
            F.broadcast(wj), F.expr(f"shiftright(_p{j}, 6)") == F.col(f"_wi{j}"), "left"
        )
        flags.append(
            F.expr(f"coalesce(_w{j} & shiftleft(1L, cast((_p{j} & 63) as int)), 0L) != 0")
        )
    dup = reduce(lambda a, b: a & b, flags)
    keep = [c for c in probe_pars.columns]
    return out.select(*keep, dup.alias("dup"))


# ---------------------------------------------------------------------------
# Re-declared CCNet helpers (llm_ops13 text, parameterized text column)
# ---------------------------------------------------------------------------

_CCX_B = 1_048_576  # 2^20 buckets per LM table


def _bucket_md5(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % _CCX_B


def _bigram_occurrences(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, w1, w2) — one row per bigram OCCURRENCE of the
    given text column (funnel stages score CLEANED text; the LM side
    tokenizes raw text — same expression, different column)."""
    tx = F.coalesce(F.col(text_col), F.lit(""))
    toks = df.select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        F.filter(F.split(F.lower(F.trim(tx)), _WS), lambda x: x != "").alias("t"),
    ).where(F.size("t") >= 2)
    n = F.size("t")
    bigrams = F.zip_with(
        F.slice("t", 1, n - 1),
        F.slice("t", 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return toks.select("doc_id", "lang", F.explode(bigrams).alias("s")).select(
        "doc_id", "lang", F.col("s.w1").alias("w1"), F.col("s.w2").alias("w2")
    )


def _bucketed_occ(occ: DataFrame) -> DataFrame:
    return occ.select(
        "doc_id",
        "lang",
        _bucket_md5(F.concat(F.col("w1"), F.lit(" "), F.col("w2"))).alias("b12"),
        _bucket_md5(F.col("w1")).alias("b1"),
    )


def _perlang_scored(lm_occ: DataFrame, occ: DataFrame) -> DataFrame:
    """(doc_id, lang, lp): per-language external-LM scoring — LM bucket
    tables from lm_occ only, bounded ((lang, bucket) keys, <= 2^20 rows
    per lang table union) and broadcast; occ scored map-side; languages
    without an LM drop (inner vocab join, CCNet semantics)."""
    # ONE reference pass builds both per-lang bucket tables (r12): lm12,
    # lm1 and vocab each consuming lm_occ re-ran its tokenize+explode+md5
    # chain once per table. Counts byte-identical; the bounded result is
    # lazily checkpointed so its readers share the single pass.
    kb = lm_occ.select(
        "lang",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("k"), F.col("b12").alias("b")),
                F.struct(F.lit(1).alias("k"), F.col("b1").alias("b")),
            )
        ).alias("kb"),
    ).select("lang", "kb.k", "kb.b")
    lm = (
        kb.groupBy("lang", "k", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(shared_subtree)
    )
    lm12 = lm.where(F.col("k") == 0).select(
        "lang", F.col("b").alias("b12"), F.col("c").alias("pair_cnt")
    )
    lm1 = lm.where(F.col("k") == 1).select(
        "lang", F.col("b").alias("b1"), F.col("c").alias("w1_cnt")
    )
    vocab = lm1.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("v"))
    # decimal accumulation: exact, order-free (the llm_ops2 convention)
    avg_lp = F.round(
        F.sum(
            F.log(
                (F.coalesce(F.col("pair_cnt"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("w1_cnt"), F.lit(0)) + F.col("v"))
            ).cast("decimal(38,15)")
        ).cast("double")
        / F.count(F.lit(1)),
        4,
    )
    return (
        occ.join(F.broadcast(lm12), ["lang", "b12"], "left")
        .join(F.broadcast(lm1), ["lang", "b1"], "left")
        .join(F.broadcast(vocab), "lang")  # inner: unscoreable langs drop
        .groupBy("doc_id", "lang")
        .agg(F.round(avg_lp * 10000).cast("long").alias("lp"))
    )


def _assign_buckets(scored: DataFrame) -> DataFrame:
    """histogram -> per-lang tercile cutoffs -> head/middle/tail; the
    window runs ON THE HISTOGRAM (bounded), never the doc stream."""
    from pyspark.sql import Window as W

    hist = scored.groupBy("lang", "lp").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = hist.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    # explicit hint: tot is <= one row per language, always
    # broadcastable; estimate-based planning demoted it to a
    # sort-merge join after the r12 LM restructure (guide 3.1)
    cum = hist.join(F.broadcast(tot), "lang").withColumn(
        "cum",
        F.sum("c").over(W.partitionBy("lang").orderBy(F.desc("lp"))).cast("long"),
    )
    cuts = cum.groupBy("lang").agg(
        F.max(F.when(F.expr("cum >= (n + 2) div 3"), F.col("lp"))).alias("cut1"),
        F.max(F.when(F.expr("cum >= (2 * n + 2) div 3"), F.col("lp"))).alias("cut2"),
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "lp",
        F.when(F.col("lp") >= F.col("cut1"), F.lit("head"))
        .when(F.col("lp") >= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


#: deterministic 1-in-3 md5 coin on doc_id — identical on both engines
def _coin() -> Column:
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 3
        == 0
    )


# ---------------------------------------------------------------------------
# corpus_prep_funnel4 — shared pipeline, parameterized clean stage
# ---------------------------------------------------------------------------

# quality-gate bounds (on the CLEANED text): Gopher-style envelope —
# enough tokens to be a document, not so many it is a dump artifact,
# and a sane mean word length (micro-units, truncating div — exact on
# both engines; per-DOC values, so the 1e6 premultiply is bounded by
# ~9.2e12 chars/doc, far above any real document)
_F4_MIN_TOK = 5
_F4_MAX_TOK = 50_000
_F4_MIN_WL_MICRO = 1_000_000  # mean word length >= 1 char
_F4_MAX_WL_MICRO = 12_000_000  # mean word length <= 12 chars


def _f4_cleaned(docs: DataFrame, exact: bool) -> DataFrame:
    """Stage 1: (doc_id, lang, n_paragraphs, n_removed, cleaned_text)
    for every processing-shard doc — flagged paragraphs removed,
    untouched lines (including blanks, never probed) verbatim. exact=
    True joins the DISTINCT reference paragraph set (the oracle twin);
    False probes the Bloom filter (no corpus-to-corpus join)."""
    # checkpointed: ref build (and Bloom sizing count) + probe both
    # consume the paragraph frame (the llm_ops5/6 multi-subtree rule)
    pars = _paragraphs(docs).transform(shared_subtree)
    ref = pars.where(F.col("doc_id") % 2 == 0)
    probe_pars = pars.where(F.col("doc_id") % 2 == 1)
    if exact:
        # no broadcast hint: the distinct reference TEXT frame grows
        # with the corpus — let size-based planning decide (llm_ops13
        # gate convention)
        probe = probe_pars.join(
            ref.select(F.col("par").alias("_rpar")).distinct(),
            probe_pars.par == F.col("_rpar"),
            "left",
        ).select("doc_id", "pos", "par", F.col("_rpar").isNotNull().alias("dup"))
    else:
        n_ref = ref.count()  # bounded scalar action, sizes m
        bits = _bf_bits_for(n_ref)
        probe = _bf_flag_probe(probe_pars, _bf_words(ref, bits), bits, n_ref)
    stats = probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
        F.sum(F.col("dup").cast("long")).cast("long").alias("n_removed"),
        # collect_list skips the NULLs the un-flagged rows produce
        F.collect_list(F.when(F.col("dup"), F.col("pos") + 1)).alias("rm"),
    )
    base = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    parts = F.split(F.col("text"), "\n", -1)
    kept_idx = F.array_except(
        F.sequence(F.lit(1), F.size(parts)),
        F.coalesce(F.col("rm"), F.array().cast("array<int>")),
    )
    return base.join(stats, "doc_id", "left").select(
        "doc_id",
        "lang",
        F.coalesce(F.col("n_paragraphs"), F.lit(0)).cast("long").alias("n_paragraphs"),
        F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
        F.concat_ws(
            "\n", F.transform(kept_idx, lambda i: F.element_at(parts, i))
        ).alias("cleaned_text"),
    )


def _f4_pipeline(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    """The full funnel: clean -> per-lang external-LM score -> tercile
    selection -> quality gates. One output row per processing-shard
    doc; every decision in the row so the oracle checks all of them
    (a production run filters on `kept` — a pure projection away)."""
    docs = load_table(spark, sf_dir, "documents")
    # checkpointed: cleaned feeds the scoring subtree AND the output row
    cleaned = _f4_cleaned(docs, exact).transform(shared_subtree)
    # LM from the reference shard's RAW text; stream = CLEANED text
    lm_occ = _bucketed_occ(_bigram_occurrences(docs.where(F.col("doc_id") % 2 == 0)))
    occ = _bucketed_occ(_bigram_occurrences(cleaned, "cleaned_text"))
    # checkpointed: scored feeds the histogram AND the assignment join
    scored = _perlang_scored(lm_occ, occ).transform(shared_subtree)
    bkt = _assign_buckets(scored).select(
        "doc_id",
        "lp",
        "bucket",
        (
            (F.col("bucket") == "head")
            | ((F.col("bucket") == "middle") & _coin())
        ).alias("_ccnet_keep"),
    )
    # quality signals built with the Python Column API only — embedding
    # _WS inside an F.expr string literal would re-escape the regex
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("cleaned_text"))), _WS), lambda x: x != ""
    )
    n_tok = F.size(toks).cast("long")
    wl_sum = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    # mean word length in micro-units — truncating div over the NAMED
    # columns (regex-free expr); n_tok >= _F4_MIN_TOK inside the branch
    quality_ok = F.when(
        F.col("n_tok").between(_F4_MIN_TOK, _F4_MAX_TOK),
        F.expr("(1000000 * wl_sum) div n_tok").between(
            _F4_MIN_WL_MICRO, _F4_MAX_WL_MICRO
        ),
    ).otherwise(F.lit(False))
    return (
        cleaned.withColumn("n_tok", n_tok)
        .withColumn("wl_sum", wl_sum)
        .join(bkt, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_paragraphs",
            "n_removed",
            "n_tok",
            "lp",
            "bucket",
            quality_ok.alias("quality_ok"),
            (quality_ok & F.coalesce(F.col("_ccnet_keep"), F.lit(False))).alias(
                "kept"
            ),
        )
        .orderBy("doc_id")
    )


# --- oracle SQL ------------------------------------------------------------

_F4_BUCKET_SQL_12 = f"('0x' || substr(md5(s.w1 || ' ' || s.w2), 1, 8))::BIGINT % {_CCX_B}"
_F4_BUCKET_SQL_1 = f"('0x' || substr(md5(s.w1), 1, 8))::BIGINT % {_CCX_B}"
_F4_COIN_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 3 = 0"
_F4_TOKS_SQL = (
    "list_filter(string_split_regex(lower(trim(cleaned_text)),"
    f" '{_WS}'), x -> x <> '')"
)

_F4_ORACLE = rf"""
    WITH lines AS (
      SELECT doc_id, COALESCE(lang, '') AS lang, s.i AS i, s.p AS p
      FROM (
        SELECT doc_id, lang,
               UNNEST(list_transform(range(len(ls)),
                      j -> {{'i': j + 1, 'p': ls[j + 1]}})) AS s
        FROM (SELECT doc_id, lang,
                     string_split(COALESCE(text, ''), chr(10)) AS ls
              FROM documents WHERE doc_id % 2 = 1)
      )
    ), refpar AS (
      SELECT DISTINCT TRIM(p) AS par
      FROM (SELECT UNNEST(string_split(COALESCE(text, ''), chr(10))) AS p
            FROM documents WHERE doc_id % 2 = 0)
      WHERE TRIM(p) <> ''
    ), flag AS (
      SELECT l.doc_id, l.lang, l.i, l.p,
             (TRIM(l.p) <> '') AS is_par,
             (TRIM(l.p) <> '' AND r.par IS NOT NULL) AS rm_dup
      FROM lines l LEFT JOIN refpar r ON TRIM(l.p) = r.par
    ), cleaned AS (
      SELECT doc_id, lang,
             CAST(COALESCE(SUM(CASE WHEN is_par THEN 1 END), 0) AS BIGINT)
               AS n_paragraphs,
             CAST(COALESCE(SUM(CASE WHEN rm_dup THEN 1 END), 0) AS BIGINT)
               AS n_removed,
             COALESCE(string_agg(CASE WHEN NOT rm_dup THEN p END,
                                 chr(10) ORDER BY i), '') AS cleaned_text
      FROM flag GROUP BY doc_id, lang
    ), rt AS (
      SELECT doc_id, COALESCE(lang, '') AS lang,
             list_filter(string_split_regex(lower(trim(COALESCE(text, ''))),
                  '{_WS}'), x -> x <> '') AS toks
      FROM documents WHERE doc_id % 2 = 0
    ), rbg AS (
      SELECT doc_id, lang,
             UNNEST(list_transform(range(len(toks) - 1),
                    i -> {{'w1': toks[i+1], 'w2': toks[i+2]}})) AS s
      FROM rt WHERE len(toks) >= 2
    ), ct AS (
      SELECT doc_id, lang, {_F4_TOKS_SQL} AS toks FROM cleaned
    ), cbg AS (
      SELECT doc_id, lang,
             UNNEST(list_transform(range(len(toks) - 1),
                    i -> {{'w1': toks[i+1], 'w2': toks[i+2]}})) AS s
      FROM ct WHERE len(toks) >= 2
    ), lm_occ AS (
      SELECT lang, {_F4_BUCKET_SQL_12} AS b12, {_F4_BUCKET_SQL_1} AS b1
      FROM rbg
    ), lm12 AS (
      SELECT lang, b12, CAST(COUNT(*) AS BIGINT) AS pair_cnt
      FROM lm_occ GROUP BY lang, b12
    ), lm1 AS (
      SELECT lang, b1, CAST(COUNT(*) AS BIGINT) AS w1_cnt
      FROM lm_occ GROUP BY lang, b1
    ), vocab AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS v FROM lm1 GROUP BY lang
    ), occ AS (
      SELECT doc_id, lang, {_F4_BUCKET_SQL_12} AS b12, {_F4_BUCKET_SQL_1} AS b1
      FROM cbg
    ), scored AS (
      SELECT o.doc_id, o.lang,
             CAST(round(ROUND(CAST(SUM(CAST(ln((COALESCE(lm12.pair_cnt, 0) + 1.0)
                       / (COALESCE(lm1.w1_cnt, 0) + vocab.v)) AS DECIMAL(38,15)))
                     AS DOUBLE) / COUNT(*), 4) * 10000) AS BIGINT) AS lp
      FROM occ o
      LEFT JOIN lm12 USING (lang, b12)
      LEFT JOIN lm1 USING (lang, b1)
      JOIN vocab USING (lang)
      GROUP BY o.doc_id, o.lang
    ), cuts AS (
      SELECT lang,
             MAX(CASE WHEN cum >= (n + 2) // 3 THEN lp END) AS cut1,
             MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN lp END) AS cut2
      FROM (
        SELECT h.lang, h.lp, t.n,
               CAST(SUM(h.c) OVER (PARTITION BY h.lang ORDER BY h.lp DESC)
                    AS BIGINT) AS cum
        FROM (SELECT lang, lp, CAST(COUNT(*) AS BIGINT) AS c
              FROM scored GROUP BY 1, 2) h
        JOIN (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM scored GROUP BY 1) t USING (lang)
      ) cum GROUP BY lang
    ), bkt AS (
      SELECT s.doc_id, s.lp,
             CASE WHEN s.lp >= c.cut1 THEN 'head'
                  WHEN s.lp >= c.cut2 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             (CASE WHEN s.lp >= c.cut1 THEN 'head'
                   WHEN s.lp >= c.cut2 THEN 'middle'
                   ELSE 'tail' END = 'head'
              OR (CASE WHEN s.lp >= c.cut1 THEN 'head'
                       WHEN s.lp >= c.cut2 THEN 'middle'
                       ELSE 'tail' END = 'middle' AND {_F4_COIN_SQL}))
               AS ccnet_keep
      FROM scored s JOIN cuts c USING (lang)
    ), q AS (
      SELECT c.doc_id, c.lang, c.n_paragraphs, c.n_removed, c.cleaned_text,
             CAST(len(t.toks) AS BIGINT) AS n_tok,
             CAST(COALESCE(list_sum(list_transform(t.toks,
                  x -> CAST(length(x) AS BIGINT))), 0) AS BIGINT) AS wl_sum
      FROM cleaned c JOIN ct t USING (doc_id, lang)
    ), qg AS (
      SELECT doc_id, lang, n_paragraphs, n_removed, n_tok,
             (n_tok BETWEEN {_F4_MIN_TOK} AND {_F4_MAX_TOK}
              AND CASE WHEN n_tok = 0 THEN FALSE
                       ELSE (1000000 * wl_sum) // n_tok
                            BETWEEN {_F4_MIN_WL_MICRO} AND {_F4_MAX_WL_MICRO}
                  END) AS quality_ok
      FROM q
    )
    SELECT qg.doc_id, qg.lang, qg.n_paragraphs, qg.n_removed, qg.n_tok,
           b.lp, b.bucket, qg.quality_ok,
           (qg.quality_ok AND COALESCE(b.ccnet_keep, FALSE)) AS kept
    FROM qg LEFT JOIN bkt b USING (doc_id)
    ORDER BY qg.doc_id
    """


@query("corpus_prep_funnel4", oracle=_F4_ORACLE)
def corpus_prep_funnel4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed web-prep funnel, ORACLE TIER (module comment):
    exact-match paragraph dedup against the reference shard -> per-lang
    external-LM CCNet scoring of the CLEANED text -> head-keep /
    middle-sample selection -> token-count + mean-word-length quality
    gates. Cross-engine exact (md5 buckets, md5 coin, decimal log
    accumulation, integer micro-unit word-length) — the DuckDB twin
    replays every stage. Production swaps the clean stage for the
    Bloom probe: corpus_prep_funnel4_bloom."""
    return _f4_pipeline(spark, sf_dir, exact=True)


@query("corpus_prep_funnel4_bloom")
def corpus_prep_funnel4_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed web-prep funnel, PRODUCTION TIER: identical chain
    with the dedup stage probing the Bloom filter (broadcast packed
    bitset, k broadcast joins) instead of joining the reference
    paragraph set — zero corpus-to-corpus shuffle joins end-to-end.
    Rows-only by design (xxhash64 has no SQL twin); quality is
    oracle-gated by corpus_prep_funnel4_agreement_gate."""
    return _f4_pipeline(spark, sf_dir, exact=False)


_F4_GATE_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, TRUE AS agree_ok
    FROM documents WHERE doc_id % 2 = 1
    """


@query("corpus_prep_funnel4_agreement_gate", oracle=_F4_GATE_ORACLE)
def corpus_prep_funnel4_agreement_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-paired agreement gate for the rows-only Bloom funnel
    tier: both tiers emit one decision row per processing-shard doc
    (the oracle counts those docs independently), and >= 90% must get
    the same final `kept` decision. The floor is not 100% because a
    Bloom false positive (~1e-3 target fpp) removes an extra paragraph,
    which can move that doc's lp and — via its own tercile cut — flip
    boundary docs (the docs_ccnet_ppl_agreement_gate mechanism); a
    broken probe or a broken stage collapses agreement far below 90%."""
    exact = _f4_pipeline(spark, sf_dir, exact=True).select(
        "doc_id", F.col("kept").alias("k_exact")
    )
    bloom = _f4_pipeline(spark, sf_dir, exact=False).select(
        "doc_id", F.col("kept").alias("k_bloom")
    )
    return exact.join(bloom, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(  # empty processing shard: vacuously TRUE (oracle literal)
            F.sum((F.col("k_exact") != F.col("k_bloom")).cast("long")) * 10
            <= F.count(F.lit(1)),
            F.lit(True),
        ).alias("agree_ok"),
    )


# ---------------------------------------------------------------------------
# docs_bloom_merge_shards (+ gate)
# ---------------------------------------------------------------------------


def _merge_probe(docs: DataFrame) -> DataFrame:
    """Shared core: per-shard filters over doc_id % 3 in (0, 1) built
    independently at a shared m, OR-merged, probed by doc_id % 3 == 2.
    Returns the probe paragraph frame with the `dup` flag."""
    pars = _paragraphs(docs).transform(shared_subtree)
    shard_a = pars.where(F.col("doc_id") % 3 == 0)
    shard_b = pars.where(F.col("doc_id") % 3 == 1)
    # shards that merge must share m, sized for the UNION load — one
    # bounded scalar count over the combined reference shards
    n_ref = pars.where(F.col("doc_id") % 3 != 2).count()
    bits = _bf_bits_for(n_ref)
    merged = _bf_merge_words(_bf_words(shard_a, bits), _bf_words(shard_b, bits))
    return _bf_flag_probe(pars.where(F.col("doc_id") % 3 == 2), merged, bits, n_ref)


@query("docs_bloom_merge_shards")
def docs_bloom_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard Bloom merge, the 100 TB deployment shape (module
    comment): two reference shards build their packed words tables
    INDEPENDENTLY (map-side, shared m), the tables OR-merge (bit_or
    per word index — associative, any order), and the third shard
    probes the merged filter. Per-doc summary like the single-shard
    tier. Rows-only by design (xxhash64); quality is oracle-gated by
    docs_bloom_merge_shards_gate."""
    probe = _merge_probe(load_table(spark, sf_dir, "documents"))
    return (
        probe.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
            F.sum(F.col("dup").cast("long")).cast("long").alias("n_flagged_dup"),
        )
        .orderBy("doc_id")
    )


_BM_GATE_ORACLE = """
    WITH pars AS (
      SELECT doc_id, TRIM(p) AS par
      FROM (SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), chr(10))) AS p
            FROM documents)
      WHERE TRIM(p) <> ''
    ), ref AS (
      SELECT DISTINCT par FROM pars WHERE doc_id % 3 <> 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_paragraphs,
           CAST(COALESCE(SUM(CASE WHEN r.par IS NOT NULL THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_true_dup,
           CAST(0 AS BIGINT) AS n_missed,
           TRUE AS fp_ok
    FROM (SELECT par FROM pars WHERE doc_id % 3 = 2) p
    LEFT JOIN ref r USING (par)
    """


@query("docs_bloom_merge_shards_gate", oracle=_BM_GATE_ORACLE)
def docs_bloom_merge_shards_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-paired no-false-negative gate for the merged filter: an
    OR-merge can only turn bits ON, so every probe paragraph that
    exactly matches a paragraph in EITHER reference shard (which the
    oracle counts independently) must be flagged (n_missed = 0 —
    structural: missing one means the merge or a shard build dropped
    bits), and measured false positives among true non-duplicates stay
    under 5%."""
    docs = load_table(spark, sf_dir, "documents")
    pars = _paragraphs(docs).transform(shared_subtree)
    probe = _merge_probe(docs)
    # no broadcast hint: the distinct reference TEXT frame grows with
    # the corpus — size-based planning decides (llm_ops13 convention)
    truth = probe.join(
        pars.where(F.col("doc_id") % 3 != 2)
        .select(F.col("par").alias("_rpar"))
        .distinct(),
        probe.par == F.col("_rpar"),
        "left",
    ).select("dup", F.col("_rpar").isNotNull().alias("is_dup"))
    return truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_paragraphs"),
        F.coalesce(F.sum(F.col("is_dup").cast("long")), F.lit(0))
        .cast("long")
        .alias("n_true_dup"),
        F.coalesce(F.sum((F.col("is_dup") & ~F.col("dup")).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_missed"),
        F.coalesce(
            F.sum((F.col("dup") & ~F.col("is_dup")).cast("long")) * 20
            <= F.sum((~F.col("is_dup")).cast("long")),
            F.lit(True),
        ).alias("fp_ok"),
    )
