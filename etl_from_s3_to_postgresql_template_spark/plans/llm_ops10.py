"""Round-9 extension module: the two remaining cleaning-family gaps in
the LLM-pipeline surface, each oracle-paired and hash-exact.

1. ``docs_line_dedup`` — corpus-wide LINE-WISE deduplication (the
   RefinedWeb/Falcon cleaning step, Penedo et al. 2023 §"line-wise
   corrections"; CCNet applies the same idea at paragraph granularity,
   Wenzek et al. 2020): a line whose trimmed form appears in >= 2
   DISTINCT documents is boilerplate (nav bars, cookie banners, scrape
   chrome) and is removed from every document; the output IS the
   cleaned text. Distinct from docs_exactsubstr_clean (token-window
   substring dedup) and corpus_boilerplate_ngrams (detection only):
   this is structural-unit removal with reconstruction.
2. ``docs_softdedup_weights`` — SoftDeDup data REWEIGHTING (She et al.
   2024, "SoftDedup: an Efficient Data Reweighting Method for Speeding
   Up Language Model Pre-training"): instead of deleting near-duplicate
   documents, compute each document's "commonness" — its empirical
   log-probability under the corpus n-gram frequency model — and let
   training down-weight common (heavily duplicated) samples. The
   dedup-family complement of hard removal: everything stays, sampling
   pressure moves.

Exact-arithmetic discipline (the llm_ops9 convention): every per-gram
log count is quantized ONCE to integer micro-units — ``lam_micro(g) =
floor(1e6 * ln(c_g) + 0.5)`` — and per-doc scores are order-free int64
sums, so both entries hash-exact cross-engine rather than
tolerance-compare. Whitespace is pinned to the explicit Java \\s byte
set on the oracle side (the llm_ops8 convention: RE2's \\s omits \\x0B).

New module by policy (VERDICT r8 item 1 / functions/foldvec.py:17): new
work lands in new modules so stamped plans don't re-fingerprint.

Reference scope note: the reference pipeline's only dedup is pandas
drop_duplicates on exact rows (etl_pipeline.py ~line 430); both entries
are north-star training-data surface with no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

__all__ = [
    "docs_line_dedup",
    "docs_softdedup_weights",
]

#: a trimmed line occurring in at least this many DISTINCT documents is
#: removed everywhere (RefinedWeb's rule; 2 = any cross-document repeat)
_LD_MIN_DOCS = 2

_SD_N = 4  # SoftDeDup gram length in tokens (paper default n-gram size)

#: ASCII whitespace pinned explicitly (the llm_ops8 convention)
_WS_RE2 = r"[ \t\n\x0B\f\r]+"

# ---------------------------------------------------------------------------
# docs_line_dedup
# ---------------------------------------------------------------------------
#
# Line identity: the 0x20-trimmed line content (Spark F.trim == DuckDB
# trim: both strip spaces only, so tab-padded variants stay distinct —
# documented, matching semantics on both engines). Empty-after-trim
# lines are structure, never removed. Positions are 1-based over the
# raw '\n' split (trailing empty segments kept by BOTH engines: Java
# split with limit -1 and DuckDB string_split agree).

_LD_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS parts
      FROM documents
    ), l AS (
      SELECT doc_id, j AS pos, parts[j] AS raw, trim(parts[j], ' ') AS ln
      FROM d, LATERAL (SELECT UNNEST(generate_series(1, len(parts))) AS j)
    ), dup AS (
      SELECT ln FROM l WHERE ln <> ''
      GROUP BY ln HAVING COUNT(DISTINCT doc_id) >= {_LD_MIN_DOCS}
    ), rem AS (
      SELECT doc_id, pos FROM l JOIN dup USING (ln) WHERE ln <> ''
    ), kept AS (
      SELECT l.doc_id, l.pos, l.raw
      FROM l LEFT JOIN rem ON l.doc_id = rem.doc_id AND l.pos = rem.pos
      WHERE rem.doc_id IS NULL
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(raw, chr(10) ORDER BY pos) AS cleaned
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(len(parts) AS BIGINT) AS n_lines,
           CAST(len(parts) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(cleaned, '') AS cleaned_text
    FROM d LEFT JOIN agg USING (doc_id)
    ORDER BY doc_id
    """


@query("docs_line_dedup", oracle=_LD_ORACLE)
def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-wise dedup (module docstring): per document the
    text with every line whose trimmed form occurs in >= {min_docs}
    distinct documents removed, plus line counts. On the single-line
    fixture this degenerates to exact-duplicate-document blanking
    (still a real corpus-wide join); the multi-line semantics are
    pinned by planted fixtures in tests/test_llm_ops10.py.

    Scale stance: documents never shuffle. The line stream ships only
    (line_hash, doc_id, pos) — ~20 B/line; the duplicate test is one
    groupBy on the 64-bit line hash (count_distinct partial-aggregates
    map-side), and the removed-position join-back REUSES that exchange
    (both consumers hash-partition by lh — ReusedExchange in the plan).
    Removed positions regroup per doc (positions only, no text) and the
    cleaned text is rebuilt doc-locally: array_except over the index
    sequence (JVM builtin, no lambda scan), element_at slicing, '\\n'
    re-join. Untouched documents take the fast path — their raw text
    passes through verbatim. Per-doc work is bounded by line count.
    The oracle keys lines by content, the plan by xxhash64 — same sets
    barring a 64-bit collision (the repo-wide gram-hash convention)."""
    docs = load_table(spark, sf_dir, "documents")
    parts = F.split(F.col("text"), "\n", -1)
    base = docs.select("doc_id", "text")
    lines = (
        base.select("doc_id", F.posexplode(parts).alias("pos0", "raw"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            F.trim(F.col("raw")).alias("ln"),
        )
        .where(F.col("ln") != "")
        .select("doc_id", "pos", F.xxhash64("ln").alias("lh"))
    )
    dup = (
        lines.groupBy("lh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= _LD_MIN_DOCS)
        .select("lh")
    )
    rem = (
        lines.join(dup, "lh", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list("pos")).alias("rm"),
            F.count(F.lit(1)).cast("long").alias("n_removed"),
        )
    )
    out = base.join(rem, "doc_id", "left")
    n_lines = F.size(parts)
    kept_idx = F.array_except(F.sequence(F.lit(1), n_lines), F.col("rm"))
    cleaned = F.array_join(
        F.transform(kept_idx, lambda i: F.element_at(parts, i)), "\n"
    )
    return out.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        F.coalesce(F.col("n_removed"), F.lit(0).cast("long")).alias("n_removed"),
        F.when(F.col("rm").isNull(), F.col("text")).otherwise(cleaned).alias(
            "cleaned_text"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# docs_softdedup_weights
# ---------------------------------------------------------------------------
#
# Commonness of a document = log empirical probability of its n-gram
# stream under the corpus frequency model:
#   logp_micro = sum_occ lam_micro(g) - n_grams * logN_micro
# with lam_micro(g) = floor(1e6 * ln(c_g) + 0.5) and logN_micro the same
# quantizer on the total gram count. Higher (closer to 0) = more common
# (heavier duplication); training down-weights high-commonness docs.
# Doubles and libm ln touch only the per-distinct-gram table cells and
# one corpus total, each consumed through the identical floor(x*1e6+0.5)
# half-up quantizer on both engines (the llm_ops9 boundary-risk profile);
# per-doc aggregation is order-free int64.

_SD_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '{_WS_RE2}'),
                         x -> x <> '') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, md5(array_to_string(t[j:j+{_SD_N - 1}], ' ')) AS gm
      FROM t, LATERAL (SELECT UNNEST(generate_series(1, len(t) - {_SD_N - 1})) AS j)
      WHERE len(t) >= {_SD_N}
    ), c AS (
      SELECT gm, COUNT(*) AS c FROM g GROUP BY gm
    ), tot AS (
      SELECT CAST(floor(ln(SUM(c)) * 1e6 + 0.5) AS BIGINT) AS logn FROM c
    ), lam AS (
      SELECT gm, CAST(floor(ln(c) * 1e6 + 0.5) AS BIGINT) AS lam FROM c
    ), sc AS (
      SELECT doc_id, SUM(lam) AS s, COUNT(*) AS nf
      FROM g JOIN lam USING (gm) GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(nf, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(s - nf * tot.logn, 0) AS BIGINT) AS logp_micro
    FROM t LEFT JOIN sc USING (doc_id) CROSS JOIN tot
    ORDER BY doc_id
    """


@query("docs_softdedup_weights", oracle=_SD_ORACLE)
def docs_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SoftDeDup commonness in exact integer micro-units
    (module docstring): the log empirical probability of the doc's
    {n}-token gram stream under the corpus gram-frequency model. A doc
    with no grams (< {n} tokens) reports (0, 0) — the empty product.
    Downstream: sampling weight ~ exp(-alpha * logp_micro / n_grams /
    1e6), or feed logp_micro into the dsir_resample_gumbel machinery.

    Scale stance: the DSIR two-pass shape (llm_ops9, chosen there on
    measurement) — a FIT pass (gram counts: one groupBy on the 64-bit
    gram hash, map-side combining) and a SCORE pass (join the gram
    stream back to the count table on gh, then a map-side-combining
    int64 sum per doc). Unlike DSIR's 4096 hashed buckets the frequency
    table here is corpus-sized (exact grams, the CCNet hash-count
    table), so it is NOT broadcast by hand — it materializes once via a
    lazy localCheckpoint (its three readers: lam, the total, the join)
    and the join strategy belongs to AQE (broadcast at fixture scale,
    shuffle join on gh at corpus scale, 16 B probe rows). Text never
    shuffles. The oracle keys grams by md5, the plan by xxhash64 —
    same multiset barring a 64-bit collision (the repo-wide
    convention)."""
    docs = load_table(spark, sf_dir, "documents")
    n = _SD_N
    # collapse-then-trim (the llm_ops8 discipline: F.trim strips 0x20
    # only, so "\tfoo" must collapse before trimming)
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    base = docs.select("doc_id", norm.alias("norm"))
    pat = r"(?:^| )(?=(\S+" + r" \S+" * (n - 1) + r"))"
    grams = base.where(F.length("norm") > 0).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("norm"), F.lit(pat), F.lit(1))
        ).alias("gs"),
    ).select("doc_id", F.xxhash64("gs").alias("gh"))
    # the count table is linear in DISTINCT grams — much smaller than
    # the gram stream but corpus-sized; materialize it once so lam, the
    # total, and the score join don't each re-run the tokenize+count
    # subtree (8 parquet scans collapse to 2: fit + score)
    freq = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    lam = freq.select(
        "gh", F.floor(F.log("c") * 1e6 + 0.5).cast("long").alias("lam")
    )
    tot = freq.agg(
        F.floor(F.log(F.sum("c")) * 1e6 + 0.5).cast("long").alias("logn")
    )
    sc = (
        grams.join(lam, "gh")
        .groupBy("doc_id")
        .agg(F.sum("lam").alias("s"), F.count(F.lit(1)).alias("nf"))
    )
    return (
        base.select("doc_id")
        .join(sc, "doc_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.coalesce(F.col("nf"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("s") - F.col("nf") * F.col("logn"), F.lit(0))
            .cast("long")
            .alias("logp_micro"),
        )
        .orderBy("doc_id")
    )
