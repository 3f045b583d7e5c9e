"""Round-10 module: the URL stage + DoReMi group reweighting — the two
genuinely absent pipeline stages named by VERDICT r9 (items 3 and 6).

1. ``docs_url_normalize_dedup`` — URL canonicalization + URL-level
   dedup, the FIRST stage of every web-scale corpus pipeline (CCNet,
   RefinedWeb [Penedo et al. 2023 §3.1], Dolma all dedup by URL before
   any text processing). Canonical form: fragment stripped, scheme and
   authority lowercased, leading ``www.`` dropped, default ports
   (``:80`` http / ``:443`` https) dropped, ``utm_*`` tracking params
   removed, trailing path slash dropped. The whole chain is pure
   codegen (anchored regexp_replace steps — no UDF, no shuffle until
   the final count-by-canonical-URL), declared ONCE as step data
   (``_NORM_STEPS``) and compiled to both a Spark Column chain and the
   DuckDB oracle expression so the two engines cannot drift.
2. ``docs_url_blocklist_gate`` — PSL-style registered-domain extraction
   (longest public-suffix match, Mozilla Public Suffix List semantics)
   against a broadcast suffix table, then a broadcast blocklist join at
   the REGISTERED-domain level (the level real blocklists like UT1 are
   published at). Suffix candidates explode to <= 2 rows per host; both
   the suffix table (~9k rows in production) and the blocklist
   (millions of rows) are broadcast joins — the corpus never shuffles.
3. ``corpus_mixture_doremi`` — DoReMi-style domain reweighting (Xie et
   al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
   Pretraining"): per-domain excess-loss proxy -> multiplicative-weights
   rounds -> uniform-smoothed final mixture. The group-level complement
   of llm_ops9's instance-level DSIR selection. The published algorithm
   updates alpha <- alpha * exp(eta * excess); this plan uses the
   linearized Hedge update alpha * (1 + eta * excess) in exact BIGINT
   micro-units (the llm_ops9/11 exactness discipline) so all four
   unrolled rounds are HASH-EXACT cross-engine instead of
   tolerance-compared. The excess-loss proxy is per-domain chars/token
   vs the corpus mean (a deterministic hardness proxy; a production run
   substitutes per-domain reference-model loss — the plan shape is
   identical: one corpus scan collapses map-side to one row per domain,
   and every MW round runs on that bounded domains frame).

The fixture text carries no URLs, so raw URLs / source hosts are
injected doc_id-keyed on BOTH engines — the docs_url_domains /
docs_pii_scan convention (plans/llm_ops3.py:352).

Scale notes (100 TB): all three plans scan the corpus exactly once.
The URL chain shuffles only canonical-URL group keys (bytes ~ the URL
column, not the text); the blocklist gate shuffles nothing (broadcast
joins + per-doc projection); DoReMi shuffles one row per domain. The
MW rounds and the waterfill-style renormalizations run on the domains
frame (thousands of rows at any corpus size — the llm_ops11 UniMax
argument).

Reference scope: the reference pipeline (etl_pipeline.py, 734 lines)
has no URL or data-mixing surface; all three are north-star
training-data operators.

New module by policy (VERDICT r8 item 1): stamped modules stay frozen;
new work re-fingerprints nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table
from etl_from_s3_to_postgresql_template_spark.util import shared_subtree, shared_subtree_eager

__all__ = [
    "docs_url_normalize_dedup",
    "docs_url_blocklist_gate",
    "corpus_mixture_doremi",
    "docs_strip_markup_fused",
    "corpus_prep_funnel_web",
    "docs_ccnet_ppl_buckets",
    "docs_ccnet_ppl_buckets_hashed",
]

#: explicit ASCII whitespace (the llm_ops8 convention; RE2 \s omits \x0B)
_WS = r"[ \t\n\x0B\f\r]+"
_NONWS = r"[^ \t\n\x0B\f\r]+"


def _ntok(tx) -> F.Column:
    """Whitespace-token count via the two-pass length diff (the
    llm_ops11 collapse-and-recount form — measured 2.5x faster and 10x
    better tail than materializing the split array)."""
    return (
        F.length(F.regexp_replace(tx, _NONWS, "x"))
        - F.length(F.regexp_replace(tx, _NONWS, ""))
    ).cast("long")


# ---------------------------------------------------------------------------
# docs_url_normalize_dedup
# ---------------------------------------------------------------------------
#
# The normalization chain as DATA: (pattern, java_replacement,
# re2_replacement) triples, applied IN ORDER. Java regexp_replace
# replaces all matches and uses $1; DuckDB uses \1 and needs the 'g'
# flag — same pattern text, two replacement dialects. Order matters:
# fragment first (frags may contain anything), then lowercase the
# scheme://authority prefix so every later pattern can assume
# lowercase, then www/port, then utm (fragment already gone, so $
# anchors the query), then the trailing path slash.
#
# Step semantics, pinned by tests/test_llm_ops12.py on tricky URLs:
#   1  drop #fragment
#   2* lowercase scheme://authority (applied separately — extract the
#      prefix, lower it, concat the untouched remainder; paths stay
#      case-sensitive per RFC 3986)
#   3  drop leading www. in the host
#   4  drop :80 on http (optional-tail group: ([/?#].*)? substitutes
#      empty when the URL ends at the port — both engines)
#   5  drop :443 on https
#   6  drop &utm_x=y params (non-first; consecutive runs all match)
#   7  drop ?utm_x=y& when utm leads and more params follow
#   8  drop ?utm_x=y when utm is the only param
#   9  drop the trailing path slash before end-or-query (root collapses
#      to the bare authority — one convention, both engines)

_URL_PREFIX = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

_NORM_STEPS: list[tuple[str, str, str]] = [
    (r"#.*$", "", ""),
    # (step 2 is the lowercase splice, handled structurally below)
    (r"^(https?://)www\.", "$1", r"\1"),
    (r"^(http://[^/:?#]+):80([/?#].*)?$", "$1$2", r"\1\2"),
    (r"^(https://[^/:?#]+):443([/?#].*)?$", "$1$2", r"\1\2"),
    (r"&utm_[^&]*", "", ""),
    (r"\?utm_[^&]*&", "?", "?"),
    (r"\?utm_[^&]*$", "", ""),
    (r"([^:/])/(\?|$)", "$1$2", r"\1\2"),
]


def norm_url_col(u: Column) -> Column:
    """The full canonicalization chain as one Spark Column (pure
    whole-stage codegen: regexp_replace / regexp_extract / concat)."""
    u = F.regexp_replace(u, _NORM_STEPS[0][0], _NORM_STEPS[0][1])
    u = F.concat(
        F.lower(F.regexp_extract(u, _URL_PREFIX, 0)),
        F.regexp_replace(u, _URL_PREFIX, ""),
    )
    for pat, java_repl, _ in _NORM_STEPS[1:]:
        u = F.regexp_replace(u, pat, java_repl)
    return u


def norm_url_sql(expr: str) -> str:
    """The same chain as a DuckDB scalar expression over ``expr``."""
    out = f"regexp_replace({expr}, '{_NORM_STEPS[0][0]}', '', 'g')"
    out = (
        f"(lower(regexp_extract({out}, '{_URL_PREFIX}', 0))"
        f" || regexp_replace({out}, '{_URL_PREFIX}', '', 'g'))"
    )
    # DuckDB single-quoted strings are SQL-standard: backslashes pass
    # through literally, so patterns/replacements embed UNdoubled.
    for pat, _, re2_repl in _NORM_STEPS[1:]:
        out = f"regexp_replace({out}, '{pat}', '{re2_repl}', 'g')"
    return out


# Injected raw-URL shapes (k = doc_id % 7 site index, j = doc_id % 13
# page index, picked by v = doc_id % 5). v0 and v1 canonicalize to the
# SAME URL for equal (k, j) — upper-case scheme/host, www, :80, utm,
# trailing slash, and fragment all melt away — so the dedup tier is
# exercised for real; v2-v4 stay distinct (https, index.html, :8080).
_RAW_URL_SQL = """
      CASE doc_id % 5
        WHEN 0 THEN 'HTTP://WWW.Site' || k || '.Example.ORG:80/Path/' || j
                    || '/?utm_source=x&id=' || j || '#frag'
        WHEN 1 THEN 'http://site' || k || '.example.org/Path/' || j || '?id=' || j
        WHEN 2 THEN 'https://Site' || k || '.EXAMPLE.org:443/Path/' || j
                    || '/index.html?utm_campaign=c&id=' || j || '&utm_medium=m'
        WHEN 3 THEN 'https://www.site' || k || '.example.org/Path/' || j
                    || '?id=' || j || '#x'
        ELSE 'http://site' || k || '.example.org:8080/Path/' || j
      END
"""

_UND_ORACLE = f"""
    WITH kj AS (
      SELECT doc_id,
             CAST(doc_id % 7 AS VARCHAR) AS k,
             CAST(doc_id % 13 AS VARCHAR) AS j
      FROM documents
    ), raw AS (
      SELECT doc_id, {_RAW_URL_SQL} AS url FROM kj
    ), norm AS (
      SELECT doc_id, {norm_url_sql('url')} AS norm_url FROM raw
    )
    SELECT norm_url,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           MIN(doc_id) AS first_doc
    FROM norm GROUP BY norm_url ORDER BY norm_url
    """


@query("docs_url_normalize_dedup", oracle=_UND_ORACLE)
def docs_url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (module comment above): canonical
    URL, raw-variant count, and the kept (first) doc per canonical URL
    — the keep-list a crawl pipeline feeds downstream. One scan; the
    chain is pure codegen; the only shuffle carries canonical-URL group
    keys (URL-sized, not text-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    kj = docs.select(
        "doc_id",
        (F.col("doc_id") % 7).cast("string").alias("k"),
        (F.col("doc_id") % 13).cast("string").alias("j"),
    )
    raw = kj.select("doc_id", F.expr(_RAW_URL_SQL).alias("url"))
    norm = raw.select("doc_id", norm_url_col(F.col("url")).alias("norm_url"))
    return (
        norm.groupBy("norm_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("norm_url")
    )


# ---------------------------------------------------------------------------
# docs_url_blocklist_gate
# ---------------------------------------------------------------------------
#
# Registered domain = one label + the LONGEST matching public suffix
# (PSL semantics: 'sub.shop.co.uk' under suffixes {uk, co.uk} registers
# as 'shop.co.uk', not 'co.uk'). Candidates are the host's last-1 and
# last-2 label tails; the suffix table keys on (tail, n_labels) so a
# 1-label tail can only match a 1-label suffix. Fixture suffix list is
# a 5-row PSL subset; production swaps in the full ~9k-row PSL — same
# broadcast join, same plan.

_PSL_ROWS: list[tuple[str, int]] = [
    ("org", 1),
    ("net", 1),
    ("io", 1),
    ("uk", 1),
    ("co.uk", 2),
]

_BLOCKLIST_ROWS: list[str] = ["tracker.net", "shop.co.uk"]

_HOST_SQL = """
      CASE doc_id % 5
        WHEN 0 THEN 'site' || k || '.example.org'
        WHEN 1 THEN 'ads' || k || '.tracker.net'
        WHEN 2 THEN 'sub' || k || '.shop.co.uk'
        WHEN 3 THEN 'blog' || k || '.example.org'
        ELSE 'cdn' || k || '.media.io'
      END
"""

#: the shared host -> registered-domain -> verdict CTE chain, ending at
#: `verdict(doc_id, host, registered_domain, blocked)` — ONE definition
#: consumed by _UBG_ORACLE and the web-funnel oracle (the _UM_BODY
#: single-definition convention).
_UBG_BODY = f"""d AS (
      SELECT doc_id, {_HOST_SQL} AS host
      FROM (SELECT doc_id, CAST(doc_id % 7 AS VARCHAR) AS k FROM documents)
    ), lab AS (
      SELECT doc_id, host,
             regexp_extract(host, '([^.]+)$', 1) AS last1,
             regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS last2,
             regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) AS last3
      FROM d
    ), suf(suffix, n_labels) AS (
      VALUES {", ".join(f"('{s}', {n})" for s, n in _PSL_ROWS)}
    ), cand AS (
      SELECT l.doc_id, s.n_labels
      FROM lab l JOIN suf s ON s.n_labels = 1 AND s.suffix = l.last1
      UNION ALL
      SELECT l.doc_id, s.n_labels
      FROM lab l JOIN suf s ON s.n_labels = 2 AND s.suffix = l.last2
    ), best AS (
      SELECT doc_id, MAX(n_labels) AS bn FROM cand GROUP BY doc_id
    ), verdict AS (
      SELECT l.doc_id, l.host,
             CASE WHEN b.bn = 2 THEN l.last3 ELSE l.last2 END AS registered_domain,
             (CASE WHEN b.bn = 2 THEN l.last3 ELSE l.last2 END
               IN ({", ".join(f"'{b}'" for b in _BLOCKLIST_ROWS)})) AS blocked
      FROM lab l JOIN best b USING (doc_id)
    )"""

_UBG_ORACLE = f"""
    WITH {_UBG_BODY}
    SELECT doc_id, host, registered_domain, blocked
    FROM verdict ORDER BY doc_id
    """


def _blocklist_frame(
    spark: SparkSession, docs: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, host, registered_domain, blocked [, *carry]), unordered —
    the Spark twin of _UBG_BODY's `verdict`, shared by the gate entry
    and the web-funnel capstone. ``carry`` threads extra doc columns
    through unchanged (broadcast joins keep rows intact, so carrying
    e.g. ``text`` is free).

    Shape (review r10): the candidates are exactly the last-1 and
    last-2 label tails, so longest-match is TWO broadcast LEFT joins
    (2-label suffixes first) + a coalesce — a pure per-row projection.
    The first form exploded candidates into a groupBy(doc_id) + a
    corpus-vs-corpus join-back: two corpus-scale exchanges and an SMJ
    that the 'no corpus shuffle' claim pretended away. Hosts matching
    NO suffix are dropped (the relational oracle's inner join does the
    same)."""
    lab = docs.select(
        "doc_id",
        *carry,
        (F.col("doc_id") % 7).cast("string").alias("k"),
    ).select(
        "doc_id",
        *carry,
        F.expr(_HOST_SQL).alias("host"),
    ).select(
        "doc_id",
        *carry,
        "host",
        F.regexp_extract("host", r"([^.]+)$", 1).alias("last1"),
        F.regexp_extract("host", r"([^.]+\.[^.]+)$", 1).alias("last2"),
        F.regexp_extract("host", r"([^.]+\.[^.]+\.[^.]+)$", 1).alias("last3"),
    )
    suf = spark.createDataFrame(_PSL_ROWS, "suffix string, n_labels int")
    s2 = suf.filter("n_labels = 2").select(
        F.col("suffix").alias("last2"), F.lit(True).alias("_hit2")
    )
    s1 = suf.filter("n_labels = 1").select(
        F.col("suffix").alias("last1"), F.lit(True).alias("_hit1")
    )
    block = spark.createDataFrame(
        [(b,) for b in _BLOCKLIST_ROWS], "registered_domain string"
    ).withColumn("_blocked", F.lit(True))
    return (
        lab.join(F.broadcast(s2), "last2", "left")
        .join(F.broadcast(s1), "last1", "left")
        .filter(F.col("_hit2").isNotNull() | F.col("_hit1").isNotNull())
        .select(
            "doc_id",
            *carry,
            "host",
            F.when(F.col("_hit2"), F.col("last3"))
            .otherwise(F.col("last2"))
            .alias("registered_domain"),
        )
        .join(F.broadcast(block), "registered_domain", "left")
        .select(
            "doc_id",
            *carry,
            "host",
            "registered_domain",
            F.coalesce(F.col("_blocked"), F.lit(False)).alias("blocked"),
        )
    )


@query("docs_url_blocklist_gate", oracle=_UBG_ORACLE)
def docs_url_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL registered-domain extraction + registered-domain blocklist
    verdict per document (module comment above). Plan shape: per-doc
    projection -> two BROADCAST left joins against the split suffix
    table (2-label tails first, longest match wins by coalesce) ->
    BROADCAST left join with the blocklist. Genuinely no corpus
    shuffle: scan, three broadcast joins, project, output sort."""
    docs = load_table(spark, sf_dir, "documents")
    return _blocklist_frame(spark, docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# corpus_mixture_doremi
# ---------------------------------------------------------------------------
#
# Exact-integer multiplicative weights over domains (module docstring
# point 3). All quantities BIGINT micro-units; div/% truncate toward
# zero identically on both engines (the llm_ops9 convention, planted
# negative-operand tests there).
#
#   lambda_d     = 1e6 * chars_d div tokens_d        (loss proxy)
#   excess_d     = lambda_d - lambda_global
#   e_d          = (excess_d * ETA_MICRO) div max|excess|   in [-eta, +eta]
#   w_0          = 1e6
#   round t:   u = (w * (1e6 + e_d)) div 1e6
#              w = (u * K*1e6) div sum(u)             (renorm, avg 1e6)
#   weight_micro = (w_T * 1e6) div sum(w_T)           (simplex, sum ~1e6)
#   mixture      = ((1e6 - SMOOTH) * weight) div 1e6 + SMOOTH div K
#
# Overflow audit (int64): w <= K*1e6 (renorm invariant, K ~ 1e2..1e4);
# u <= 1.5 * K*1e6; u * K*1e6 <= 1.5 * (K*1e6)^2 = 1.5e20 at K = 1e4 —
# too hot at K = 1e4, safe at the fixture's K <= ~1e2 and bounded by
# renorm target choice; production at K >= 1e4 domains renorms to
# target 1e6 * 100 instead (same two-line change both engines). The
# fixture K is 97.

_DM_ETA_MICRO = 500_000  # eta = 0.5
# Staging precondition (ADVICE r11): the e-step passes
# _DM_ETA_MICRO // 1000 as the second staged factor of _mul_div_staged,
# which is exact only when 1000 divides eta exactly — a retune to a
# non-multiple would silently floor the effective learning rate. Fail
# loudly at import instead.
assert _DM_ETA_MICRO % 1000 == 0, (
    "_DM_ETA_MICRO must be a multiple of 1000: the e-step stages it as "
    "1000 * (_DM_ETA_MICRO // 1000); a non-multiple silently changes eta"
)
_DM_SMOOTH_MICRO = 200_000  # DoReMi's uniform smoothing, 0.2
_DM_ROUNDS = 4


def _mul_div_staged(x: str, f1: int, f2: int, t: str, d: str) -> str:
    """(x * f1 * f2) integer-divided by t WITHOUT forming the full
    product — the overflow-free staged decomposition (review r10, the
    share_micro class): x = q*t + r gives (x*f1*f2) div t =
    q*f1*f2 + (r*f1*f2) div t, and the constant factor is applied in
    two stages because |r| < |t| can reach corpus scale where r*f1*f2
    itself would wrap int64. Truncating div/% satisfy a = (a div b)*b
    + a%b on BOTH engines (Spark div, DuckDB //), so the identity
    holds for negative x too. Exact whenever |x| fits int64,
    |t| * f1 < ~9.2e18, and (x div t) * f1 * f2 fits int64. ``d`` is
    the division keyword ('div' Spark, '//' DuckDB)."""
    return (
        f"((({x}) {d} ({t})) * {f1 * f2}"
        f" + ((({x}) % ({t})) * {f1} {d} ({t})) * {f2}"
        f" + (((({x}) % ({t})) * {f1} % ({t})) * {f2}) {d} ({t}))"
    )


def _ratio_micro(c: str, t: str, d: str) -> str:
    """(1e6 * c) integer-divided by t without forming 1e6 * c — the
    f1 = f2 = 1000 staging of :func:`_mul_div_staged`. Exact iff BOTH
    preconditions hold (ADVICE r10): t < ~9.2e15 (so the remainder
    stage r*1000 stays in int64) AND c div t <= ~9.2e12 (so the
    quotient stage q*1e6 stays in int64)."""
    return _mul_div_staged(c, 1000, 1000, t, d)

_DM_BODY = rf"""tk AS (
      SELECT COALESCE(source, '') || '/' || COALESCE(lang, '') AS domain,
             CAST(len(list_filter(string_split_regex(COALESCE(text, ''), '{_WS}'),
                  x -> x <> '')) AS BIGINT) AS n_tok,
             CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars
      FROM documents
    ), dom AS (
      SELECT domain,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM tk GROUP BY domain
    ), lam AS (
      SELECT domain, n_tokens,
             CAST(CASE WHEN n_tokens > 0
                  THEN {_ratio_micro('sum_chars', 'n_tokens', '//')}
                  ELSE 0 END AS BIGINT) AS lambda_micro,
             CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot_tok,
             CAST(SUM(sum_chars) OVER () AS BIGINT) AS tot_chars
      FROM dom
    ), exc AS (
      SELECT domain, n_tokens, lambda_micro,
             CAST(lambda_micro - CASE WHEN tot_tok > 0
                  THEN {_ratio_micro('tot_chars', 'tot_tok', '//')}
                  ELSE 0 END AS BIGINT) AS excess_micro
      FROM lam
    ), mx AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro,
             CAST(MAX(ABS(excess_micro)) OVER () AS BIGINT) AS m,
             CAST(COUNT(*) OVER () AS BIGINT) AS k
      FROM exc
    ), e AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro, k,
             CAST(CASE
                  WHEN m > 9223372036854775807 // 1000
                  THEN CAST(error('doremi e-step remainder stage would overflow int64')
                            AS BIGINT)
                  WHEN m > 0
                  THEN {_mul_div_staged('excess_micro', 1000, _DM_ETA_MICRO // 1000,
                                        'm', '//')}
                  ELSE 0 END AS BIGINT) AS e
      FROM mx
    ), r0 AS (
      SELECT *, CAST(1000000 AS BIGINT) AS w FROM e
    )"""


def _dm_round_sql(i: int) -> str:
    # MW update: (w * (1e6+e)) div 1e6 staged over w = q*1e6 + r so the
    # product never forms — overflow-free for any k <= ~6.1e12 (w <= k*1e6,
    # so q <= k and q*(1e6+e) <= 1.5e6*k). Renorm: (u * k * 1e6) div s with
    # the 1e6 staged; the residual u*k product is guarded loudly (ADVICE
    # r10) — exact for k <= ~2.4e6 domains (u <= s <= 1.5*k*1e6), vs the
    # naive form's silent wrap at k ~ 2.4e3 under worst-case concentration.
    prev = f"r{i - 1}"
    return f"""u{i} AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro, e, k,
             CAST((w // 1000000) * (1000000 + e)
                  + ((w % 1000000) * (1000000 + e)) // 1000000
                  AS BIGINT) AS u
      FROM {prev}
    ), s{i} AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro, e, k, u,
             CAST(SUM(u) OVER () AS BIGINT) AS s
      FROM u{i}
    ), r{i} AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro, e, k,
             CAST(CASE WHEN u > 9223372036854775807 // (k * 1000)
                  THEN CAST(error('doremi renorm u*k would overflow int64') AS BIGINT)
                  ELSE {_mul_div_staged('u * k', 1000, 1000, 's', '//')}
                  END AS BIGINT) AS w
      FROM s{i}
    )"""


_DM_ORACLE = (
    "\n    WITH "
    + _DM_BODY
    + ", "
    + ", ".join(_dm_round_sql(i) for i in range(1, _DM_ROUNDS + 1))
    + f""", sw AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro, k, w,
             CAST(SUM(w) OVER () AS BIGINT) AS sw
      FROM r{_DM_ROUNDS}
    ), fin AS (
      SELECT domain, n_tokens, lambda_micro, excess_micro, k,
             CAST({_ratio_micro('w', 'sw', '//')} AS BIGINT) AS weight_micro
      FROM sw
    )
    SELECT domain, n_tokens, lambda_micro, excess_micro, weight_micro,
           CAST((1000000 - {_DM_SMOOTH_MICRO}) * weight_micro // 1000000
                + {_DM_SMOOTH_MICRO} // k AS BIGINT)
             AS mixture_micro
    FROM fin ORDER BY domain
    """
)


@query("corpus_mixture_doremi", oracle=_DM_ORACLE)
def corpus_mixture_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style group reweighting (module comment above): per-domain
    excess-loss proxy, four exact-integer multiplicative-weights rounds,
    uniform-smoothed final mixture — per-domain sampling weights beside
    corpus_mixture_unimax's waterfill. ONE corpus scan collapses
    map-side to a row per domain; every later step (the MW rounds, the
    renorms, the smoothing) is agg + broadcast join on that bounded
    domains frame — at 100 TB the scan dominates and nothing else
    grows."""
    docs = load_table(spark, sf_dir, "documents")
    tx = F.coalesce(F.col("text"), F.lit(""))
    tk = docs.select(
        F.concat_ws(
            "/",
            F.coalesce(F.col("source"), F.lit("")),
            F.coalesce(F.col("lang"), F.lit("")),
        ).alias("domain"),
        _ntok(tx).alias("n_tok"),
        F.length(tx).cast("long").alias("n_chars"),
    )
    # Everything after the corpus scan runs on the bounded domains
    # frame, so every global reduction (global lambda, max |excess|,
    # one sum per MW round, the final sum) is a WINDOW over the whole
    # frame — the UniMax single-partition-window precedent (a
    # driver-scale frame by construction) — NOT an agg + broadcast
    # crossJoin per step: the broadcast form materialized ~8 separate
    # jobs, each re-running the corpus scan (measured 7.5 s at 5k docs
    # before a checkpoint, 19.6 s at 500k thunk-timed with one), while
    # the window form is ONE lazy single-job plan (measured 2.0 s at
    # 500k — a 10x structural win, SCALING.md round-10).
    from pyspark.sql import Window as W

    _all = W.partitionBy(F.lit(0))
    dom = tk.groupBy("domain").agg(
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    lam = dom.select(
        "domain",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.expr(_ratio_micro("sum_chars", "n_tokens", "div")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("lambda_micro"),
        F.sum("n_tokens").over(_all).cast("long").alias("_tot_tok"),
        F.sum("sum_chars").over(_all).cast("long").alias("_tot_chars"),
    )
    exc = lam.select(
        "domain",
        "n_tokens",
        "lambda_micro",
        (
            F.col("lambda_micro")
            - F.when(
                F.col("_tot_tok") > 0,
                F.expr(_ratio_micro("_tot_chars", "_tot_tok", "div")),
            )
            .otherwise(F.lit(0))
            .cast("long")
        ).alias("excess_micro"),
    )
    w = exc.select(
        "domain",
        "n_tokens",
        "lambda_micro",
        "excess_micro",
        F.count(F.lit(1)).over(_all).cast("long").alias("k"),
        F.max(F.abs(F.col("excess_micro"))).over(_all).cast("long").alias("m"),
    ).select(
        "domain",
        "n_tokens",
        "lambda_micro",
        "excess_micro",
        "k",
        F.when(  # staged remainder (x%m)*1000 needs m <= BIGMAX/1000:
            # fail loudly past it (review r11), like the renorm guard
            F.col("m") > 9223372036854775807 // 1000,
            F.expr(
                "CAST(raise_error('doremi e-step remainder stage would"
                " overflow int64') AS BIGINT)"
            ),
        )
        .when(
            F.col("m") > 0,
            F.expr(_mul_div_staged("excess_micro", 1000, _DM_ETA_MICRO // 1000, "m", "div")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("e"),
        F.lit(1_000_000).cast("long").alias("w"),
    )
    # Staged forms mirror _dm_round_sql (same identities, 'div' keyword):
    # the MW update never forms w*(1e6+e); the renorm never forms
    # u*k*1e6, and its residual u*k product fails loudly instead of
    # wrapping (exact for k <= ~2.4e6 domains — ADVICE r10).
    _mw_update = (
        "(w div 1000000) * (1000000 + e)"
        " + ((w % 1000000) * (1000000 + e)) div 1000000"
    )
    _renorm = (
        "CASE WHEN u > 9223372036854775807 div (k * 1000)"
        " THEN CAST(raise_error('doremi renorm u*k would overflow int64') AS BIGINT)"
        f" ELSE {_mul_div_staged('u * k', 1000, 1000, 's', 'div')} END"
    )
    for _ in range(_DM_ROUNDS):
        u = w.withColumn("u", F.expr(_mw_update).cast("long"))
        w = (
            u.withColumn("s", F.sum("u").over(_all).cast("long"))
            .withColumn("w", F.expr(_renorm).cast("long"))
            .drop("u", "s")
        )
    fin = w.withColumn("sw", F.sum("w").over(_all).cast("long")).select(
        "domain",
        "n_tokens",
        "lambda_micro",
        "excess_micro",
        F.expr(_ratio_micro("w", "sw", "div")).cast("long").alias("weight_micro"),
        "k",
    )
    return fin.select(
        "domain",
        "n_tokens",
        "lambda_micro",
        "excess_micro",
        "weight_micro",
        F.expr(
            f"((1000000 - {_DM_SMOOTH_MICRO}) * weight_micro) div 1000000"
            f" + {_DM_SMOOTH_MICRO} div k"
        )
        .cast("long")
        .alias("mixture_micro"),
    ).orderBy("domain")


# ---------------------------------------------------------------------------
# docs_strip_markup_fused
# ---------------------------------------------------------------------------
#
# The PRODUCTION tier of markup stripping (VERDICT r9 item 5): the
# measured A/B kept the fused single-pass Arrow kernel
# (functions/markup.py — 6.2-7.3 s at 500k docs, same-session
# alternating triples) over the codegen four-regex-pass chain
# (9.5-44.3 s in the same sessions; each JVM pass materializes a full
# copy of every document and the chain goes allocation/GC-bound under
# load). The codegen tier stays registered in llm_ops11 as the
# cross-engine-clarity twin — both tiers are hash-exact against the
# SAME oracle semantics (re-declared below; the llm_ops11 module stays
# frozen per the stamp policy). The winnowing md5/fast64 precedent:
# oracle-clarity tier and production tier, side by side, both gated.

_SMF_TAG = r"<[^>]*>"


# The strip chain as shared SQL snippets — ONE definition consumed by
# _SMF_ORACLE and the web-funnel oracle below (the _UBG_BODY
# single-definition convention), so an entity/whitespace edit cannot
# drift between the standalone tier and the funnel's dedup input.
def _sm_t1_sql(src: str) -> str:
    return f"regexp_replace({src}, '{_SMF_TAG}', ' ', 'g')"


def _sm_ent_sql(src: str) -> str:
    return (
        "replace(replace(replace(replace(replace(" + src + ","
        " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''),"
        " '&amp;', '&')"
    )


def _sm_clean_sql(src: str) -> str:
    return f"trim(regexp_replace({src}, '{_WS}', ' ', 'g'), ' ')"


_SMF_ORACLE = f"""
    WITH s AS (
      SELECT doc_id,
             COALESCE(text, '') AS t0,
             {_sm_t1_sql("COALESCE(text, '')")} AS t1
      FROM documents
    ), e AS (
      SELECT doc_id, t0, t1, {_sm_ent_sql('t1')} AS t2
      FROM s
    )
    SELECT doc_id,
           {_sm_clean_sql('t2')} AS clean_text,
           CAST((length(t0) - length(regexp_replace(t0, '{_SMF_TAG}', '', 'g')))
                AS BIGINT) AS n_tag_chars,
           CAST(length(t1) - length(t2) AS BIGINT) AS n_entity_chars
    FROM e ORDER BY doc_id
    """


@query("docs_strip_markup_fused", oracle=_SMF_ORACLE)
def docs_strip_markup_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup stripping, fused production tier (module comment above):
    one mapInPandas pass computes clean text, removed-tag chars, and
    entity shrinkage per document — identical semantics and oracle as
    the llm_ops11 codegen tier, 1.4-6x faster at 500k docs with a 6x
    better tail under load. Per-doc projection; the only shuffle is
    the output sort."""
    from etl_from_s3_to_postgresql_template_spark.functions.markup import (
        STRIP_SCHEMA,
        strip_markup_batches,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "text")
        .mapInPandas(strip_markup_batches, STRIP_SCHEMA)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus_prep_funnel_web
# ---------------------------------------------------------------------------
#
# The ROUND-10 capstone: the RefinedWeb/CCNet macro-pipeline head
# composed end-to-end — URL blocklist gate (this module) -> markup
# stripping (the fused production tier's semantics) -> token-count
# quality gate -> exact dedup on the CLEANED text (keep first) — the
# order every web pipeline runs, because URL filtering is free (no
# text touched), stripping changes what dedup sees, and dedup must see
# post-strip text ('<p>a</p>' and 'a' ARE duplicates). The oracle
# composes the same stages from the shared CTE bodies.
#
# Scale: stage costs are the envelopes of their registered components;
# the only corpus-bytes shuffle is the dedup key exchange on
# md5(clean_text) (32 B/doc, not the text) plus the output sort.

_FW_MIN_TOK = 3
_FW_MAX_TOK = 100_000

#: the funnel's clean-text expression — built from the SAME snippets as
#: _SMF_ORACLE (review r10: it was a verbatim re-spelling before)
_FW_STRIP_SQL = _sm_clean_sql(_sm_ent_sql(_sm_t1_sql("COALESCE(text, '')")))

_FW_ORACLE = f"""
    WITH {_UBG_BODY}, strip AS (
      SELECT doc_id, {_FW_STRIP_SQL} AS clean_text FROM documents
    ), gated AS (
      SELECT v.doc_id, v.registered_domain, s.clean_text,
             CAST(len(list_filter(string_split_regex(s.clean_text, '{_WS}'),
                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM verdict v JOIN strip s USING (doc_id)
      WHERE NOT v.blocked
    ), q AS (
      SELECT * FROM gated WHERE n_tok BETWEEN {_FW_MIN_TOK} AND {_FW_MAX_TOK}
    ), r AS (
      SELECT doc_id, registered_domain, n_tok,
             ROW_NUMBER() OVER (PARTITION BY md5(clean_text) ORDER BY doc_id)
               AS rn
      FROM q
    )
    SELECT doc_id, registered_domain, n_tok
    FROM r WHERE rn = 1 ORDER BY doc_id
    """


@query("corpus_prep_funnel_web", oracle=_FW_ORACLE)
def corpus_prep_funnel_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus prep funnel (module comment above): URL blocklist ->
    strip markup -> token gate -> exact dedup keep-first; survivors
    with their registered domain and post-strip token count.

    Shape (review r10): the verdict is a pure broadcast-join projection
    carrying ``text`` through, so the blocklist filter runs BEFORE the
    Python strip kernel — blocked documents (40% of the fixture) never
    cross the Arrow boundary, honoring 'URL filtering is free'. The
    kernel passes registered_domain through its batches, so the whole
    funnel is ONE corpus pass with zero corpus joins; the only
    exchanges are the dedup key shuffle and the output sort."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    kept = (
        _blocklist_frame(spark, docs, carry=("text",))
        .filter(~F.col("blocked"))
        .select("doc_id", "registered_domain", "text")
    )

    def _strip_carry(batches):
        import pandas as pd

        from etl_from_s3_to_postgresql_template_spark.functions.markup import (
            strip_clean_only,
        )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "registered_domain": pdf["registered_domain"].values,
                    "clean_text": [
                        strip_clean_only(t) for t in pdf["text"].fillna("")
                    ],
                }
            )

    gated = (
        kept.mapInPandas(
            _strip_carry, "doc_id long, registered_domain string, clean_text string"
        )
        .withColumn("n_tok", _ntok(F.col("clean_text")))
        .filter(F.col("n_tok").between(_FW_MIN_TOK, _FW_MAX_TOK))
    )
    rn = F.row_number().over(
        W.partitionBy(F.md5("clean_text")).orderBy("doc_id")
    )
    return (
        gated.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "registered_domain", "n_tok")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# docs_ccnet_ppl_buckets
# ---------------------------------------------------------------------------
#
# CCNet's head/middle/tail split (Wenzek et al. 2020, "CCNet:
# Extracting High Quality Monolingual Datasets from Web Crawl Data"):
# per language, rank documents by LM perplexity and cut the corpus into
# three quality buckets — the classic perplexity-filter tiering that
# decides what a pretraining run keeps (head), downsamples (middle), or
# drops (tail).
#
# Score: the corpus's own Laplace-smoothed bigram LM mean log-prob (the
# docs_bigram_logprob construction, re-declared with this module's
# explicit-WS tokenizer; higher log-prob == lower perplexity). The
# 4-decimal rounded score is lifted to an EXACT integer (x 1e4), so the
# bucket cutoffs are integers and the whole entry hash-exacts.
#
# Cutoffs are NOT a per-language NTILE over the document stream (a
# corpus-scale sort per language — the shape docs_length_quantiles_hist
# replaced): the (lang, score) HISTOGRAM aggregates first (bounded:
# distinct 4-decimal scores), the descending cumulative runs on that
# bounded frame, and the two cut values per language broadcast back —
# threshold semantics (every doc with score >= cut1 is head, ties
# included), deterministic on both engines.

#: tokenize + bigram CTE chain ending at `bg(doc_id, lang, s{{w1,w2}})`
#: — ONE definition consumed by the exact and hashed tiers' oracles
_CC_TOKS_SQL = rf"""t AS (
      SELECT doc_id, COALESCE(lang, '') AS lang,
             list_filter(string_split_regex(lower(trim(COALESCE(text, ''))),
                  '{_WS}'), x -> x <> '') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id, lang,
             UNNEST(list_transform(range(len(toks) - 1),
                    i -> {{'w1': toks[i+1], 'w2': toks[i+2]}})) AS s
      FROM t WHERE len(toks) >= 2
    )"""

#: histogram -> threshold cutoffs -> bucket assignment over a
#: `scored(doc_id, lang, lp)` CTE — shared by both tiers' oracles
_CC_CUTS_SQL = """hist AS (
      SELECT lang, lp, CAST(COUNT(*) AS BIGINT) AS c FROM scored GROUP BY 1, 2
    ), tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1
    ), cum AS (
      SELECT h.lang, h.lp, t.n,
             CAST(SUM(h.c) OVER (PARTITION BY h.lang ORDER BY h.lp DESC)
                  AS BIGINT) AS cum
      FROM hist h JOIN tot t USING (lang)
    ), cuts AS (
      SELECT lang,
             MAX(CASE WHEN cum >= (n + 2) // 3 THEN lp END) AS cut1,
             MAX(CASE WHEN cum >= (2 * n + 2) // 3 THEN lp END) AS cut2
      FROM cum GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.lp,
           CASE WHEN s.lp >= c.cut1 THEN 'head'
                WHEN s.lp >= c.cut2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN cuts c USING (lang)
    ORDER BY s.doc_id"""

def _cc_bigram_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, w1, w2) — one row per bigram OCCURRENCE, the
    Spark twin of _CC_TOKS_SQL's `bg`, shared by both tiers."""
    tx = F.coalesce(F.col("text"), F.lit(""))
    toks = docs.select(
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


def _cc_assign_buckets(scored: DataFrame) -> DataFrame:
    """histogram -> threshold cutoffs -> bucket assignment over a
    (doc_id, lang, lp) frame — the Spark twin of _CC_CUTS_SQL, shared
    by both tiers. The window runs ON THE HISTOGRAM (bounded), never
    the document stream."""
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
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "lp",
            F.when(F.col("lp") >= F.col("cut1"), F.lit("head"))
            .when(F.col("lp") >= F.col("cut2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


_CC_ORACLE = rf"""
    WITH {_CC_TOKS_SQL}, doc_pairs AS (
      SELECT doc_id, lang, s.w1 AS w1, s.w2 AS w2,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2, 3, 4
    ), lm AS (
      SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS pair_cnt
      FROM doc_pairs GROUP BY 1, 2
    ), w1_tot AS (
      SELECT w1, CAST(SUM(pair_cnt) AS BIGINT) AS w1_cnt FROM lm GROUP BY 1
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT w1) AS DOUBLE) AS v FROM lm
    ), scored AS (
      SELECT d.doc_id, d.lang,
             CAST(round(ROUND(CAST(SUM(CAST(d.c * ln((lm.pair_cnt + 1.0)
                       / (w1_tot.w1_cnt + vocab.v)) AS DECIMAL(38,15)))
                     AS DOUBLE) / SUM(d.c), 4) * 10000) AS BIGINT) AS lp
      FROM doc_pairs d
      JOIN lm USING (w1, w2)
      JOIN w1_tot USING (w1)
      CROSS JOIN vocab
      GROUP BY d.doc_id, d.lang
    ), {_CC_CUTS_SQL}
    """


@query("docs_ccnet_ppl_buckets", oracle=_CC_ORACLE)
def docs_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity buckets (module comment above).
    Plan: the bigram-LM score chain (one extraction pass, LM re-agg'd
    from the same exchange), score lifted to exact integer, then the
    bounded (lang, score) histogram -> per-lang descending cumulative
    ON THE HISTOGRAM -> 2 cut rows per language broadcast back onto the
    scored stream. No per-language sort of the document stream at any
    scale."""
    occ = _cc_bigram_occurrences(load_table(spark, sf_dir, "documents", parallel=True))
    doc_pairs = occ.groupBy(
        "doc_id", "lang", "w1", "w2"
    ).agg(F.count(F.lit(1)).alias("c"))
    # lm feeds the scored join, w1_tot AND vocab — without the lazy
    # checkpoint each reader re-ran the whole tokenize+explode+pair-agg
    # chain (3 extra corpus passes, r12). The checkpoint is O(distinct
    # bigrams), the same order as the aggregation it pins.
    lm = (
        doc_pairs.groupBy("w1", "w2")
        .agg(F.sum("c").alias("pair_cnt"))
        .transform(shared_subtree)
    )
    w1_tot = lm.groupBy("w1").agg(F.sum("pair_cnt").alias("w1_cnt"))
    vocab = lm.agg(F.countDistinct("w1").cast("double").alias("v"))
    # decimal accumulation: exact, order-free (the llm_ops2 convention)
    avg_lp = F.round(
        F.sum(
            (
                F.col("c")
                * F.log((F.col("pair_cnt") + 1.0) / (F.col("w1_cnt") + F.col("v")))
            ).cast("decimal(38,15)")
        ).cast("double")
        / F.sum("c"),
        4,
    )
    # scored feeds the histogram, the cuts broadcast, AND the final
    # assignment join — without the checkpoint each consumer re-runs
    # the whole bigram-LM chain (the llm_ops5/6 multi-subtree
    # precedent). 1 row/doc, ~20 B: cheap to pin, 3 chain evals saved.
    scored = (
        doc_pairs.join(lm, ["w1", "w2"])
        .join(w1_tot, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(F.round(avg_lp * 10000).cast("long").alias("lp"))
        .transform(shared_subtree)
    )
    return _cc_assign_buckets(scored)


# ---------------------------------------------------------------------------
# docs_ccnet_ppl_buckets_hashed — the broadcastable-LM production tier
# ---------------------------------------------------------------------------
#
# The exact tier's LM construction shuffles the (doc, w1, w2) pair
# stream — byte-measured 9.4 GB / 484M records at 500k docs, and the
# wall time tracks DISK state, not CPU (64 s in a loaded window vs
# 144 s calm — shuffle-bound). This tier folds the LM into md5-bucket
# tables (the docs_softdedup_weights_hashed convention, identical
# bucketing expression on both engines): pair counts into _CCH_B
# buckets, w1 marginals into _CCH_B buckets — both BOUNDED (~16 MB)
# and therefore BROADCAST, so the bigram stream is scored map-side and
# never shuffles; partial aggregation collapses the LM builds to
# <= _CCH_B rows per task before their exchanges. Collision bias folds
# counts upward only (two pairs sharing a bucket read as more common),
# the exact trade SoftDeDup's hashed tier documents. The histogram /
# cutoff / assignment machinery is byte-identical to the exact tier
# (shared helpers above).
#
# Measured (500k docs): shuffle 164 MB / 16M records vs the exact
# tier's 9.4 GB / 484M — 57x less; wall 84.7 s vs 144 s in the same
# calm window, now compute-bound on the two md5 calls per occurrence.
# md5 buys cross-engine hash-exactness; a 100 TB deployment swaps the
# bucket hash for xxhash64 (~10x cheaper, same bounded table shape) —
# the SoftDeDup-tier convention.

_CCH_B = 1_048_576  # 2^20 buckets per table


def _cch_bucket_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT % {_CCH_B}"


_CCH_ORACLE = rf"""
    WITH {_CC_TOKS_SQL}, occ AS (
      SELECT doc_id, lang,
             {_cch_bucket_sql("s.w1 || ' ' || s.w2")} AS b12,
             {_cch_bucket_sql("s.w1")} AS b1
      FROM bg
    ), lm12 AS (
      SELECT b12, CAST(COUNT(*) AS BIGINT) AS pair_cnt FROM occ GROUP BY b12
    ), lm1 AS (
      SELECT b1, CAST(COUNT(*) AS BIGINT) AS w1_cnt FROM occ GROUP BY b1
    ), vocab AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM lm1
    ), scored AS (
      SELECT o.doc_id, o.lang,
             CAST(round(ROUND(CAST(SUM(CAST(ln((lm12.pair_cnt + 1.0)
                       / (lm1.w1_cnt + vocab.v)) AS DECIMAL(38,15)))
                     AS DOUBLE) / COUNT(*), 4) * 10000) AS BIGINT) AS lp
      FROM occ o
      JOIN lm12 USING (b12)
      JOIN lm1 USING (b1)
      CROSS JOIN vocab
      GROUP BY o.doc_id, o.lang
    ), {_CC_CUTS_SQL}
    """


@query("docs_ccnet_ppl_buckets_hashed", oracle=_CCH_ORACLE)
def docs_ccnet_ppl_buckets_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity buckets, hashed-bucket production tier (module
    comment above): bounded broadcast LM tables, map-side scoring, the
    bigram stream never shuffles — the 100 TB shape. Hash-exact
    cross-engine (identical md5 bucketing both sides); the exact tier
    stays registered beside it as the unbucketed reference."""
    occ = _cc_bigram_occurrences(load_table(spark, sf_dir, "documents", parallel=True))

    def _bucket(col: F.Column) -> F.Column:
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % _CCH_B

    occ = occ.select(
        "doc_id",
        "lang",
        _bucket(F.concat(F.col("w1"), F.lit(" "), F.col("w2"))).alias("b12"),
        _bucket(F.col("w1")).alias("b1"),
    )
    # ONE pass builds BOTH bucket tables (r12): lm12, lm1 and vocab each
    # consuming `occ` directly re-ran the tokenize+explode+md5 chain once
    # per table (3 full corpus passes for the LM build alone). Exploding
    # each occurrence into its two (table, bucket) keys keeps the counts
    # byte-identical, partial aggregation still collapses to <= 2*2^20
    # rows per task before the exchange, and the bounded result is
    # lazily checkpointed so its three readers share the single pass.
    kb = occ.select(
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("k"), F.col("b12").alias("b")),
                F.struct(F.lit(1).alias("k"), F.col("b1").alias("b")),
            )
        ).alias("kb")
    ).select("kb.k", "kb.b")
    lm = (
        kb.groupBy("k", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .transform(shared_subtree)
    )
    lm12 = lm.where(F.col("k") == 0).select(
        F.col("b").alias("b12"), F.col("c").alias("pair_cnt")
    )
    lm1 = lm.where(F.col("k") == 1).select(
        F.col("b").alias("b1"), F.col("c").alias("w1_cnt")
    )
    vocab = lm1.agg(F.count(F.lit(1)).cast("double").alias("v"))
    avg_lp = F.round(
        F.sum(
            F.log(
                (F.col("pair_cnt") + 1.0) / (F.col("w1_cnt") + F.col("v"))
            ).cast("decimal(38,15)")
        ).cast("double")
        / F.count(F.lit(1)),
        4,
    )
    scored = (
        occ.join(F.broadcast(lm12), "b12")
        .join(F.broadcast(lm1), "b1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(F.round(avg_lp * 10000).cast("long").alias("lp"))
        .transform(shared_subtree)
    )
    return _cc_assign_buckets(scored)
