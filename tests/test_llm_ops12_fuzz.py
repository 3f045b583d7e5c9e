"""Three-engine fuzz of the URL canonicalization chain: 300 seeded
structured-random URLs through (a) a pure-Python model of the declared
step semantics, (b) the Spark Column chain, (c) the DuckDB oracle
expression — all three must agree byte-for-byte. The designed tricky
cases live in test_llm_ops12; this sweep hardens the step INTERACTIONS
(port+utm+fragment+case+trailing-slash combinations the hand list
doesn't enumerate). The text_kernels_fuzz precedent, seeded (no RNG at
query time — the corpus is generated once per run from a fixed seed).
"""

from __future__ import annotations

import random
import re

import duckdb

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.llm_ops12 import (
    _NORM_STEPS,
    _URL_PREFIX,
    norm_url_col,
    norm_url_sql,
)


def _model(u: str) -> str:
    """The declared chain, replayed with Python re — an independent
    third implementation of the same step data."""
    u = re.sub(_NORM_STEPS[0][0], "", u)
    m = re.match(_URL_PREFIX.lstrip("^"), u)
    end = m.end() if m else 0
    u = u[:end].lower() + u[end:]
    for pat, java_repl, _ in _NORM_STEPS[1:]:
        u = re.sub(pat, java_repl.replace("$", "\\"), u)
    return u


def _gen_urls(n: int = 300) -> list[str]:
    rng = random.Random(20260816)
    out = []
    for _ in range(n):
        scheme = rng.choice(["http", "https", "HTTP", "HtTpS", "ftp"])
        www = rng.choice(["", "www.", "WWW."])
        host = ".".join(
            rng.choice(["Site", "ex", "Blog", "cdn"]) + str(rng.randrange(9))
            for _ in range(rng.randrange(1, 4))
        ) + rng.choice([".org", ".co.uk", ".NET"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        segs = [
            rng.choice(["A", "p", "Path", "x9"]) for _ in range(rng.randrange(0, 3))
        ]
        path = ("/" + "/".join(segs)) if segs else rng.choice(["", "/"])
        if path and rng.random() < 0.4:
            path += "/"
        params = []
        for _ in range(rng.randrange(0, 4)):
            if rng.random() < 0.5:
                params.append(f"utm_{rng.choice('abc')}={rng.randrange(99)}")
            else:
                params.append(f"{rng.choice(['id', 'q', 'Z'])}={rng.randrange(99)}")
        query = ("?" + "&".join(params)) if params else ""
        frag = rng.choice(["", "#f", "#a/b?c"])
        out.append(f"{scheme}://{www}{host}{port}{path}{query}{frag}")
    return out


def test_norm_url_three_engine_fuzz(spark):
    urls = _gen_urls()
    want = [_model(u) for u in urls]
    got_spark = [
        r[0]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(norm_url_col(F.col("url")))
        .collect()
    ]
    assert got_spark == want, next(
        (u, a, b) for u, a, b in zip(urls, got_spark, want) if a != b
    )
    con = duckdb.connect()
    values = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {norm_url_sql('url')} FROM (VALUES {values}) t(i, url) ORDER BY i"
        ).fetchall()
    ]
    assert got_duck == want, next(
        (u, a, b) for u, a, b in zip(urls, got_duck, want) if a != b
    )
