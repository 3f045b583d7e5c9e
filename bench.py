"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with a
noop sink (full computation, no collect-to-driver skew, no sink cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_from_s3_to_postgresql_template_spark.session import get_spark
from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

# Headline set: scan-agg, multi-join, window, as-of, LSH dedup, ANN, text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_topk_per_group",
    "join_asof",
    "agg_rows_per_day",
    "dedup_exact",
    "dedup_minhash_pairs",
    "similarity_topk_bruteforce",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm the JVM/codegen once with the cheapest query (not timed).
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Three passes per query: pass 1 pays one-time costs (codegen compile,
    # Python UDF worker spinup, first-touch GC), passes 2-3 approximate the
    # steady-state latency a long-running cluster job sees. Headline value =
    # best of the two steady-state passes (TPC power-run convention, with
    # min instead of second-run to resist this shared box's ±40% noise);
    # the cold total is reported alongside.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        passes = []
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            passes.append(time.perf_counter() - t0)
        warm[name] = round(min(passes), 3)

    total = round(sum(warm.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_warm",
                "value": total,
                "unit": "sec",
                "queries": warm,
                "cold_total": round(sum(cold.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
