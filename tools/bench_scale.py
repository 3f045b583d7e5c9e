"""Scale-stress: run the scan/join/agg/window headline queries at sf0.1
and at the 10x replica fixture (tools/make_big_sf.py), print per-query
wall times and the 10x/1x ratio.

What linear-ish ratios prove: no plan in this set hides a super-linear
term (driver collect, unblocked quadratic join, global sort of raw rows)
that correctness checks can't see. Text/dedup/similarity queries are
excluded by design — the replica fixture has no documents/embeddings
(see make_big_sf.py for why naive text replication would plant a fake
quadratic) — their scale arguments are structural (banded LSH buckets,
broadcast query sides; SCALING.md).

Usage: python tools/bench_scale.py [small_dir] [big_dir] [factor] [subset]
  subset: "core" (default, the r3 10x set) or "heavy" (r4 100x set: the
  most expensive multi-join / window / range-join plans).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark

SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_topk_per_group",
    "join_asof",
    "agg_rows_per_day",
    "events_wau_rolling",
    "events_gap_sessionize",
    "orders_pareto_abc",
    "join_skew_diagnosis",
]

# r4: the heaviest registered plans on the replicated tables — multi-join
# TPC-H (q9 six-table, q21 four-way self-join, q18 group-having-join,
# q7/q8 nation-pair), the non-equi/banded joins the r3 verdict watch-listed,
# and the widest window/stateful shapes.
HEAVY = [
    "q9_product_profit",
    "q21_waiting_suppliers",
    "q18_large_orders",
    "q7_volume_shipping",
    "q8_market_share",
    "join_interval_banded",
    "events_wau_rolling",
    "window_rolling_hour_sum",
    "events_resample_ffill",
    "scd2_user_daily_value",
]


# r4: dedup/ANN/text plans over the controlled-duplication corpus
# (tools/make_big_docs.py) — the text-side scale stress the key-offset
# replica cannot provide. Exact all-pairs tiers (dedup_embedding_pairs,
# split_leakage_scan_exact) are EXCLUDED by design: they are documented
# fixture-scale oracle twins, not production plans.
DOCS = [
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_exact_docs",
    "dedup_semantic_clusters",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "similarity_topk_ivfpq",
    "split_leakage_scan",
    "docs_repeated_spans",
    "text_quality",
]

_SUBSETS = {"core": SUBSET, "heavy": HEAVY, "docs": DOCS}


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    subset = _SUBSETS[sys.argv[4]] if len(sys.argv) > 4 else SUBSET
    # at factor>=100 a single timed pass after warmup is enough: the signal
    # is linear-vs-quadratic (factor vs factor^2), not +-10% precision
    n_timed = 1 if factor >= 100 else 2
    spark = get_spark("bench-scale")
    out = {}
    for name in subset:
        times = {}
        for label, sf_dir in (("small", small), ("big", big)):
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(n_timed):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[label] = round(best, 3)
        times["ratio"] = round(times["big"] / times["small"], 2)
        out[name] = times
        print(json.dumps({name: times}))
    ratios = [v["ratio"] for v in out.values()]
    print(json.dumps({"median_ratio": sorted(ratios)[len(ratios) // 2], "data_factor": factor}))


if __name__ == "__main__":
    main()
