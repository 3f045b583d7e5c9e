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

Usage: python tools/bench_scale.py [small_dir] [big_dir]
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


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    spark = get_spark("bench-scale")
    out = {}
    for name in SUBSET:
        times = {}
        for label, sf_dir in (("small", small), ("big", big)):
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[label] = round(best, 3)
        times["ratio"] = round(times["big"] / times["small"], 2)
        out[name] = times
        print(json.dumps({name: times}))
    ratios = [v["ratio"] for v in out.values()]
    print(json.dumps({"median_ratio": sorted(ratios)[len(ratios) // 2], "data_factor": 10}))


if __name__ == "__main__":
    main()
