"""Combined big-scale bench: the FULL bench.py pack (TPC + docs sides)
against ONE fixture directory holding both the sf~1 key-offset TPC
tables (tools/make_big_sf.py) and the 500k-doc controlled-duplication
documents/embeddings (tools/make_big_docs.py big half) — closing the
"different harness" seam between the TPC and docs scale evidence
(VERDICT r11 item 6): one run, one table, both sides.

Methodology is the 500k-sweep convention (SCALING.md r8 note): ONE
fresh subprocess per plan — measuring many plans in one session
contaminates later readings (accumulated checkpoint RDD blocks + GC).
EAGER_PLANS (construction-time jobs / internal localCheckpoint) are
thunk-timed; dedup_semantic_clusters runs with k scaled per its own
contract (k ~ n/target_cell), exactly as tools/bench_docs_dedup.py
does — running the registered k=16 artifact at 500k docs would
measure a configuration its docstring forbids.

Setup (fixtures are /tmp-resident, gone on container restart):
  python tools/make_big_sf.py /root/testdata/sf0.1 /tmp/sfbig 10
  python tools/make_big_docs.py /tmp/docs_scale 5000 100
  python tools/bench_combined.py --setup /tmp/sf_combined   # symlinks
  python tools/bench_combined.py /tmp/sf_combined [factor]  # the run

Child form (internal): python tools/bench_combined.py --one NAME DIR FACTOR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

_TPC_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events",
]


def setup(dst: str, sfbig: str = "/tmp/sfbig", docs_big: str = "/tmp/docs_scale/big") -> None:
    os.makedirs(dst, exist_ok=True)
    for t in _TPC_TABLES:
        src = f"{sfbig}/{t}.parquet"
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(src, link)
    for t in ("documents", "embeddings"):
        src = f"{docs_big}/{t}.parquet"
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(src, link)
    print(f"combined fixture at {dst}: " + ", ".join(sorted(os.listdir(dst))))


def run_one(name: str, sf_dir: str, factor: int) -> None:
    from etl_from_s3_to_postgresql_template_spark.session import get_spark

    from tools.bench_docs_dedup import EAGER_PLANS, _calib, _time

    spark = get_spark("bench-combined")
    calib = _calib()
    if name == "dedup_semantic_clusters":
        from etl_from_s3_to_postgresql_template_spark.operators.intquant import (
            int8_centroids,
        )
        from etl_from_s3_to_postgresql_template_spark.plans.llm_ops5 import (
            semantic_dedup_frame,
        )

        sec = _time(semantic_dedup_frame(spark, sf_dir, centroids=int8_centroids(16 * factor)))
        label = f"{name} (k=16*{factor})"
    else:
        from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

        fn = QUERIES[name]
        if name in EAGER_PLANS:
            sec = _time(lambda: fn(spark, sf_dir))
        else:
            sec = _time(fn(spark, sf_dir))
        label = name
    print(json.dumps({"name": label, "sec": sec, "calib": calib}))


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--setup":
        setup(argv[1] if len(argv) > 1 else "/tmp/sf_combined")
        return 0
    if argv and argv[0] == "--one":
        run_one(argv[1], argv[2], int(argv[3]))
        return 0

    sf_dir = argv[0] if argv else "/tmp/sf_combined"
    factor = int(argv[1]) if len(argv) > 1 else 100
    import bench  # the plan list of record

    names = bench.HEADLINE + bench.HEAVY + bench.DOCS_HEAVY
    results: dict[str, float] = {}
    calibs: list[float] = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name, sf_dir, str(factor)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"FAIL {name}: {proc.stderr.strip().splitlines()[-3:]}")
            results[name] = float("nan")
            continue
        rec = json.loads(line[-1])
        results[rec["name"]] = rec["sec"]
        calibs.append(rec["calib"])
        print(f"{rec['name']}: {rec['sec']} s (calib {rec['calib']}, subprocess {round(time.time()-t0,1)} s)")
    out = {
        "metric": "combined_sf1_500kdocs_full_pack",
        "unit": "sec",
        "sf_dir": sf_dir,
        "queries": results,
        "total": round(sum(v for v in results.values() if v == v), 3),
        "calib_median": sorted(calibs)[len(calibs) // 2] if calibs else None,
        "reference_only": getattr(bench, "REFERENCE_ONLY", []),
        "wall_total": round(time.time() - t_all, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
