"""Per-stage decomposition of a registered plan at two scales.

The 100x sweep grades by wall-ratio; when a plan's ratio lands above the
pack (e.g. dedup_minhash_pairs 15.7, corpus_inverted_index 13.8 in the r6
final sweep) the follow-up question is WHICH stage departs from linear —
compute, shuffle, or a single-partition structure. This reads per-stage
executor time + input/shuffle bytes/records from Spark's AppStatusStore
(same source as tools/shuffle_bytes.py) for one warm run at each scale and
prints the per-stage table plus big/small ratios keyed by stage NAME (the
stage graph is identical across scales for a fixed plan, so name+order
aligns).

Usage: python tools/stage_decompose.py <plan> <small_dir> <big_dir>
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark


def _stages(spark) -> dict[int, dict]:
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    statuses = sc._jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(sc._jvm.double, 0)
    task_status = sc._jvm.java.util.ArrayList()
    it = store.stageList(statuses, False, False, quantiles, task_status).iterator()
    out = {}
    while it.hasNext():
        s = it.next()
        out[int(s.stageId())] = {
            "name": str(s.name()).split("\n")[0][:70],
            "tasks": int(s.numTasks()),
            "exec_ms": int(s.executorRunTime()),
            "input_mb": round(int(s.inputBytes()) / 1e6, 1),
            "sh_read_mb": round(int(s.shuffleReadBytes()) / 1e6, 1),
            "sh_write_mb": round(int(s.shuffleWriteBytes()) / 1e6, 1),
            "sh_write_rec": int(s.shuffleWriteRecords()),
        }
    return out


def run_once(spark, name: str, sf_dir: str) -> list[dict]:
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    before = set(_stages(spark))
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    after = _stages(spark)
    return [after[sid] for sid in sorted(set(after) - before)]


def main() -> None:
    name, small, big = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_spark("stage-decompose")
    s_stages = run_once(spark, name, small)
    b_stages = run_once(spark, name, big)
    print(f"== {name}: small={small} ({len(s_stages)} stages), big={big} ({len(b_stages)} stages)")
    print(json.dumps({"small": s_stages}, indent=1))
    print(json.dumps({"big": b_stages}, indent=1))
    # align by order (same plan -> same stage sequence); when AQE makes
    # the counts differ, fall back to uniquely-named stage alignment and
    # say what was skipped rather than silently dropping the table
    if len(s_stages) == len(b_stages):
        pairs = list(zip(s_stages, b_stages))
        print("stage-by-stage ratios (big/small):")
    else:
        from collections import Counter

        sc = Counter(s["name"] for s in s_stages)
        bc = Counter(b["name"] for b in b_stages)
        smap = {s["name"]: s for s in s_stages}
        bmap = {b["name"]: b for b in b_stages}
        uniq = [
            s["name"] for s in s_stages if sc[s["name"]] == 1 and bc.get(s["name"]) == 1
        ]
        pairs = [(smap[n], bmap[n]) for n in uniq]
        print(
            f"stage counts differ ({len(s_stages)} vs {len(b_stages)}; AQE "
            f"re-plan) — aligned {len(pairs)} uniquely-named stages, "
            f"skipped {len(s_stages) - len(pairs)} small-side stages:"
        )
    for s, b in pairs:
        er = round(b["exec_ms"] / max(s["exec_ms"], 1), 1)
        br = round(
            (b["sh_write_mb"] or 0.001) / max(s["sh_write_mb"] or 0.001, 0.001), 1
        )
        print(
            f"  exec x{er:<7} shuffle-write x{br:<7} "
            f"[{s['exec_ms']}ms -> {b['exec_ms']}ms; "
            f"{s['sh_write_mb']}MB -> {b['sh_write_mb']}MB]  {s['name']}"
        )


if __name__ == "__main__":
    main()
