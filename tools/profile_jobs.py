"""Per-query job/stage/task/byte profile at one scale.

For each named query (default: the bench list), runs one warm-up noop pass
then one measured noop pass and reports wall seconds plus the number of
Spark jobs, stages, tasks, input bytes and shuffle-write bytes the measured
pass produced (AppStatusStore deltas, the shuffle_bytes.py source). The
job/stage counts expose plan-construction overhead (checkpoint
materializations, broadcast builds, sizing counts) that the SQL-plan text
hides behind Scan ExistingRDD nodes.

Usage: python tools/profile_jobs.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark


def _counts(spark) -> tuple[int, int, int, int, int]:
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    statuses = sc._jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(sc._jvm.double, 0)
    task_status = sc._jvm.java.util.ArrayList()
    jobs = 0
    it = store.jobsList(statuses).iterator()
    while it.hasNext():
        it.next()
        jobs += 1
    stages = tasks = in_bytes = sw_bytes = 0
    it = store.stageList(statuses, False, False, quantiles, task_status).iterator()
    while it.hasNext():
        s = it.next()
        stages += 1
        tasks += s.numCompleteTasks()
        in_bytes += s.inputBytes()
        sw_bytes += s.shuffleWriteBytes()
    return jobs, stages, tasks, in_bytes, sw_bytes


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    if not names:
        from bench import DOCS_HEAVY, HEADLINE, HEAVY

        names = HEADLINE + HEAVY + DOCS_HEAVY
    spark = get_spark("profile-jobs")
    rows = []
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = _counts(spark)
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = _counts(spark)
        d = [a - b for a, b in zip(after, before)]
        rows.append(
            {
                "name": name,
                "sec": round(wall, 3),
                "jobs": d[0],
                "stages": d[1],
                "tasks": d[2],
                "input_mb": round(d[3] / 1e6, 1),
                "shuffle_mb": round(d[4] / 1e6, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"total_sec": round(sum(r["sec"] for r in rows), 3)}))


if __name__ == "__main__":
    main()
