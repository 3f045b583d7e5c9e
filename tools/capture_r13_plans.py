"""Capture `.explain("formatted")` for benched queries -> plans/r13/.

Usage: python tools/capture_r13_plans.py before|after [name ...]
Writes plans/r13/<query>_<suffix>.txt for each benched query (default: the
full bench list). Unlike the r12 capture (sf0.001), this captures at sf0.1 —
the driver's bench scale — so the small-scan parallelization byte gate
(sources/registry.py) FIRES and its round-robin exchange is visible in the
committed artifacts (VERDICT r12 item 6: the r12 plans were captured at a
scale where the gate self-disabled, leaving the most-applied change
artifact-invisible). Explain output is pre-AQE (isFinalPlan=false).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import DOCS_HEAVY, HEADLINE, HEAVY  # noqa: E402
from etl_from_s3_to_postgresql_template_spark.plans import QUERIES  # noqa: E402
from etl_from_s3_to_postgresql_template_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r13"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or (HEADLINE + HEAVY + DOCS_HEAVY)
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("capture-r13-plans")
    for name in names:
        try:
            df = QUERIES[name](spark, SF)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - capture tool only
            plan = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("EXPLAIN FAILED") else "FAILED")


if __name__ == "__main__":
    main()
