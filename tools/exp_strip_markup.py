"""A/B: docs_strip_markup codegen chain vs the fused Arrow kernel
(VERDICT r9 item 5 — VERDICT: kernel kept, registered as
docs_strip_markup_fused; see SCALING.md round-10).

Both arms are the REGISTERED entries (review r10: earlier revisions
timed private copies), and the timing/calibration harness is imported
from tools/bench_docs_dedup.py so the methodology cannot diverge
between tools. Semantics equality is asserted via row count +
order-free sum of per-row xxhash64 over all columns.

Usage:
  python tools/exp_strip_markup.py --plan codegen [corpus_dir]
  python tools/exp_strip_markup.py --plan kernel  [corpus_dir]
  python tools/exp_strip_markup.py --check        [corpus_dir]
  python tools/exp_strip_markup.py --ab           [corpus_dir]

Fresh-process single-arm runs are NOT cross-comparable (one recorded
pair landed at calib 0.319 vs 1.628); use --ab (same-session
alternating passes) for the ratio.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bench_docs_dedup import _calib, _time
from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.session import get_spark

_ARMS = {
    "codegen": "docs_strip_markup",
    "kernel": "docs_strip_markup_fused",
}


def _fingerprint(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("doc_id", "clean_text", "n_tag_chars", "n_entity_chars")
        ).alias("h"),
    ).first()
    return row["n"], row["h"]


def main() -> None:
    argv = list(sys.argv[1:])
    mode = None
    if "--plan" in argv:
        i = argv.index("--plan")
        mode = argv[i + 1]
        del argv[i : i + 2]
        if mode not in _ARMS:
            raise SystemExit(f"--plan must be one of {sorted(_ARMS)}, got {mode!r}")
    elif "--check" in argv:
        mode = "check"
        argv.remove("--check")
    elif "--ab" in argv:
        mode = "ab"
        argv.remove("--ab")
    else:
        raise SystemExit("pass --plan codegen|kernel, --check, or --ab")
    corpus = argv[0] if argv else "/tmp/docs_scale/big"
    calib = _calib()
    spark = get_spark("exp-strip-markup")
    if mode == "check":
        a = _fingerprint(QUERIES[_ARMS["codegen"]](spark, corpus))
        b = _fingerprint(QUERIES[_ARMS["kernel"]](spark, corpus))
        print(json.dumps({"mode": "check", "codegen": a, "kernel": b, "equal": a == b}))
        return
    if mode == "ab":
        # Same-session alternating passes: shared co-tenant regime, so
        # the RATIO is trustworthy even when the seconds are not.
        for arm in _ARMS.values():
            QUERIES[arm](spark, corpus).write.format("noop").mode("overwrite").save()
        pairs = []
        for _ in range(3):
            pair = {}
            for label, arm in _ARMS.items():
                t0 = time.perf_counter()
                QUERIES[arm](spark, corpus).write.format("noop").mode("overwrite").save()
                pair[label] = round(time.perf_counter() - t0, 3)
            pairs.append(pair)
        print(json.dumps({"mode": "ab", "corpus": corpus, "calib": calib, "pairs": pairs}))
        return
    mk = lambda: QUERIES[_ARMS[mode]](spark, corpus)  # noqa: E731
    passes = [_time(mk, warms=1) for _ in range(3)]
    print(
        json.dumps(
            {"mode": mode, "corpus": corpus, "calib": calib, "passes": passes, "best": min(passes)}
        )
    )


if __name__ == "__main__":
    main()
