"""Round-12 sanctioned-edit pins: the tightened CCNet agreement floor,
the eta staging guard, and the bench artifact self-description."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES


def test_ccnet_agreement_gate_holds_90_floor_at_fixture(spark):
    """The r12-tightened floor: >= 90% bucket agreement at the driver
    fixture scales (measured 95.6% at sf0.001, 92.2% at sf0.01 — the
    gate docstring records the full scale curve and why it degrades
    at fixed B past the driver scales)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        row = QUERIES["docs_ccnet_ppl_agreement_gate"](spark, sf).collect()[0]
        assert row.agree_ok, f"agreement below the 90% floor at {sf}"


def test_eta_micro_stages_exactly():
    """ADVICE r11: the DoReMi e-step stages eta as 1000 * (eta // 1000);
    the module refuses to import with a non-multiple (the assert), and
    the current constant satisfies the precondition."""
    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops12 import (
        _DM_ETA_MICRO,
    )

    assert _DM_ETA_MICRO % 1000 == 0
    assert 1000 * (_DM_ETA_MICRO // 1000) == _DM_ETA_MICRO


def test_bench_reference_only_is_subset_of_tracked():
    """bench.py's reference_only labels must name tracked queries, so
    the JSON artifact stays self-consistent."""
    import bench

    tracked = set(bench.HEADLINE + bench.HEAVY + bench.DOCS_HEAVY)
    assert set(bench.REFERENCE_ONLY) <= tracked
    # and each reference twin has its production sibling in the pack
    assert "docs_ccnet_ppl_buckets_fast" in tracked
    assert "doc_winnowing_fingerprints_fast" in tracked
    assert "dedup_winnowing_pairs_fast" in tracked
