"""Fingerprint-keyed verified stamps (plans/provenance.py): editing a plan
module OR an operator it imports must invalidate the affected queries'
verified status, so the driver's bounded-prefix gate re-checks them
(the ADVICE r3 steering hazard)."""

from __future__ import annotations

import json
import shutil

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES, provenance


def test_every_registered_query_has_a_fingerprint():
    fps = provenance.fingerprint_all()
    missing = set(QUERIES) - set(fps)
    assert not missing, f"queries with no @query-site fingerprint: {sorted(missing)}"


def test_editing_an_operator_invalidates_its_queries(tmp_path):
    pkg_src = provenance._pkg_root(None)
    pkg_dst = tmp_path / provenance._PKG
    shutil.copytree(pkg_src, pkg_dst)
    before = provenance.fingerprint_all(tmp_path)

    with open(pkg_dst / "operators" / "dedup.py", "a") as f:
        f.write("\n# planted edit\n")
    after = provenance.fingerprint_all(tmp_path)

    # queries whose plan module imports operators.dedup must change ...
    assert before["dedup_minhash_pairs"] != after["dedup_minhash_pairs"]
    assert before["dedup_fuzzy_levenshtein"] != after["dedup_fuzzy_levenshtein"]
    # ... while unrelated TPC-H plans keep their fingerprint
    assert before["q1_pricing_summary"] == after["q1_pricing_summary"]

    with open(pkg_dst / "plans" / "query_pack.py", "a") as f:
        f.write("\n# planted edit\n")
    assert provenance.fingerprint_all(tmp_path)["q1_pricing_summary"] != before["q1_pricing_summary"]


def test_verified_names_only_contains_fingerprint_matches():
    stamps = json.loads(provenance.STAMPS_FILE.read_text())
    current = provenance.fingerprint_all()
    valid = provenance.verified_names()
    assert valid <= set(stamps)
    for n in valid:
        assert current[n] == stamps[n]
    # a stamped name whose source changed this round must NOT be valid
    mismatched = {n for n in stamps if current.get(n) != stamps[n]}
    assert not (mismatched & valid)
