"""Regenerate plans/_verified_stamps.json — the fingerprint-keyed record of
driver-verified queries (see plans/provenance.py for the rationale).

For every query marked green in the given CORRECTNESS_r*.json files, stamp
it with its fingerprint computed from the given git SNAPSHOT (the tree the
driver actually verified), NOT the working tree. Queries edited since the
snapshot therefore mismatch on load and rotate back into the driver's
checked prefix.

Usage: python tools/stamp_verified.py <git-ref> [CORRECTNESS.json ...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")

from etl_from_s3_to_postgresql_template_spark.plans import provenance


def green_names(path: Path) -> set[str]:
    data = json.loads(path.read_text())
    out = set()
    for name, rec in data.items():
        if not isinstance(rec, dict) or rec.get("err"):
            continue
        if rec.get("rows_match") and rec.get("hash_match", True) and rec.get(
            "schema_match", True
        ):
            out.add(name)
    return out


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    files = [Path(p) for p in sys.argv[2:]] or sorted(
        Path("/root/repo").glob("CORRECTNESS_r*.json")
    )
    verified: set[str] = set()
    for f in files:
        verified |= green_names(f)

    with tempfile.TemporaryDirectory() as td:
        tar = subprocess.run(
            ["git", "-C", "/root/repo", "archive", ref], capture_output=True, check=True
        )
        subprocess.run(["tar", "-x", "-C", td], input=tar.stdout, check=True)
        snap_fp = provenance.fingerprint_all(td)

    stamps = {n: snap_fp[n] for n in sorted(verified) if n in snap_fp}
    provenance.STAMPS_FILE.write_text(json.dumps(stamps, indent=1, sort_keys=True) + "\n")
    missing = sorted(verified - set(snap_fp))
    print(f"stamped {len(stamps)} queries from {ref}; {len(missing)} green names "
          f"not in snapshot registry: {missing}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
