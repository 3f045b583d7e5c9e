"""Regenerate plans/_verified_stamps.json — the fingerprint-keyed record of
driver-verified queries (see plans/provenance.py for the rationale).

For every query marked green in the given CORRECTNESS_r*.json files, stamp
it with its fingerprint computed from the given git SNAPSHOT (the tree the
driver actually verified), NOT the working tree. Queries edited since the
snapshot therefore mismatch on load and rotate back into the driver's
checked prefix.

Two usage forms:

  python tools/stamp_verified.py <git-ref> [CORRECTNESS.json ...]
      Single-snapshot form (historical): stamp every green name across the
      given files at ONE tree. Safe only when every green name is known
      untouched since its verifying round — otherwise an entry green in an
      old round but edited since gets a falsely-current stamp.

  python tools/stamp_verified.py <ref>=<file> [<ref>=<file> ...]
      Per-round form (preferred): each CORRECTNESS file is stamped at the
      tree its driver run actually verified; later pairs override earlier
      ones for the same name. An entry green in round N but edited in round
      M>N keeps its round-N fingerprint, mismatches the current tree, and
      correctly rotates back into the checked prefix.

Greenness: rows+schema+hash all matched, OR the entry is rows-only by
design (err == "no_oracle") and the driver ran it clean with spark_rows > 0
— that weaker check is still a driver ratification of the plan as-built,
and stamping it stops rows-only entries from permanently occupying the
driver's bounded prefix (they'd re-queue on any source edit regardless).

Provenance ledger (VERDICT r9 item 1): every stamping run also writes
plans/_verified_stamps_meta.json — {name: {kind, ref, file}} — where kind
is "driver" (the file is a driver CORRECTNESS_rN.json, flat shape) or
"local_sweep" (a check_correctness --json artifact, entries-wrapped shape),
auto-detected from the file, so the ledger always shows whether a stamp
rests on a driver run at that tree or on the local replica of the gate.
Names stamped before the ledger existed and not re-stamped since carry
kind "pre_r10". The stamps file itself stays flat {name: fingerprint} —
readers (plans/provenance.py) are unchanged.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")

from etl_from_s3_to_postgresql_template_spark.plans import provenance


META_FILE = provenance.META_FILE


def file_kind(data: dict) -> str:
    """driver CORRECTNESS_rN.json is flat {name: rec}; the local
    checker's --json artifact wraps records under "entries"."""
    return "local_sweep" if isinstance(data.get("entries"), dict) else "driver"


def green_names(path: Path, data: dict | None = None) -> set[str]:
    if data is None:
        data = json.loads(path.read_text())
    # two on-disk shapes: driver CORRECTNESS_rN.json is flat
    # {name: rec}; check_correctness --json wraps records under
    # "entries" with run metadata alongside
    if isinstance(data.get("entries"), dict):
        data = data["entries"]
    out = set()
    for name, rec in data.items():
        if not isinstance(rec, dict):
            continue
        err = rec.get("err")
        rows_only = err == "no_oracle" or rec.get("rows_only") is True
        if rows_only and (rec.get("spark_rows") or 0) > 0:
            # rows-only by design, ran clean ("no_oracle" is the driver's
            # marker; "rows_only" the local checker's)
            out.add(name)
            continue
        if err:
            continue
        if rec.get("rows_match") and rec.get("hash_match", True) and rec.get(
            "schema_match", True
        ):
            out.add(name)
    return out


_SNAP_CACHE: dict[str, dict[str, str]] = {}


def snapshot_fingerprints(ref: str) -> dict[str, str]:
    # memoized per ref: the default branch stamps many CORRECTNESS
    # files at ONE ref and would otherwise archive+untar+fingerprint
    # the tree once per file (review r10)
    if ref in _SNAP_CACHE:
        return _SNAP_CACHE[ref]
    with tempfile.TemporaryDirectory() as td:
        tar = subprocess.run(
            ["git", "-C", "/root/repo", "archive", ref], capture_output=True, check=True
        )
        subprocess.run(["tar", "-x", "-C", td], input=tar.stdout, check=True)
        _SNAP_CACHE[ref] = provenance.fingerprint_all(td)
    return _SNAP_CACHE[ref]


def main() -> int:
    argv = sys.argv[1:]
    stamps: dict[str, str] = {}
    meta: dict[str, dict] = {}
    missing: set[str] = set()

    def overlay(ref: str, fname: str) -> None:
        snap_fp = snapshot_fingerprints(ref)
        path = Path(fname)
        data = json.loads(path.read_text())  # parsed once for kind + names
        kind = file_kind(data)
        # driver_round: the round number of the LATEST driver ratification,
        # parsed from the driver file name. plans/__init__ sorts the
        # driver-green tier oldest-evidence-first on this, so the bounded
        # per-round prefix drains the re-ratification debt optimally
        # (module import order alone wastes slots on just-ratified entries
        # sharing a module with stale ones). A local_sweep overlay keeps
        # the prior driver_round — it refreshes the stamp, not the driver
        # evidence. NB the two halves of a meta entry answer different
        # questions: kind/ref/file describe the artifact the ACTIVE stamp
        # rests on (later pairs override, like the stamp itself), while
        # driver_round is the newest driver evidence across ALL rounds
        # (max) — if files are passed out of round order they legitimately
        # diverge; source changes since that evidence are still caught by
        # the fingerprint (tier 1), never by vintage.
        rnd_m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        rnd = int(rnd_m.group(1)) if (kind == "driver" and rnd_m) else None
        names = green_names(path, data)
        for n in sorted(names):
            if n in snap_fp:
                stamps[n] = snap_fp[n]
                prev = meta.get(n, {}).get("driver_round")
                best = max(r for r in (prev, rnd, 0) if r is not None)
                meta[n] = {"kind": kind, "ref": ref, "file": path.name,
                           "driver_round": best}
            else:
                missing.add(n)
        print(f"  {fname} @ {ref} [{kind}]: {len(names)} green")

    if argv and argv[0] == "--merge":
        # Merge form: keep the existing ledger (each name still stamped at
        # the tree that verified it) and OVERLAY the given ref=file pairs —
        # the same later-overrides semantics as the per-round form, without
        # needing every historical ref on the command line. Used at session
        # close to stamp the fresh local sweep at the closing tree.
        stamps = json.loads(provenance.STAMPS_FILE.read_text())
        if META_FILE.exists():
            meta = json.loads(META_FILE.read_text())
        meta = {
            n: meta.get(n, {"kind": "pre_r10", "ref": None, "file": None})
            for n in stamps
        }
        for pair in argv[1:]:
            ref, _, fname = pair.partition("=")
            overlay(ref, fname)
    elif argv and all("=" in a for a in argv):
        for pair in argv:  # per-round form, later rounds override
            ref, _, fname = pair.partition("=")
            overlay(ref, fname)
    else:
        ref = argv[0] if argv else "HEAD"
        files = [Path(p) for p in argv[1:]] or sorted(
            Path("/root/repo").glob("CORRECTNESS_r*.json")
        )
        for f in files:
            overlay(ref, str(f))

    meta = {n: m for n, m in meta.items() if n in stamps}
    provenance.STAMPS_FILE.write_text(
        json.dumps(stamps, indent=1, sort_keys=True) + "\n"
    )
    META_FILE.write_text(json.dumps(meta, indent=1, sort_keys=True) + "\n")
    current = provenance.fingerprint_all()
    valid = sum(1 for n, fp in stamps.items() if current.get(n) == fp)
    kinds: dict[str, int] = {}
    for m in meta.values():
        kinds[m["kind"]] = kinds.get(m["kind"], 0) + 1
    print(
        f"stamped {len(stamps)} queries ({valid} valid against working tree, "
        f"{len(current) - valid} of {len(current)} registered unstamped); "
        f"provenance {kinds}; "
        f"{len(missing)} green names not in any snapshot registry: {sorted(missing)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
