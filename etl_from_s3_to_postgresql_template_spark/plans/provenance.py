"""Plan-source fingerprints: verified-status that auto-invalidates on edit.

The external driver's correctness gate checks a bounded PREFIX of the
registry each round, so plans/__init__ rotates not-yet-verified queries to
the front. "Verified" used to be a hardcoded name list — which silently kept
a query out of the re-check window even after its plan was rewritten (the
exact hazard ADVICE.md r3 flagged). Here verified status is keyed on a
FINGERPRINT of the query's source instead: sha256 over the defining plan
module's text plus the text of every in-package module it imports
(operators/functions/sources/streaming/plans helpers, one level deep).
Any edit to the plan, its oracle SQL (inline in the module), or an operator
it calls changes the fingerprint, drops the query from the verified set,
and rotates it back into the driver's checked prefix automatically.

Everything is TEXT-based (no imports of the target tree), so
tools/stamp_verified.py can compute fingerprints for an arbitrary git
snapshot — stamps are generated from the tree the driver actually verified,
not from whatever the working tree has mutated into since.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

_PKG = "etl_from_s3_to_postgresql_template_spark"
# One fingerprint ingredient per in-package module import. Matches both
# top-level and function-local `from pkg.sub.mod import ...` forms.
_IMPORT_RE = re.compile(
    rf"from {_PKG}\.(\w+)(?:\.(\w+))? import|import {_PKG}\.(\w+)\.(\w+)"
)
# Matches @query registration sites (the only registration mechanism).
# NB: this module lives in plans/ and is scanned by query_module_map too,
# so no text here may look like a real registration call — a literal
# example in this comment once produced a phantom registry entry.
_QUERY_RE = re.compile(r"@query\(\s*\n?\s*[\"']([A-Za-z0-9_]+)[\"']")

STAMPS_FILE = Path(__file__).with_name("_verified_stamps.json")
#: provenance ledger beside the stamps ({name: {kind, ref, file,
#: driver_round}} — see tools/stamp_verified.py). Shared constant so the
#: writer (stamp_verified) and the reader (plans/__init__'s vintage
#: rotation) cannot drift apart on the filename.
META_FILE = STAMPS_FILE.with_name("_verified_stamps_meta.json")


def _pkg_root(root: str | Path | None = None) -> Path:
    if root is None:
        return Path(__file__).resolve().parents[1]
    return Path(root) / _PKG


def query_module_map(root: str | Path | None = None) -> dict[str, Path]:
    """name -> plan-module path, by scanning @query sites in plans/*.py."""
    out: dict[str, Path] = {}
    for f in sorted((_pkg_root(root) / "plans").glob("*.py")):
        for name in _QUERY_RE.findall(f.read_text()):
            out[name] = f
    return out


def _dep_files(module_path: Path, root: Path) -> list[Path]:
    deps: set[Path] = set()
    for m in _IMPORT_RE.finditer(module_path.read_text()):
        sub, mod = (m.group(1), m.group(2)) if m.group(1) else (m.group(3), m.group(4))
        cand = root / sub / f"{mod}.py" if mod else root / f"{sub}.py"
        if cand.exists() and cand != module_path:
            deps.add(cand)
    return sorted(deps)


def fingerprint_all(root: str | Path | None = None) -> dict[str, str]:
    """name -> sha256 fingerprint for every registered query in the tree."""
    pkg = _pkg_root(root)
    mod_map = query_module_map(root)
    text_cache: dict[Path, str] = {}

    def text(p: Path) -> str:
        if p not in text_cache:
            text_cache[p] = p.read_text()
        return text_cache[p]

    fp_cache: dict[Path, str] = {}
    out: dict[str, str] = {}
    for name, mod in mod_map.items():
        if mod not in fp_cache:
            h = hashlib.sha256(text(mod).encode())
            for dep in _dep_files(mod, pkg):
                h.update(b"\0")
                h.update(text(dep).encode())
            fp_cache[mod] = h.hexdigest()
        out[name] = fp_cache[mod]
    return out


def verified_names() -> frozenset[str]:
    """Names whose stamped fingerprint matches the CURRENT source — i.e.
    driver-verified and untouched since. Edited or new queries drop out."""
    if not STAMPS_FILE.exists():
        return frozenset()
    stamps: dict[str, str] = json.loads(STAMPS_FILE.read_text())
    current = fingerprint_all()
    return frozenset(n for n, fp in stamps.items() if current.get(n) == fp)
