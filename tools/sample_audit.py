"""Driver-sample insurance: fail if any registry query has NO green
correctness evidence anywhere in the repo.

The driver's per-round gate samples only ~50 of the registry's queries
(CORRECTNESS_r{N}.json); the full-registry evidence lives in the
committed local sweeps (CORRECTNESS_local_r{N}.json). A query added
without landing in either set would ship with zero recorded evidence —
exactly the r6 gap where 16 new TPC-H queries had no committed sweep.

Usage: python tools/sample_audit.py
Exit 0 = every queries() entry has a green row (PASS/ROWS driver row or
local-sweep PASS/ROWS status) in some committed artifact; exit 1 lists
the uncovered or failing queries. Run after regenerating the round's
local sweep.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def covered_queries() -> dict[str, str]:
    """query name -> newest green evidence source."""
    green: dict[str, str] = {}
    # driver artifacts: {name: {rows_match, schema_match, hash_match, err}}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            # Green = oracled hash-match, or the driver's declared
            # rows-only row (err == "no_oracle" with a recorded count).
            # Anything else — hash_match false, rows_match false, a real
            # err string — is NOT evidence.
            oracled_pass = rec.get("err") is None and rec.get("hash_match") is True
            rows_only = (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
                and rec.get("spark_rows") >= 0
            )
            if oracled_pass or rows_only:
                green[name] = os.path.basename(path)
    # local full sweeps: {"results": {name: {"status": PASS|ROWS|FAIL}}}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_local_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.get("results", {}).items():
            if rec.get("status") in ("PASS", "ROWS"):
                green[name] = os.path.basename(path)
    return green


def main() -> int:
    import __spark_entry__ as se

    registry = set(se.queries())
    green = covered_queries()
    uncovered = sorted(registry - set(green))
    stale = sorted(set(green) - registry)
    print(f"registry queries: {len(registry)}")
    print(f"green evidence:   {len(registry) - len(uncovered)}/{len(registry)}")
    if stale:
        print(f"note: {len(stale)} artifact queries no longer in registry: {stale}")
    if uncovered:
        print("UNCOVERED (no committed green evidence):")
        for name in uncovered:
            print(f"  {name}")
        return 1
    print("OK: every registry query has committed green evidence")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
