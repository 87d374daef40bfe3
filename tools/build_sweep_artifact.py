"""Build CORRECTNESS_local_r{N}.json from check_correctness.py output.

Usage: python tools/build_sweep_artifact.py <round> <sweep.txt> [note]

Parses the PASS/ROWS/FAIL lines of a full-registry sweep into the
committed artifact format (r4/r5 precedent) and cross-checks the parsed
query set against the live registry so a truncated sweep cannot be
committed as "full".
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LINE = re.compile(r"^(PASS|ROWS|FAIL)\s+(\S+):\s*(.*)$")


def main() -> int:
    # optional flags anywhere: --sf=0.1 (recorded scale factor) and
    # --suffix=_sf01 (artifact filename suffix) — the r8 convention's
    # CORRECTNESS_local_r{N}_sf01.json was hand-assembled; now the one
    # tool writes both artifacts
    sf = 0.01
    suffix = ""
    args = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = float(a.split("=", 1)[1])
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            args.append(a)
    rnd = int(args[0])
    sweep_path = args[1]
    note = args[2] if len(args) > 2 else ""

    results: dict[str, dict[str, str]] = {}
    with open(sweep_path, errors="replace") as f:
        for raw in f:
            m = LINE.match(raw.strip().split("\r")[-1])
            if m:
                status, name, detail = m.groups()
                results[name] = {"status": status, "detail": detail}

    import __spark_entry__ as se

    registry = set(se.queries())
    missing = sorted(registry - set(results))
    extra = sorted(set(results) - registry)
    if missing:
        print(f"ERROR: sweep is missing {len(missing)} registry queries: {missing}")
        return 1
    if extra:
        print(f"note: dropping {len(extra)} non-registry lines: {extra}")
        for name in extra:
            del results[name]

    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    n_rows = sum(1 for r in results.values() if r["status"] == "ROWS")
    n_fail = sum(1 for r in results.values() if r["status"] == "FAIL")
    artifact = {
        "round": rnd,
        "sf": sf,
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_rows_only": n_rows,
        "n_fail": n_fail,
        "tool": "tools/check_correctness.py"
        + (f" ({note})" if note else " (full registry sweep)"),
        "results": results,
    }
    out = os.path.join(REPO, f"CORRECTNESS_local_r{rnd:02d}{suffix}.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out}: {len(results)} queries, {n_pass} PASS / {n_rows} ROWS / {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
