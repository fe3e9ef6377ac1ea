"""Dual-oracle hash sweep of the current gate window at a given sf_dir,
emitting the BENCH_SF1_r{N}-style JSON artifact (the r14 "decade rule":
every window row's engine AND oracle must stay hash-green one decade
past the gate sf).

Usage: python tools/sweep_window.py <sf_dir> <out_json> [sf_label] [n_rows]

Runs tools/check_oracle.py in-process over the FIRST n_rows (default 50)
registry entries at sf_dir, then writes {metric, note, sf, sf_dir,
queries_combined_wall, value} — value = number of green rows; exits
non-zero if any row fails.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2]
    sf_label = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    n_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    import __spark_entry__ as ent

    rows = list(ent.queries())[:n_rows]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         sf_dir, *rows],
        capture_output=True, text=True,
    )
    walls: dict[str, float | None] = {}
    n_green = 0
    failed = []
    for line in proc.stdout.splitlines():
        m = re.match(r"^(ok|FAIL)\s+(\S+).*\((?:oracle|rows-only), ([0-9.]+)s\)", line)
        if m:
            walls[m.group(2)] = float(m.group(3))
            n_green += 1
        elif line.startswith("FAIL"):
            m2 = re.match(r"^FAIL\s+(\S+)\s+\(([0-9.]+)s\)", line)
            if m2:
                walls[m2.group(1)] = float(m2.group(2))
                failed.append(m2.group(1))
    payload = {
        "metric": f"sf{sf_label:g}_window_hash_sweep",
        "sf": sf_label,
        "sf_dir": sf_dir,
        "unit": "rows_green",
        "value": n_green,
        "failed": failed,
        "queries_combined_wall": {k: walls.get(k) for k in rows},
        "note": (
            "Dual-oracle (Spark vs DuckDB) hash sweep of the full rotated "
            "gate window; walls are COMBINED Spark+DuckDB per row."
        ),
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(proc.stdout[-2000:])
    print(f"wrote {out_json}: {n_green}/{len(rows)} green; failed={failed}")
    sys.exit(1 if failed or n_green < len(rows) else 0)


if __name__ == "__main__":
    main()
