"""Bench stdout-length guard (r11, r10 verdict #6).

The round driver records only the LAST 2000 characters of bench stdout
and json-parses that tail — BENCH_r06..r09 were all ``parsed: null``
because the one JSON line outgrew the window (see the memory note and
the ``STDOUT_DROP`` comment in bench.py).  These tests pin the subset
policy so a future HEADLINE addition cannot silently regress it:

- the UNTRIMMED stdout line, rendered with worst-case timing widths for
  every kept query, must stay under 1950 chars (i.e. the fallback
  trim loop is dead code, not load-bearing);
- every HEADLINE name resolves to a registry entry (or BENCH_ONLY), so
  bench.py cannot KeyError at the first new round;
- STDOUT_DROP only names real HEADLINE members (a typo'd drop entry
  would silently keep the line growing).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def _worst_case_line() -> str:
    # every query at a 4-digit-seconds timing (9999.999) — wider than any
    # real sf0.1 run will ever print
    timings = {name: 9999.999 for name in bench.HEADLINE}
    line = {
        "metric": "suite_wall_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": {
            k: v for k, v in timings.items() if k not in bench.STDOUT_DROP
        },
        "sf": 0.1,
        "reps": 3,
        # r14 noise sentinel rides the stdout line too — worst-case widths
        "sentinel": {"row": bench.SENTINEL_ROW, "ref_sec": 9999.999,
                     "start_sec": 9999.999, "end_sec": 9999.999,
                     "shift": 99.99},
        "n_queries": len(timings),
        "full_file": "BENCH_FULL.json",
    }
    return json.dumps(line, separators=(",", ":"))


def test_stdout_line_under_driver_tail_window():
    out = _worst_case_line()
    assert len(out) <= 1950, (
        f"bench stdout line would be {len(out)} chars at worst-case "
        "timing widths; add the newest near-duplicate family members to "
        "bench.STDOUT_DROP (BENCH_FULL.json keeps every timing)"
    )


def test_headline_names_resolve():
    from data_integration_est_spark import entry_queries as eq

    known = set(eq.queries()) | set(bench.BENCH_ONLY)
    missing = [n for n in bench.HEADLINE if n not in known]
    assert not missing, f"HEADLINE names without a registry entry: {missing}"


def test_stdout_drop_names_are_headline_members():
    stray = sorted(set(bench.STDOUT_DROP) - set(bench.HEADLINE))
    assert not stray, f"STDOUT_DROP entries not in HEADLINE: {stray}"
