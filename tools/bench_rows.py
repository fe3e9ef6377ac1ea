"""Median wall time for a named set of registry rows at a given sf_dir.

Usage: python tools/bench_rows.py <sf_dir> <reps> <row> [row ...]
Prints one JSON line: {"sf_dir": ..., "reps": N, "rows": {name: sec}}.
The r11 sf1 probe uses this for the 10 most expensive data-dependent
bench rows (the seeded MC studies generate their own populations and do
not read the sf tables, so they are sf-invariant and excluded).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    rows = sys.argv[3:]
    from data_integration_est_spark.session import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="bench_rows")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = ent.queries()

    # r14: annotate the session with the bench noise sentinel so ad-hoc
    # row probes carry the same environment context as the full suite
    import bench as _b

    sent = _b._sentinel_median(spark, qs[_b.SENTINEL_ROW], sf_dir)
    shift = (round(sent / _b.SENTINEL_REF_SEC, 2)
             if sf_dir.rstrip("/").endswith("sf0.1") else None)
    print(f"# sentinel {_b.SENTINEL_ROW}: {sent:.3f}s shift={shift}",
          file=sys.stderr)

    out = {}
    for name in rows:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        out[name] = round(sorted(runs)[len(runs) // 2], 2)
        print(f"# {name}: {out[name]}s of {sorted(runs)}", file=sys.stderr)
        # between-row hygiene (r13): a 40-row sf10 sweep accumulated
        # ~700 driver-pinned broadcasts and died with "Not enough
        # memory to build and broadcast" on an 8g driver — drain the
        # persist registry (pop-by-pop, same as check_oracle.py), drop
        # the cache, and nudge both GCs so the ContextCleaner releases
        # dead broadcasts before the next row builds its own.
        try:
            import gc

            from data_integration_est_spark import util as _u

            with _u._LIVE_PERSISTS_LOCK:
                while _u._LIVE_PERSISTS:
                    try:
                        _u._LIVE_PERSISTS.pop()[1].unpersist()
                    except Exception:  # noqa: BLE001
                        pass
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "rows": out}))


if __name__ == "__main__":
    main()
