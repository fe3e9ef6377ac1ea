"""Per-driver-action wall-time profile for a registry row (guide §1).

Usage: python tools/profile_row.py <sf_dir> <row> [reps]

Monkeypatches the DataFrame/RDD action entry points (collect, count,
first, toPandas) to log each action's wall time plus the library
call site (file:line) that issued it, then runs the row.  Output goes
to stderr; one JSON summary line ({row, total, n_actions, actions})
goes to stdout.  Measurement-only tool — never imported by the engine.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACTIONS: list[dict] = []
DEPTH = [0]


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "data_integration_est_spark" in fn or fn.endswith("entry_queries.py") \
                or fn.endswith("__spark_entry__.py") or fn.endswith("bench.py"):
            return f"{os.path.basename(fn)}:{fr.lineno} {fr.name}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        if DEPTH[0]:  # nested action (e.g. count() calling collect())
            return orig(self, *a, **kw)
        DEPTH[0] += 1
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            DEPTH[0] -= 1
            dt = time.perf_counter() - t0
            rec = {"op": f"{cls.__name__}.{name}", "sec": round(dt, 3),
                   "site": _site()}
            ACTIONS.append(rec)
            print(f"#   {dt:7.3f}s {rec['op']:20s} {rec['site']}",
                  file=sys.stderr)

    setattr(cls, name, timed)


def main() -> None:
    sf_dir, row = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from pyspark.rdd import RDD

    try:  # Spark 4: the concrete class lives under sql.classic
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    for n in ("collect", "count", "first", "toPandas"):
        _wrap(DataFrame, n)
    _wrap(RDD, "collect")
    _wrap(RDD, "count")

    from data_integration_est_spark.session import get_spark

    import bench as _b
    import __spark_entry__ as ent

    spark = get_spark(app_name="profile_row")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = ent.queries()
    fn = _b.BENCH_ONLY.get(row) or qs[row]

    for rep in range(reps):
        ACTIONS.clear()
        print(f"# --- rep {rep} ---", file=sys.stderr)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        total = time.perf_counter() - t0
        acc = sum(a["sec"] for a in ACTIONS)
        print(f"# rep {rep}: total {total:.3f}s, {len(ACTIONS)} actions "
              f"account for {acc:.3f}s (gap {total - acc:.3f}s = plan/driver)",
              file=sys.stderr)
        # drain like bench.py so reps are comparable
        from data_integration_est_spark import util as _u
        with _u._LIVE_PERSISTS_LOCK:
            while _u._LIVE_PERSISTS:
                try:
                    _u._LIVE_PERSISTS.pop()[1].unpersist()
                except Exception:  # noqa: BLE001
                    pass
        spark.catalog.clearCache()
    print(json.dumps({"row": row, "total": round(total, 3),
                      "n_actions": len(ACTIONS), "actions": ACTIONS}))


if __name__ == "__main__":
    main()
