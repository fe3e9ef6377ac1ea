"""Capture ``.explain("formatted")`` for named registry rows.

Usage: python tools/explain_row.py <sf_dir> <out_dir> <suffix> <row> [row ...]

Writes ``<out_dir>/<row>_<suffix>.txt`` with the formatted physical plan
of the DataFrame each query returns.  Building the frame may itself run
jobs (driver solves, persists) — that interior work is not visible here;
the file records the final returned plan, which is what the bench's
``collect()`` executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    rows = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    from data_integration_est_spark.session import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="explain_row")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    for name in rows:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
