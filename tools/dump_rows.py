"""Dump the sorted result rows of registry queries as JSON (A/B tool).

Usage: python tools/dump_rows.py <sf_dir> <out.json> <row> [row ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    rows = sys.argv[3:]
    from data_integration_est_spark.session import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="dump_rows")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    out = {}
    for name in rows:
        res = qs[name](spark, sf_dir).collect()
        out[name] = sorted(repr(tuple(r)) for r in res)
        print(f"# {name}: {len(res)} rows", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(out_path)


if __name__ == "__main__":
    main()
