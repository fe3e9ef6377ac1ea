"""Local replica of the driver's dual-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted-column
schema, and values (sorted rows, 6-dp rounding).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, int):
        return float(v)
    return v


def compare(name, spark_df, con, sql):
    srows = spark_df.collect()
    scols = sorted(spark_df.columns)
    t = con.execute(sql)
    ocols_raw = [d[0] for d in t.description]
    orows = t.fetchall()
    ocols = sorted(ocols_raw)
    issues = []
    if scols != ocols:
        issues.append(f"schema mismatch: spark={scols} oracle={ocols}")
    if len(srows) != len(orows):
        issues.append(f"rowcount mismatch: spark={len(srows)} oracle={len(orows)}")
    if not issues:
        s_sorted = sorted(
            [tuple(norm(r[c]) for c in scols) for r in srows],
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )
        o_idx = {c: i for i, c in enumerate(ocols_raw)}
        o_sorted = sorted(
            [tuple(norm(r[o_idx[c]]) for c in ocols) for r in orows],
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )
        for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
            if a != b:
                issues.append(f"value mismatch at sorted row {i}: spark={a} oracle={b}")
                break
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from data_integration_est_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                issues = compare(name, df, con, oracles[name])
            else:
                n = df.count()
                issues = [] if n >= 0 else ["negative count?"]
        except Exception as e:  # noqa: BLE001
            issues = [f"EXCEPTION {type(e).__name__}: {e}"]
        dt = time.time() - t0
        # hygiene between independent rows: long sessions otherwise
        # accumulate cache/broadcast state until late rows grind (r12:
        # two 10-20 s rows hung >25 min as row ~18 and ~45 of sf1 runs,
        # both instant in fresh sessions); rows share no plans, so
        # clearing costs nothing but the next row's cold cache
        # drain by POPPING each handle so a clearCache() failure cannot
        # orphan tracked blocks (ADVICE r12: clearing the registry first
        # discarded the handles before the cache was actually dropped)
        try:
            from data_integration_est_spark import util as _u

            with _u._LIVE_PERSISTS_LOCK:
                while _u._LIVE_PERSISTS:
                    try:
                        _u._LIVE_PERSISTS.pop()[1].unpersist()
                    except Exception:  # noqa: BLE001
                        pass
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s)")
            for i in issues:
                print(f"     {i[:400]}")
        else:
            n_pass += 1
            kind = "oracle" if name in oracles else "rows-only"
            print(f"ok   {name} ({kind}, {dt:.1f}s)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
