"""Materialize an sf1-scale dataset as a 10x key-offset union of the
driver's sf0.1 parquet (r11, r10 verdict #3).

Every copy offsets its key AND foreign-key columns by
``copy * (max_key + 1)`` with consistent multipliers on both sides of
each relationship, so referential integrity holds within each copy,
every id column stays UNIQUE (the gate queries' deterministic
tie-breaks depend on that), and the value distributions are exactly
sf0.1's.  The result is a fair 10x-volume input for running the SAME
dual-oracle gate (Spark and DuckDB read the identical files).

Usage:  python tools/make_sf1.py [src_dir] [dst_dir]
        (defaults: /root/testdata/sf0.1 -> /root/repo/_sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

MULT = 10

# table -> columns that must stay unique / referentially consistent
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# the offset base for a foreign key must be the REFERENCED table's key
# base, so both sides shift by the same amount per copy
BASE_OF = {
    "n_regionkey": ("region", "r_regionkey"),
    "c_nationkey": ("nation", "n_nationkey"),
    "s_nationkey": ("nation", "n_nationkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    bases: dict[tuple[str, str], int] = {}
    for t, cols in KEYS.items():
        for c in cols:
            if c not in BASE_OF:
                mx = con.execute(
                    f"SELECT max({c}) FROM '{src}/{t}.parquet'"
                ).fetchone()[0]
                bases[(t, c)] = int(mx) + 1

    for t, cols in KEYS.items():
        sch = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in sch:
            if c in cols:
                ref = BASE_OF.get(c)
                base = bases[ref] if ref else bases[(t, c)]
                sel.append(f"{c} + cp.i * {base} AS {c}")
            else:
                sel.append(c)
        con.execute(f"""
            COPY (
              SELECT {", ".join(sel)}
              FROM '{src}/{t}.parquet', range({MULT}) cp(i)
            ) TO '{dst}/{t}.parquet' (FORMAT PARQUET)
        """)
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}/{t}.parquet")


if __name__ == "__main__":
    main()
