#!/usr/bin/env python3
"""Deterministic scale-up of a driver testdata dir by integer replication
with join-key offsets — the standard referential-integrity-preserving
scale-out: replica i shifts every key column of table T by i * N_T
(source row count / key-domain size), so each replica is a disjoint,
internally-consistent copy and all FK joins land inside their replica.

Fixed dimensions (region, nation) stay single-copy, exactly like TPC-H
scaling; nation FKs in customer/supplier are left unshifted.

Value columns (prices, dates, texts, embeddings) are copied verbatim:
per-row computations then do exactly factor× work, joins/aggregations see
factor× keys, and the time span stays constant (so event density scales,
the realistic direction). This synthesized data is used ONLY for local
scale validation (SCALE.md ratios) — every driver gate still runs on the
driver's own sf dirs.

Usage: python3 tools/scale_up.py SRC_DIR DST_DIR FACTOR
"""
import os
import sys

import duckdb

# table -> {key column -> domain-size expression (source rows or key span)}
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "__users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ["region", "nation"]

# Key-DERIVED value columns, re-derived from the shifted key so replicas
# don't carry verbatim copies of values that are unique per key in the
# real data (10 identical c_names per customer would make name-blocked
# operators look quadratic when real scaled data keeps names unique).
# expression template receives the already-shifted key expression.
DERIVED = {
    ("customer", "c_name"): "printf('Customer#%09d', {k})",
    ("supplier", "s_name"): "printf('Supplier#%09d', {k})",
}
DERIVED_KEY = {"c_name": "c_custkey", "s_name": "s_suppkey"}


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    bases = {t: con.sql(f"SELECT COUNT(*) FROM '{src}/{t}.parquet'")
             .fetchone()[0] for t in SHIFTS}
    # user_id is a non-PK key with its own (dense) domain
    bases["__users"] = con.sql(
        f"SELECT MAX(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
    for t in COPY_AS_IS:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied as-is")
    for t, shifts in SHIFTS.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        def col_expr(c):
            if c in shifts:
                return f'("{c}" + __r.i * {bases[shifts[c]]}) AS "{c}"'
            if (t, c) in DERIVED:
                k = DERIVED_KEY[c]
                shifted = f'("{k}" + __r.i * {bases[shifts[k]]})'
                return DERIVED[(t, c)].format(k=shifted) + f' AS "{c}"'
            return f'"{c}"'
        sel = ", ".join(col_expr(c) for c in cols)
        # bounded row groups (~32 per table): parquet splits at row-group
        # boundaries, so DuckDB's default (everything in one group for
        # small tables) would funnel the whole table through ONE Spark
        # task and poison every per-row timing with fake serialization —
        # exactly the layout bug a real ingest pipeline must also avoid
        rg = max(4096, (bases[t] * factor) // 32)
        con.sql(f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
                f"(SELECT unnest(range({factor})) AS i) __r) "
                f"TO '{dst}/{t}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {bases[t]} -> {n} rows "
              f"(shifted: {', '.join(shifts)})")


if __name__ == "__main__":
    main()
