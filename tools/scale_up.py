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
        sel = ", ".join(
            f'("{c}" + __r.i * {bases[shifts[c]]}) AS "{c}"' if c in shifts
            else f'"{c}"' for c in cols)
        con.sql(f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
                f"(SELECT unnest(range({factor})) AS i) __r) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {bases[t]} -> {n} rows "
              f"(shifted: {', '.join(shifts)})")


if __name__ == "__main__":
    main()
