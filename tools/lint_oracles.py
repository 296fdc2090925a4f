#!/usr/bin/env python3
"""Oracle-type lint: fail any oracle whose DuckDB output schema contains a
type the driver's pandas-based harness renders differently from Spark's
parquet dump.

Background: DuckDB types SUM(BIGINT) as HUGEINT (int128). pandas has no
int128, so cursor.df() renders it float64 ("1.439844e+11") while the Spark
side stays int64 ("143984402176") — the hash gate then fails even when the
values are identical. This exact bug shipped twice (q_q12 round 3,
q_interval_union round 5). Every oracle must CAST such sums to BIGINT (or
DOUBLE, matching the Spark column type).

Flagged types:
  - HUGEINT / UHUGEINT         -> always wrong (pandas -> float64/object)
  - DECIMAL(p, s) with p > 18  -> int128-backed; pandas -> object/float
    depending on duckdb version, never hash-stable against Spark

Uses `DESCRIBE <sql>` so nothing is executed — binding only; runs in
milliseconds per oracle and is independent of scale factor.

Usage: python3 tools/lint_oracles.py <oracle_sql.json> [sf_dir]
Exit 0 = clean, 1 = offenders found (each printed with column + type).
"""
import sys, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DECIMAL_RE = re.compile(r"DECIMAL\((\d+),\s*(\d+)\)")

def flagged(coltype):
    t = coltype.upper()
    if "HUGEINT" in t:          # HUGEINT and UHUGEINT
        return "int128 renders as float64/object in the driver's pandas path"
    m = DECIMAL_RE.search(t)
    if m and int(m.group(1)) > 18:
        return ("DECIMAL precision > 18 is int128-backed; not hash-stable "
                "against a Spark parquet dump")
    # nested types can hide a HUGEINT, e.g. STRUCT(s HUGEINT), LIST(HUGEINT)
    return None

def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    bad = []
    for name in sorted(oracle):
        try:
            desc = con.execute("DESCRIBE " + oracle[name]).fetchall()
        except Exception as e:
            bad.append((name, "<bind>", f"oracle does not bind: {e}"))
            continue
        for col, coltype, *_ in desc:
            why = flagged(coltype)
            if why:
                bad.append((name, f"{col}: {coltype}", why))
    if bad:
        for name, col, why in bad:
            print(f"FAIL {name} [{col}] — {why}")
        print(f"\n{len(bad)} offender(s) in {len(oracle)} oracles")
        return 1
    print(f"OK — {len(oracle)} oracles, no pandas-unstable output types")
    return 0

if __name__ == "__main__":
    sys.exit(main())
