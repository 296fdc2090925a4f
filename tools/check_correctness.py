#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py [verify_out_dir] [sf_dir]

Reads each <name>/ parquet dumped by graft.Verify plus oracle_sql.json,
runs each oracle against DuckDB views over the same sf parquet tables,
and compares: row count, column names, and a hash over values with
columns sorted by name. Prints one line per query + a summary.

HARNESS FIDELITY (round-6 fix): both sides go through DuckDB's *pandas*
path exactly like the driver's gate — the Spark dump via
read_parquet(...).df(), the oracle via execute(...).df(). This is
load-bearing in both directions:
  - DuckDB types SUM(BIGINT) as HUGEINT, and pandas renders HUGEINT as
    float64 ("1.439844e+11") while Spark's parquet int64 stays integral
    ("143984402176") — so an un-cast oracle sum FAILS here, like it
    fails the driver. Round 5 shipped exactly that bug
    (q_interval_union) because this replica used fetchall() (HUGEINT ->
    exact Python int) and stayed green where the driver failed.
  - Both sides' DATE columns coerce to datetime64 alike; reading the
    Spark dump with pyarrow instead yields datetime.date ("1998-05-05"
    vs "1998-05-05 00:00:00"), four false reds the driver doesn't have.
"""
import sys, os, json, hashlib, math, threading, time
import duckdb

# Opt-in per-oracle timeout (seconds) for scale sweeps: several oracles
# are DELIBERATELY O(n^2) (exact all-pairs near-dup ground truth —
# "oracle-side O(n^2) is fine at gate scale") and do not terminate at
# sf1. A timeout marks them SKIP (oracle-side cost, not an engine
# failure) instead of hanging the sweep. Unset/0 = no timeout, the
# driver-faithful default.
ORACLE_TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)


def execute_df(con, sql):
    """con.execute(sql).df(), interrupted after ORACLE_TIMEOUT seconds."""
    if not ORACLE_TIMEOUT:
        return con.execute(sql).df()
    done = threading.Event()

    def watchdog():
        if not done.wait(ORACLE_TIMEOUT):
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        return con.execute(sql).df()
    finally:
        done.set()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_value(v):
    # numpy scalar -> python scalar first (repr(np.float64(x)) is
    # "np.float64(x)" under numpy 2.x, which would poison the hash)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def frame_hash(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    h = hashlib.sha256()
    for row in rows:
        for i in order:
            h.update(norm_value(row[i]).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

def df_rows(df):
    """pandas frame -> list of row tuples, preserving column order."""
    return [tuple(row) for row in df.itertuples(index=False, name=None)]

def read_spark_result(con, d):
    """Read the Spark parquet dump through DuckDB's pandas path — the
    SAME dtype coercion the oracle side gets. Reading it with pyarrow
    instead renders DATE columns as datetime.date while the DuckDB side
    renders datetime64, a false mismatch the driver does not have (its
    r5 gate was green on every DATE-emitting query)."""
    files = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet"))
    sel = ", ".join(f"'{f}'" for f in files)
    df = con.execute(f"SELECT * FROM read_parquet([{sel}])").df()
    return list(df.columns), df_rows(df)

def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # live progress (flushed): at scale-sweep SFs a single exact
        # oracle can legitimately run minutes, and without a per-query
        # line the sweep is indistinguishable from a hang
        print(f"[oracle] {name} ...", file=sys.stderr, flush=True)
        t0 = time.monotonic()
        try:
            s_names, s_rows = read_spark_result(con, d)
        except Exception as e:
            results[name] = {"error": f"spark result unreadable: {e}"}
            continue
        if name not in oracle:
            results[name] = {"rows": len(s_rows), "oracle": False}
            continue
        try:
            ddf = execute_df(con, oracle[name])  # pandas path, like the driver
            d_names = list(ddf.columns)
            d_rows = df_rows(ddf)
            print(f"[oracle] {name} done in {time.monotonic() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        except duckdb.InterruptException:
            results[name] = {"skipped": f"oracle timeout (> {ORACLE_TIMEOUT}s)"
                             " — oracle-side cost, not an engine failure",
                             "n_spark": len(s_rows)}
            continue
        except Exception as e:
            results[name] = {"error": f"duckdb failed: {e}"}
            continue
        rows_match = len(s_rows) == len(d_rows)
        schema_match = sorted(s_names) == sorted(d_names)
        hash_match = (schema_match and
                      frame_hash(s_names, s_rows) == frame_hash(d_names, d_rows))
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "n_spark": len(s_rows),
                         "n_duck": len(d_rows)}
        if not hash_match and rows_match and schema_match:
            # dump first diff for debugging
            order_s = sorted(range(len(s_names)), key=lambda i: s_names[i])
            order_d = sorted(range(len(d_names)), key=lambda i: d_names[i])
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                sv = [norm_value(sr[j]) for j in order_s]
                dv = [norm_value(dr[j]) for j in order_d]
                if sv != dv:
                    results[name]["first_diff"] = {
                        "row": i, "cols": sorted(s_names),
                        "spark": sv, "duck": dv}
                    break
    ok = sum(1 for r in results.values()
             if r.get("hash_match") or (r.get("oracle") is False and r.get("rows", 0) > 0))
    skipped = sum(1 for r in results.values() if "skipped" in r)
    for name, r in sorted(results.items()):
        flag = ("OK   " if r.get("hash_match") else
                "ROWS " if r.get("oracle") is False else
                "SKIP " if "skipped" in r else "FAIL ")
        print(flag, name, json.dumps(r)[:300])
    print(f"\n{ok}/{len(results)} green"
          + (f" ({skipped} oracle-timeout skips)" if skipped else ""))
    if skipped:
        # skips count toward a passing exit code, so name them loudly:
        # a "passing" sweep that skipped the very gates under test must
        # be visible at a glance (round-7 advice)
        names = sorted(n for n, r in results.items() if "skipped" in r)
        print("WARNING: SKIPPED gates (oracle timeout, NOT verified):")
        for n in names:
            print(f"  SKIP {n}")
    # Persist for tools/check_docs.py: a driver-round red that this
    # (harness-faithful) replica shows green was fixed since that round.
    with open(os.path.join(out_dir, "replica_results.json"), "w") as f:
        json.dump(results, f, indent=1, default=str)
    sys.exit(0 if ok + skipped == len(results) else 1)

if __name__ == "__main__":
    main()
