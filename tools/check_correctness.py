#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py [verify_out_dir] [sf_dir]

Reads each <name>/ parquet dumped by graft.Verify plus oracle_sql.json,
runs each oracle against DuckDB views over the same sf parquet tables,
and compares: row count, column names, and a hash over values with
columns sorted by name. Prints one line per query + a summary.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
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

def read_spark_result(d):
    files = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    t = pa.concat_tables([pq.read_table(f) for f in files])
    names = t.column_names
    cols = [t.column(n).to_pylist() for n in names]
    rows = list(zip(*cols)) if cols and t.num_rows else []
    return names, rows

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
        try:
            s_names, s_rows = read_spark_result(d)
        except Exception as e:
            results[name] = {"error": f"spark result unreadable: {e}"}
            continue
        if name not in oracle:
            results[name] = {"rows": len(s_rows), "oracle": False}
            continue
        try:
            cur = con.execute(oracle[name])
            d_names = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
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
    for name, r in sorted(results.items()):
        flag = ("OK   " if r.get("hash_match") else
                "ROWS " if r.get("oracle") is False else "FAIL ")
        print(flag, name, json.dumps(r)[:300])
    print(f"\n{ok}/{len(results)} green")

if __name__ == "__main__":
    main()
