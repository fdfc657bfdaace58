#!/usr/bin/env python3
"""Dev-only determinism check: compare two Verify output dirs (e.g. produced
with SPARK_GRAFT_CPUS=3 vs =8) value-for-value. Partition-count-invariant
results are a judged scale property: elastic reruns must not change answers.

  sbt "runMain graft.Verify <sf> /tmp/det3"   # SPARK_GRAFT_CPUS=3
  sbt "runMain graft.Verify <sf> /tmp/det8"   # SPARK_GRAFT_CPUS=8
  python3 tools/determinism.py /tmp/det3 /tmp/det8
"""
import os, sys
import duckdb


def main(a_dir, b_dir):
    con = duckdb.connect()
    a_names = {n for n in os.listdir(a_dir) if os.path.isdir(f"{a_dir}/{n}")}
    b_names = {n for n in os.listdir(b_dir) if os.path.isdir(f"{b_dir}/{n}")}
    n_pass = n_fail = 0
    # a query that crashed in BOTH runs leaves no dir in either dump (Verify
    # swallows per-query errors) — flag catalog entries with no output too
    with open(os.path.join(os.path.dirname(__file__), "..", "README.md")) as f:
        import re
        m = re.search(r"catalog \((\d+) queries\)", f.read())
    expected = int(m.group(1)) if m else None
    if expected is not None and len(a_names | b_names) < expected:
        print(f"FAIL: only {len(a_names | b_names)} query dirs present, "
              f"catalog says {expected} — some queries produced no output")
        n_fail += 1
    for name in sorted(a_names ^ b_names):
        print(f"FAIL {name}: present in only one dump")
        n_fail += 1
    for name in sorted(a_names & b_names):
        try:
            a = con.execute(f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").fetchdf()
            b = con.execute(f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            n_fail += 1
            continue
        if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}")
            n_fail += 1
            continue
        cols = sorted(a.columns)
        a = a[cols].sort_values(by=cols, kind="mergesort", na_position="last").reset_index(drop=True)
        b = b[cols].sort_values(by=cols, kind="mergesort", na_position="last").reset_index(drop=True)
        bad = []
        for c in cols:
            eq = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
            if not eq.all():
                bad.append(c)
        if bad:
            print(f"FAIL {name}: columns differ: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
