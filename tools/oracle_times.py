#!/usr/bin/env python3
"""Dev-only oracle-cost profiler: time every oracle_sql.json query in
DuckDB against the given data dir and print the slowest ones.

The driver's correctness gate = graft.Verify (engine side) + a DuckDB
replay of every oracle (compare side). The compare side has its own
failure mode this tool exists to catch early: DuckDB INLINES any CTE
referenced more than once, so an oracle whose rounds/chains re-reference
a heavy CTE re-evaluates it combinatorially — round 14's two extra
graph-beam replays pushed the compare side past 10 minutes and the
driver's CORRECTNESS file came back empty. Fix pattern: hint the
multiply-referenced CTEs `AS MATERIALIZED` (269s -> 0.7s on the beam
replay, value-identical). Run this after adding any multi-CTE oracle;
anything over ~10s deserves a look at its CTE reference counts.

  python3 tools/oracle_times.py /root/testdata/sf0.01 /tmp/verifyN [top_n]

Budget GATE mode (run it in review whenever an oracle was added/changed —
this is what keeps round 14's empty-CORRECTNESS failure unrepeatable):

  python3 tools/oracle_times.py /root/testdata/sf0.01 /tmp/verifyN --budget

exits nonzero when any single oracle exceeds PER_QUERY_BUDGET_S (10 s)
or the whole compare side exceeds TOTAL_BUDGET_S (120 s) at sf0.01.
"""
import json, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The compare-side budget at sf0.01: the driver's gate runs every oracle
# once; a single runaway CTE-inlined replay historically cost 10+ minutes
# and emptied the round's CORRECTNESS file. Bound each query and the sum.
PER_QUERY_BUDGET_S = 10.0
TOTAL_BUDGET_S = 120.0


def main(sf_dir, dump_dir, top_n=20, budget=False):
    oracle = json.load(open(os.path.join(dump_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = []
    for name, sql in oracle.items():
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            err = ""
        except Exception as e:  # no_oracle entries etc. still get a row
            err = f"  [{type(e).__name__}]"
        times.append((time.time() - t0, name, err))
    times.sort(reverse=True)
    total = sum(t for t, _, _ in times)
    print(f"total oracle seconds: {total:.0f} over {len(times)} queries")
    for t, n, err in times[:top_n]:
        print(f"{t:8.1f}  {n}{err}")
    if budget:
        over = [(t, n) for t, n, _ in times if t > PER_QUERY_BUDGET_S]
        ok = True
        for t, n in over:
            print(f"BUDGET FAIL: {n} took {t:.1f}s "
                  f"(> {PER_QUERY_BUDGET_S:.0f}s per oracle) — check its "
                  "multiply-referenced CTEs for missing AS MATERIALIZED")
            ok = False
        if total > TOTAL_BUDGET_S:
            print(f"BUDGET FAIL: compare side took {total:.0f}s total "
                  f"(> {TOTAL_BUDGET_S:.0f}s)")
            ok = False
        if not ok:
            sys.exit(1)
        print(f"oracle budget OK (every oracle <= {PER_QUERY_BUDGET_S:.0f}s, "
              f"total {total:.0f}s <= {TOTAL_BUDGET_S:.0f}s)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--budget"]
    main(args[0], args[1],
         int(args[2]) if len(args) > 2 else 20,
         budget="--budget" in sys.argv)
