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
"""
import json, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, dump_dir, top_n=20):
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


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 20)
