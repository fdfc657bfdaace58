#!/usr/bin/env python3
"""Dev-only self-check harness (mirrors the driver's DuckDB oracle gate).

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  python3 tools/check.py <sfDir> <outDir>

For each query: load Spark's parquet output and DuckDB's oracle result,
sort columns by name, sort rows, compare values exactly (tiny float
tolerance report included for diagnosis). NOT part of the shipped library.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only queries (no oracle SQL): confirm output exists and is non-empty
    import os
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if name in oracle or not os.path.isdir(qdir):
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows" + ("" if n > 0 else "  (EMPTY!)"))
        except Exception as e:
            print(f"ROWS-ONLY {name}: unreadable: {e}")
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        exp, got = norm(exp), norm(got)
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            try:
                import pandas as pd
                eq = e.eq(g) | (e.isna() & g.isna())
                if hasattr(e, "dt") or e.dtype == object:
                    pass
                if not eq.all():
                    # float diagnosis
                    try:
                        diff = (e.astype(float) - g.astype(float)).abs().max()
                        bad.append((c, f"maxdiff={diff}"))
                    except Exception:
                        idx = (~eq).idxmax()
                        bad.append((c, f"first mismatch row {idx}: exp={e[idx]!r} got={g[idx]!r}"))
            except Exception as ex:
                bad.append((c, f"compare error {ex}"))
        if bad:
            print(f"FAIL {name}: {bad[:4]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
