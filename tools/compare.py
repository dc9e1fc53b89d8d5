#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same sf dir and
compare (columns sorted by name, rows sorted, exact values).

Usage: compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                fail += 1
                continue
            # exact compare; report first mismatching cell
            neq = (g.astype(str) != w.astype(str))
            if neq.any().any():
                col = neq.any()[neq.any()].index[0]
                idx = neq[col][neq[col]].index[0]
                print(f"FAIL {name}: first diff col={col} row={idx}: "
                      f"spark={g[col][idx]!r} duckdb={w[col][idx]!r} "
                      f"(dtypes {g[col].dtype}/{w[col].dtype})")
                fail += 1
                continue
            print(f"ok   {name} ({len(g)} rows)")
            ok += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
