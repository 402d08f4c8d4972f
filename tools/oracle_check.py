#!/usr/bin/env python3
"""Self-check harness approximating the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sf_dir tables,
sorts columns by name and rows by all columns, and compares values.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    import pandas as pd  # noqa
    df = df.reindex(sorted(df.columns), axis=1)
    kinds = {c: df[c].dtype.kind for c in df.columns}
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                # exact values, NO rounding: the driver hashes raw values,
                # so a last-ulp or scale drift must fail here too
                df[c] = df[c].astype(float)
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df, kinds


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            (g, gk), (w, wk) = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} "
                      f"vs {list(w.columns)}")
                n_fail += 1
            elif gk != wk:
                # int64 vs HUGEINT(object)/float, decimal-vs-double etc.
                # serialize differently under the driver's value hash
                print(f"FAIL {name}: dtype kinds {gk} vs {wk}")
                n_fail += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
            elif not g.equals(w):
                diff = (g != w).any(axis=1)
                print(f"FAIL {name}: value mismatch, first diffs:")
                print("  got :", g[diff].head(3).to_dict("records"))
                print("  want:", w[diff].head(3).to_dict("records"))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:  # noqa
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
