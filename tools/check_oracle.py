#!/usr/bin/env python3
"""Dev-only oracle pre-checker (mirrors the driver's t2 gate).

Runs `graft.Verify` output against DuckDB executing oracle_sql.json on
the same parquet tables, compares row-by-row after sorting columns by
name. NOT part of the shipped engine — pure test harness.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        wc, gc = sorted(want.columns), sorted(got.columns)
        if wc != gc:
            print(f"FAIL {name}: columns differ: oracle={wc} spark={gc}")
            n_bad += 1
            continue
        w = want[wc].values.tolist()
        g = got[gc].values.tolist()
        if len(w) != len(g):
            print(f"FAIL {name}: rows differ: oracle={len(w)} spark={len(g)}")
            n_bad += 1
            continue
        bad = None
        for i, (rw, rg) in enumerate(zip(w, g)):
            nw = [norm(x) for x in rw]
            ng = [norm(x) for x in rg]
            if nw != ng:
                bad = (i, nw, ng)
                break
        if bad:
            i, nw, ng = bad
            print(f"FAIL {name}: row {i} differs:\n  oracle={nw}\n  spark ={ng}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(w)} rows")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
