#!/usr/bin/env python3
"""Dev-only oracle pre-checker (mirrors the driver's t2 gate).

Runs `graft.Verify` output against DuckDB executing oracle_sql.json on
the same parquet tables and compares:
  - arrow TYPES: a DuckDB DECIMAL against a Spark BIGINT/DOUBLE is a
    FAIL — the driver hashes typed values, so Decimal(5) != int64(5)
    even when numerically equal (this was every round-1 hash-fail).
    Wrap oracle aggregates in CAST(... AS BIGINT/DOUBLE).
  - VALUES at full precision (repr, not 10 sig digits) after sorting
    columns by name, mirroring the driver's hash.
NOT part of the shipped engine — pure test harness.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import math
import sys
import threading

import duckdb
import pyarrow.parquet as pq

import os  # single top-level import (used for env, path tests, dir listing)
ORACLE_TIMEOUT_S = int(os.environ.get("ORACLE_TIMEOUT_S", "60"))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    # The driver's typed hash distinguishes SQL NULL from NaN; keep
    # distinct sentinels so a NULL-vs-NaN mismatch surfaces here too.
    # Caveat: pandas renders a NULL in a float64 column as NaN, so a
    # genuine-NaN-vs-NULL confusion is only detectable in non-float
    # columns — which is where it bites the driver as well.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # pandas renders date32 as midnight Timestamp via arrow but as
    # datetime.date via the parquet reader — same arrow type (already
    # checked), so normalize the rendering
    s = str(v)
    if s.endswith(" 00:00:00"):
        return s[:-9]
    return s


def type_diffs(out_dir, name, duck_arrow):
    """Hash-breaking arrow type differences (decimal / date-vs-ts)."""
    spark_types = {}
    for f in glob.glob(f"{out_dir}/{name}/*.parquet"):
        for fld in pq.read_schema(f):
            spark_types[fld.name] = str(fld.type)
    bad = []
    for fld in duck_arrow.schema:
        st = spark_types.get(fld.name)
        dt = str(fld.type)
        if st is None:
            continue
        if ("decimal" in dt) != ("decimal" in st):
            bad.append(f"{fld.name}: spark={st} oracle={dt}")
        elif dt.startswith("date") != st.startswith("date"):
            bad.append(f"{fld.name}: spark={st} oracle={dt}")
    return bad


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single .parquet FILES; ScaleUp corpora are
        # Spark-written DIRECTORIES of part files — accept both so the
        # gate also runs at rehearsal SFs (/tmp/sf1, /tmp/sf10).
        # Flat directories only: a hive-partitioned subdir layout would
        # need a recursive glob — no current corpus writes one
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_bad = 0
    # A dumped query with no oracle SQL entry is INVISIBLE to this gate
    # (and lands as err:"no_oracle" in the driver artifact). Surface the
    # set loudly: as of round 13 every registered query has an oracle,
    # so any name here is a regression.
    dumped = {
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d))
    }
    unoracled = sorted(dumped - set(oracles))
    if unoracled and not only:
        print(f"WARN {len(unoracled)} dumped queries have NO oracle entry "
              f"(driver will record err:no_oracle): {', '.join(unoracled)}")
        n_bad += len(unoracled)
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        # A hung oracle (e.g. a recursive CTE re-evaluating an inlined
        # window CTE each step) must FAIL loudly, not stall the gate:
        # that failure mode zeroed an entire driver correctness round.
        timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
        timer.start()
        try:
            rel = con.sql(sql)
            arrow = rel.arrow()
            want = arrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle error (>{ORACLE_TIMEOUT_S}s = timeout): {e}")
            n_bad += 1
            continue
        finally:
            timer.cancel()
        try:
            # same arrow->pandas path as the oracle side: .df() renders
            # a NULL bool as float NaN where arrow keeps None, which
            # would fake a NULL-vs-NaN diff
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow().to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        tbad = type_diffs(out_dir, name, arrow)
        if tbad:
            print(f"FAIL {name}: hash-breaking oracle types: {'; '.join(tbad)}")
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
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
