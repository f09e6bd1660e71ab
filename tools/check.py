#!/usr/bin/env python3
"""Local differential checker mimicking the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet under <outDir>, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the raw tables in <sfDir>, canonicalizes
both sides (columns sorted by name, rows sorted), and compares values.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def hugeint_cols(rel):
    """Oracle columns whose DuckDB type the driver's pandas hasher would
    render as float64 (`123.0` vs the Spark parquet's `123`), silently
    breaking the driver's hash gate while value comparison still passes.
    DuckDB promotes sum(BIGINT) to HUGEINT, so any un-cast sum-derived
    output lands here. Hard-fail locally: cast your sums."""
    return [c for c, t in zip([d[0] for d in rel.description], rel.types)
            if str(t).upper() in ("HUGEINT", "UHUGEINT")]


def canon(con, rel):
    df = rel.fetchall()
    cols = [d[0] for d in rel.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r[i] for i in order) for r in df]
    rows.sort(key=lambda r: tuple((v is None, str(v)) for v in r))
    return [cols[i] for i in order], rows


def vals_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            orel = con.sql(sql)
            huge = hugeint_cols(orel)
            if huge:
                print(f"FAIL {name}: oracle columns {huge} are DuckDB "
                      f"HUGEINT — the driver's pandas hasher renders these "
                      f"as float64 and the hash gate WILL go red even if "
                      f"values match. CAST(... AS BIGINT) your sums.")
                n_fail += 1
                continue
            ocols, orows = canon(con, orel)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = canon(
                con, con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ: oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count: oracle={len(orows)} "
                  f"spark={len(srows)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(orows, srows)):
            if not all(vals_eq(a, b) for a, b in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n"
                  f"  oracle: {bad[1]}\n  spark : {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
