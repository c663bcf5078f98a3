#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Registers every parquet table of <sfDir> as a DuckDB view, runs each SQL in
<verifyOutDir>/oracle_sql.json, loads the corresponding Spark parquet dump,
sorts columns by name and rows by all values, and compares cell-by-cell.
Dev tool only — the real gate is driver-side.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in idx]


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            want = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        want_cols = [d[0] for d in con.description]
        g, gc = canon(got, got_cols)
        w, wc = canon(want, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        bad = [
            (i, rg, rw) for i, (rg, rw) in enumerate(zip(g, w))
            if not all(cells_equal(x, y) for x, y in zip(rg, rw))
        ]
        if bad:
            i, rg, rw = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:\n  spark={rg}\n  duck ={rw}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
