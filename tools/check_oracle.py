#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate:
for each query dir under OUTDIR, run the matching oracle SQL from
oracle_sql.json in DuckDB over the sfDir parquet tables, then compare
(sorted columns, sorted rows) against the Spark parquet output.

Usage: check_oracle.py SFDIR OUTDIR [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style tolerant float compare: round to 6 significant-ish
        return f"{v:.6g}"
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for qdir in sorted(Path(outdir).iterdir()):
        if not qdir.is_dir() or (only and qdir.name not in only):
            continue
        name = qdir.name
        spark_tbl = pq.read_table(qdir)
        scols = list(spark_tbl.column_names)
        srows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"  ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"✗ ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"✗ SCHEMA {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        sk, ok = table_key(srows, scols), table_key(orows, ocols)
        if sk == ok:
            print(f"✓ {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"✗ VALUES {name}: spark {len(sk)} rows vs oracle {len(ok)}; "
                  f"first diffs: {diff}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
