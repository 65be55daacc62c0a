#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate:
for each query dir under OUTDIR, run the matching oracle SQL from
oracle_sql.json in DuckDB over the sfDir parquet tables, then compare
(sorted columns, sorted rows) against the Spark parquet output.

The comparison is DTYPE-SENSITIVE (the round-11 lesson): the driver
hashes serialized values, so a DuckDB HUGEINT (uncast sum() over
integers) or DECIMAL (bare decimal-literal arithmetic) column fails
the driver's hash even when every value equals Spark's BIGINT/DOUBLE.
A str()-normalizing compare cannot see that — this gate compares the
Arrow schema of both sides and fails on any type mismatch that the
driver's hash would see.

Usage: check_oracle.py SFDIR OUTDIR [query ...]
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> str:
    """Canonical dtype label for cross-engine compare.

    Equivalences that the driver's hash provably tolerates (calibrated
    against CORRECTNESS_r11: every class below appears in a
    driver-GREEN entry, while decimal128 — DuckDB HUGEINT / DECIMAL —
    appears in exactly the 15 driver-RED entries):
      - signed integer width (d13/g32/g34/q108/q118/q133/q134/q135/
        q141 are int32-vs-BIGINT and all driver-green);
      - timestamp timezone annotation (Spark parquet stamps UTC,
        DuckDB is tz-naive) at equal unit;
      - string vs large_string (a reader-side chunking choice).
    Everything else — notably int64 vs decimal128 and float64 vs
    decimal — is a mismatch.
    """
    if (pa.types.is_integer(t)):
        return "int"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


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


def schema_map(tbl: pa.Table):
    return {f.name: canon_type(f.type) for f in tbl.schema}


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    rows_only, failed = [], []
    for qdir in sorted(Path(outdir).iterdir()):
        if not qdir.is_dir() or (only and qdir.name not in only):
            continue
        name = qdir.name
        spark_tbl = pq.read_table(qdir)
        scols = list(spark_tbl.column_names)
        srows = [tuple(d.values()) for d in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"  ROWS-ONLY {name}: {len(srows)} rows")
            rows_only.append(name)
            continue
        try:
            otbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"✗ ORACLE-ERR {name}: {e}")
            n_fail += 1
            failed.append(name)
            continue
        ocols = list(otbl.column_names)
        orows = [tuple(d.values()) for d in otbl.to_pylist()]
        if sorted(scols) != sorted(ocols):
            print(f"✗ SCHEMA {name}: spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            failed.append(name)
            continue
        stypes, otypes = schema_map(spark_tbl), schema_map(otbl)
        bad = {c: (stypes[c], otypes[c]) for c in scols
               if stypes[c] != otypes[c]}
        if bad:
            print(f"✗ DTYPE {name}: spark vs oracle {bad}")
            n_fail += 1
            failed.append(name)
            continue
        sk, ok = table_key(srows, scols), table_key(orows, ocols)
        if sk == ok:
            print(f"✓ {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            failed.append(name)
            diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
            print(f"✗ VALUES {name}: spark {len(sk)} rows vs oracle {len(ok)}; "
                  f"first diffs: {diff}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    # machine-readable summary for tools/closing_block.py — tallies are
    # GENERATED from this artifact, never typed by hand
    if not only:
        (Path(outdir) / "gate_summary.json").write_text(json.dumps({
            "total": n_pass + n_fail + len(rows_only),
            "hash_green": n_pass, "fail": n_fail,
            "rows_only": sorted(rows_only), "failed": sorted(failed)}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
