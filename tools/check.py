#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped Scala library does not depend on this).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, loads <outDir>/<name> parquet and runs the oracle SQL from
oracle_sql.json in DuckDB against views named after the test tables. Compares
schema (column names, sorted), row count, and exact values (columns sorted by
name, rows in produced order). Reports per-query PASS/FAIL + first diff.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, math, re, sys

import duckdb

# Canonical type families. The driver serializes both sides through pandas
# before hashing, so types that pandas maps to different dtypes MUST agree
# at the SQL level even when Python `==` would call the values equal. Two
# rounds were lost to this class (r1 q62 DOUBLE-vs-BIGINT, r2 q94b
# HUGEINT→float64); this check kills it. HUGEINT deliberately canonicalizes
# to itself: pandas degrades it to float64, so an oracle must always CAST
# it away explicitly.
def canon_type(t):
    s = t.upper()
    s = s.replace("TIMESTAMP WITH TIME ZONE", "TIMESTAMP")
    s = re.sub(r"TIMESTAMP_\w+", "TIMESTAMP", s)
    s = re.sub(r"\b(UBIGINT|UINTEGER|USMALLINT|UTINYINT"
               r"|BIGINT|INTEGER|SMALLINT|TINYINT)\b", "INT", s)
    s = re.sub(r"\b(DOUBLE|FLOAT|REAL)\b", "FLOAT", s)
    s = re.sub(r"DECIMAL\(\d+,\s*(\d+)\)", r"DECIMAL(\1)", s)
    return s

def type_mismatch(con, sql, out_parquet):
    """Returns a list of 'col: spark_type != oracle_type' strings (empty =
    consistent). Compares DuckDB DESCRIBE of the dumped parquet vs the
    oracle SQL, canonicalized per family."""
    def describe(q):
        return {r[0]: canon_type(r[1]) for r in con.sql(q).fetchall()}
    got = describe(f"DESCRIBE SELECT * FROM '{out_parquet}'")
    exp = describe(f"DESCRIBE {sql}")
    return [f"{c}: spark {got[c]} != oracle {exp[c]}"
            for c in sorted(set(got) & set(exp)) if got[c] != exp[c]]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            bad_types = type_mismatch(con, sql, f"{out_dir}/{name}/*.parquet")
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: dtype divergence: {'; '.join(bad_types)}")
            n_fail += 1
        elif gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
        elif len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
        elif grows != erows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, erows))
                       if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  spark:  {grows[bad]}")
            print(f"  duckdb: {erows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
