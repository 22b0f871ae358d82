#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet dumped by graft.Verify plus
<out>/oracle_sql.json, runs each oracle in DuckDB against views over the
sf_dir parquet tables, and compares: columns sorted by name, rows sorted
by all columns, doubles rounded to 6 decimals.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr), [cols[i] for i in order]


def family(t):
    """Coarse type family for hash-hazard detection."""
    t = str(t).lower()
    if "hugeint" in t or "int128" in t:
        return "HAZARD:hugeint"
    if "decimal" in t:
        return "HAZARD:decimal"
    for k, fam in (("int", "int"), ("double", "float"), ("float", "float"),
                   ("timestamp", "ts"), ("date", "date"), ("bool", "bool")):
        if k in t:
            return fam
    return "other"


def type_hazards(got, exp):
    """The driver's hasher is type/representation-sensitive where this
    replica's Python == is not: DuckDB window/plain SUM(BIGINT) yields
    HUGEINT, and decimal columns hash by repr (r2: pack_shards, q5).
    Flag those plus int-vs-float family splits so they fail LOCALLY."""
    issues = []
    gt = dict(zip(got.columns, [family(t) for t in got.types]))
    et = dict(zip(exp.columns, [family(t) for t in exp.types]))
    for c in set(gt) & set(et):
        g, e = gt[c], et[c]
        for side, f in (("spark", g), ("oracle", e)):
            if f.startswith("HAZARD"):
                issues.append(f"{c}: {side} {f}")
        if not g.startswith("HAZARD") and not e.startswith("HAZARD") \
                and g != e and "other" not in (g, e):
            issues.append(f"{c}: spark={g} vs oracle={e}")
    return issues


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            exp = con.sql(sql)
            hazards = type_hazards(got, exp)
            got_rows, got_cols = canon(got.fetchall(), got.columns)
            exp_rows, exp_cols = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if hazards:
            print(f"FAIL {name}: type hazards {hazards}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
            print(f"FAIL {name}: rows {len(got_rows)} vs {len(exp_rows)}; "
                  f"first diffs: {diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
