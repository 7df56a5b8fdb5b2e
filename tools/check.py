#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each SparkEntry query result parquet from <verifyOutDir>/<name>/,
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
(with views named after the testdata tables), sorts columns by name and
rows by all columns, and compares cell-by-cell.
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    # Decimal -> float-ish string; float -> repr; rest -> str
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", str(v))
    return v


def fetch_sorted(con, sql):
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Type lint FIRST (tools/lint_oracle.py): a HUGEINT output column or
    # a hash-class drift vs the dumped parquet is a guaranteed compare
    # failure, so refuse to even fetch values while any exists — this is
    # the guard for the sum()-widening class that cost rounds 10 and 13.
    import lint_oracle
    lint_viol = lint_oracle.lint(
        sf_dir, {k: v for k, v in oracle.items() if not only or k in only},
        out_dir)
    if lint_viol:
        for v in lint_viol:
            print(f"LINT {v}")
        print(f"== oracle lint: {len(lint_viol)} violation(s) — fix before comparing")
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            got_cols, got = fetch_sorted(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            want_cols, want = fetch_sorted(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = [(g, w) for g, w in zip(got, want) if g != w]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got)} mismatched rows; first: got={bad[0][0]} want={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
