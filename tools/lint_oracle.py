#!/usr/bin/env python3
"""Oracle-SQL type lint — the guard for the bug class that cost rounds
10 and 13 (DuckDB widening an aggregate to a type Spark cannot emit, so
the driver's value-hash compare reddens even though the numbers agree).

The r13 instance: DuckDB `sum(BIGINT)` returns HUGEINT (int128). Spark
has no 128-bit integer type, so a HUGEINT column in an oracle's OUTPUT
schema can never hash-match the Spark parquet — every such column is a
guaranteed future FAIL, regardless of values. A textual "is every sum(
wrapped in CAST" grep is hopeless here (376 hits in the current corpus,
nearly all harmless intermediates inside CTEs whose HUGEINT never
reaches the output), so this lint checks what actually matters: the
TYPED OUTPUT SCHEMA of each oracle query, obtained from DuckDB's binder
without executing anything.

Checks, in order of severity:
  1. HUGEINT/UHUGEINT output column            -> VIOLATION (hard fail)
  2. result parquet present (optional arg 3):
       sorted column names differ              -> VIOLATION (alias drift)
       numeric category differs (int/float/
       decimal) between oracle and Spark dump  -> VIOLATION (hash class)

Usage:
    python3 tools/lint_oracle.py <sfDir> <oracle_sql.json> [verifyOutDir]

Wired into tools/check.py: the local correctness gate refuses to even
compare values while the lint reports violations, so an uncast
aggregate can never reach a driver round again. Run it standalone after
editing any oracleSql map:
    sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/vout <some_q>"
    python3 tools/lint_oracle.py /root/testdata/sf0.001 /tmp/vout/oracle_sql.json
(Verify dumps the FULL oracle map regardless of the query subset, so a
single cheap query suffices to refresh the json.)
"""
import sys, json, glob, re

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Spark-unrepresentable types: any of these in an oracle output schema
# is a guaranteed hash mismatch (there is nothing Spark could emit that
# round-trips through the driver's compare as an int128).
FORBIDDEN = {"HUGEINT", "UHUGEINT"}


def category(t):
    """Collapse a type name to the hash-compare equivalence class used
    by the driver (ints hash as ints, floats as repr, decimals as
    normalized strings — cross-class always mismatches)."""
    t = str(t).upper()
    if re.match(r"DECIMAL", t):
        return "decimal"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    return t  # strings, dates, lists, ... compare by name


def lint(sf_dir, oracle, out_dir=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    violations = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)  # binder only — nothing executes
            cols, types = rel.columns, [str(t).upper() for t in rel.types]
        except Exception as e:
            violations.append(f"{name}: oracle does not bind: {e}")
            continue
        for c, t in zip(cols, types):
            if t.split("(")[0] in FORBIDDEN:
                violations.append(
                    f"{name}: output column `{c}` is {t} — Spark cannot "
                    f"emit int128; wrap the aggregate in an explicit CAST")
        if len(set(cols)) != len(cols):
            violations.append(f"{name}: duplicate output column names {cols}")
        if out_dir:
            res = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if res:
                got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
                gcols = dict(zip(got.columns,
                                 [str(t).upper() for t in got.types]))
                ocols = dict(zip(cols, types))
                if sorted(gcols) != sorted(ocols):
                    violations.append(
                        f"{name}: column names differ — spark="
                        f"{sorted(gcols)} oracle={sorted(ocols)}")
                else:
                    for c in gcols:
                        if category(gcols[c]) != category(ocols[c]):
                            violations.append(
                                f"{name}: column `{c}` hash class differs "
                                f"— spark {gcols[c]} vs oracle {ocols[c]}")
                        elif (category(gcols[c]) == "decimal"
                              and gcols[c] != ocols[c]):
                            # r16's q_j_bucketed_agg: Spark sum(DECIMAL(
                            # 18,2)) widens to (28,2), DuckDB to (38,2) —
                            # values byte-identical, driver hash reddens
                            # anyway (pandas materializes the two widths
                            # differently). ANY precision/scale drift in
                            # an output decimal is a violation: emit
                            # round(CAST(... AS DOUBLE), k) on both sides
                            # or cast both to one explicit decimal type.
                            violations.append(
                                f"{name}: column `{c}` decimal width "
                                f"drifts — spark {gcols[c]} vs oracle "
                                f"{ocols[c]}; align types explicitly")
    return violations


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(oracle_path))
    violations = lint(sf_dir, oracle, out_dir)
    for v in violations:
        print(f"LINT {v}")
    print(f"== lint: {len(violations)} violation(s) over {len(oracle)} queries")
    sys.exit(2 if violations else 0)


if __name__ == "__main__":
    main()
