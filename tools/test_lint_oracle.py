#!/usr/bin/env python3
"""Unit case for lint_oracle's decimal-width check — the r16 regression
(q_j_bucketed_agg): Spark dumps sum(DECIMAL(18,2)) as DECIMAL(28,2),
DuckDB's oracle binds the same sum as DECIMAL(38,2); values are
byte-identical but the driver's hash reddens. The lint must flag ANY
precision/scale drift between oracle output schema and dumped parquet,
and must stay silent when the widths agree.

Run: python3 tools/test_lint_oracle.py   (exit 0 = lint behaves)
"""
import os, sys, tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lint_oracle import lint  # noqa: E402


def main():
    with tempfile.TemporaryDirectory() as d:
        sf = os.path.join(d, "sf")
        out = os.path.join(d, "out", "q_width")
        os.makedirs(sf)
        os.makedirs(out)
        con = duckdb.connect()
        # minimal 'orders' table so lint's views bind
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.execute(
                f"COPY (SELECT 1::BIGINT AS o_custkey, "
                f"CAST(12.34 AS DECIMAL(18,2)) AS o_totalprice) "
                f"TO '{sf}/{t}.parquet' (FORMAT PARQUET)")
        # the "Spark dump": the narrower width Spark's sum() produces
        con.execute(
            f"COPY (SELECT 1::BIGINT AS o_custkey, "
            f"CAST(12.34 AS DECIMAL(28,2)) AS revenue) "
            f"TO '{out}/part-0.parquet' (FORMAT PARQUET)")

        drift = {"q_width": "SELECT o_custkey, sum(o_totalprice) AS revenue"
                            " FROM orders GROUP BY o_custkey"}
        v = lint(sf, drift, os.path.join(d, "out"))
        assert any("decimal width drifts" in x for x in v), \
            f"28,2-vs-38,2 drift NOT caught: {v}"

        aligned = {"q_width":
                   "SELECT o_custkey, CAST(sum(o_totalprice) AS "
                   "DECIMAL(28,2)) AS revenue FROM orders "
                   "GROUP BY o_custkey"}
        v2 = lint(sf, aligned, os.path.join(d, "out"))
        assert not v2, f"aligned widths should pass, got: {v2}"
    print("OK lint_oracle decimal-width: drift caught, aligned passes")


if __name__ == "__main__":
    main()
