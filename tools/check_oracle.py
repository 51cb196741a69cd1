#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (t2).

Usage: check_oracle.py <sfDir> <verifyOutDir>

Runs every oracle_sql.json query in DuckDB against the sfDir parquet
tables, loads the corresponding Spark parquet dump, sorts columns by
name (as the driver does), and compares schema + row count + exact
values. Strict: floats must be bit-identical — our queries are designed
for that (decimal-exact aggregation, rounded edges).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    return pq.read_table(f"{outdir}/{name}")


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        try:
            got = load_spark(outdir, name)
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failed.append(name)
            continue
        # sort columns by name
        want = want.select(sorted(want.column_names))
        got = got.select(sorted(got.column_names))
        if want.column_names != got.column_names:
            print(f"FAIL {name}: columns differ: duckdb={want.column_names} spark={got.column_names}")
            failed.append(name)
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows differ: duckdb={want.num_rows} spark={got.num_rows}")
            failed.append(name)
            continue
        # schema compare (loose on decimal/int widths? be strict, report)
        schema_diffs = []
        for c in want.column_names:
            wt, gt = want.schema.field(c).type, got.schema.field(c).type
            if wt != gt:
                schema_diffs.append(f"{c}: duckdb={wt} spark={gt}")
        if schema_diffs:
            print(f"WARN {name}: schema diffs: {schema_diffs}")
        # value compare
        bad = None
        for c in want.column_names:
            wv = want.column(c).to_pylist()
            gv = got.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                eq = (a == b)
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b)) or a == b
                if not eq:
                    bad = f"col {c} row {i}: duckdb={a!r} spark={b!r}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            failed.append(name)
        else:
            print(f"OK   {name} ({want.num_rows} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle-matched; "
          f"failed: {failed if failed else 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
