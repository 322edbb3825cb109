#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only —
the Scala library does not depend on this).

Runs graft.Verify output against the DuckDB oracle: for each query, load
<out>/<name> parquet, run the oracle SQL from oracle_sql.json over the same
scale-factor tables, sort columns by name, sort rows, and compare values.

Usage: tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def norm_df(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fail += 1
            continue
        g, w = norm_df(got), norm_df(want)
        # int-vs-float dtype mismatches (e.g. DuckDB HUGEINT -> pandas
        # float64 vs Spark int64) stringify differently under the driver's
        # str()-based normalization even when values are equal — treat as
        # failure here so they never reach the driver gate.
        # "i" and "u" are both integer-like (pandas may infer uint64 from
        # parquet); flag whenever one side is integer-like and the other
        # is float (ADVICE r4: a u-vs-f clash slipped the old {i,f} test).
        int_kinds = {"i", "u"}
        kind_clash = [
            c for c in got.columns if c in want.columns
            and len({got[c].dtype.kind, want[c].dtype.kind} & int_kinds) > 0
            and "f" in {got[c].dtype.kind, want[c].dtype.kind}
        ]
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            fail += 1
        elif kind_clash:
            print(f"FAIL {name}: int/float dtype clash on {kind_clash} "
                  f"(spark {[str(got[c].dtype) for c in kind_clash]} vs "
                  f"oracle {[str(want[c].dtype) for c in kind_clash]})")
            fail += 1
        elif g == w:
            print(f"ok   {name} ({len(g)} rows)")
            ok += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            sg, sw = set(g), set(w)
            print(f"     spark-only: {[r for r in g if r not in sw][:3]}")
            print(f"     oracle-only: {[r for r in w if r not in sg][:3]}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
