#!/usr/bin/env python3
"""Dev-only self-check that mimics the driver's DuckDB-oracle compare:
run each oracle_sql.json query in DuckDB over the same parquet tables,
sort columns by name + rows, and diff against the Spark parquet output.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [q_a,q_b]
(the optional third arg restricts the check to a comma-separated subset,
matching graft.Verify's optional third arg)
"""
import json, math, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        # normalize datetimes to strings for cross-engine compare
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        # The driver's hash normalizes integer WIDTHS (int32 Spark vs int64
        # DuckDB rows are green in CORRECTNESS_r11) but NOT int-vs-float
        # (HUGEINT -> float64 broke q_sig_terms for three rounds). Mirror
        # that: upcast all ints to int64, keep the int/float distinction.
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        unknown = keep - set(oracles)
        if unknown:
            print(f"WARN unknown subset names (not in oracle_sql.json): "
                  f"{sorted(unknown)}")
        oracles = {k: v for k, v in oracles.items() if k in keep}
    if not oracles:
        # a vacuously-green gate is the failure mode, not a pass
        print("FAIL no queries selected")
        return 1
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # The driver's hash is TYPE-sensitive: an uncast DuckDB SUM comes
        # back HUGEINT -> float64 here while Spark emits int64, and the
        # value-level compare below passes anyway (cost q_sig_terms three
        # rounds). Fail on any dtype divergence so it can't pass locally.
        dbad = [(c, str(got[c].dtype), str(want[c].dtype))
                for c in got.columns if got[c].dtype != want[c].dtype]
        if dbad:
            print(f"FAIL {name}: dtype mismatch {dbad} "
                  "(driver hash is type-sensitive — add CASTs to the oracle)")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c], want[c])):
                xnull, ynull = pd.isna(x), pd.isna(y)
                if xnull and ynull:
                    continue
                if xnull != ynull or not equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col={c} row={i} spark={x!r} duck={y!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
