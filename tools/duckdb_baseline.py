#!/usr/bin/env python3
"""Dev-only baseline generator: time every oracle_sql.json statement in
DuckDB over the same parquet tables graft.Bench reads, and write the
per-query seconds to DUCKDB_BASELINE.json at the repo root.

graft.Bench picks that file up (when its `sf` field matches the bench's
SPARK_GRAFT_SF_DIR) and emits the baseline + per-run ratio inside its own
JSON line, so every BENCH_r{N}.json carries its own comparison point.

MUST run sequentially — never concurrently with graft.Bench or sbt test:
timings inflate 3-5x under contention (documented round-2 finding).

Usage: python3 tools/duckdb_baseline.py <verify_out_dir> <sf_dir> [out.json]
  <verify_out_dir> — a `runMain graft.Verify` dump (for oracle_sql.json)
  <sf_dir>         — the scale-factor dir the timings are valid for
"""
import datetime
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

RUNS = 3  # min-of-N, same contention-robust statistic as graft.Bench


def main(out_dir: str, sf_dir: str, out_path: str = "DUCKDB_BASELINE.json") -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    timings = {}
    for name, sql in sorted(oracles.items()):
        con.execute(sql).fetchall()  # warm (page cache + plan)
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        print(f"{name:24s} {best:8.3f}s")
    doc = {
        "sf": sf_dir,
        "engine": f"duckdb {duckdb.__version__}",
        "generated": datetime.date.today().isoformat(),
        "protocol": f"min of {RUNS} after 1 warm run, sequential",
        "total_sec": round(sum(timings.values()), 3),
    }
    doc.update({f"q::{k}": v for k, v in timings.items()})
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\ntotal {doc['total_sec']}s over {len(timings)} queries -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
