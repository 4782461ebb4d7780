#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB at a given scale factor and compare with
a graft.Bench JSON line — the single-node-throughput comparison for
BASELINE.md.

Usage: python tools/duckbench.py <sfDir> <verifyOutDir> <benchJson> [timeout_s]

DuckDB runs each query in a fresh in-process connection over the same
parquet (all cores, its native vectorized engine). Queries that exceed the
per-query timeout are recorded as >Ns (the exhaustive-pair dedup oracles
are quadratic — that gap is the point of the LSH plans).
"""
import json
import multiprocessing as mp
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    con.sql(sql).fetchall()
    q.put(time.time() - t0)


def main():
    sf_dir, out_dir, bench_json = sys.argv[1:4]
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 60.0
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    with open(bench_json) as f:
        bench = json.load(f)["queries"]
    rows = []
    for name, sql in sorted(oracle.items()):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, sql, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            duck = None
        elif q.empty():  # child died on an error before q.put()
            duck = None
        else:
            duck = q.get()
        spark = bench.get(name)
        rows.append((name, spark, duck))
        d = f"{duck:8.2f}" if duck is not None else f"  >{timeout:.0f}/err"
        s = f"{spark:8.2f}" if spark is not None else "   (absent)"
        print(f"{name:24s} spark {s}  duckdb {d}")
    sp = sum(r[1] for r in rows if r[1] is not None and r[2] is not None)
    du = sum(r[2] for r in rows if r[1] is not None and r[2] is not None)
    to = [r[0] for r in rows if r[2] is None]
    print(f"\ncomparable totals: spark {sp:.1f}s  duckdb {du:.1f}s")
    if to:
        print(f"duckdb timeouts (> {timeout:.0f}s): {', '.join(to)}")


if __name__ == "__main__":
    main()
