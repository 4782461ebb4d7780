#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python tools/compare.py <sfDir> <verifyOutDir>

For each query dir in <verifyOutDir>: load the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet
registered as views by name), sort columns by name, and compare row values.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    import os
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for q in qdirs:
        spark_tbl = pq.read_table(f"{out_dir}/{q}")
        if q not in oracle:
            print(f"{q:24s} rows-only: {spark_tbl.num_rows} rows "
                  f"{'PASS' if spark_tbl.num_rows > 0 else 'EMPTY!'}")
            continue
        duck_tbl = con.sql(oracle[q]).arrow()
        s = spark_tbl.select(sorted(spark_tbl.column_names))
        d = duck_tbl.select(sorted(duck_tbl.column_names))
        status = []
        if s.column_names != d.column_names:
            status.append(f"COLS spark={s.column_names} duck={d.column_names}")
        elif s.schema != d.schema:
            status.append(
                "SCHEMA " + "; ".join(
                    f"{a.name}: {a.type} vs {b.type}"
                    for a, b in zip(s.schema, d.schema) if a.type != b.type))
        if s.num_rows != d.num_rows:
            status.append(f"ROWS spark={s.num_rows} duck={d.num_rows}")
        if not status:
            sp = s.to_pylist()
            dp = d.to_pylist()
            if sp != dp:
                diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sp, dp))
                         if a != b][:3]
                status.append(f"VALUES first diffs: {diffs}")
        if not status:
            # Emulate the driver's pandas-path hash: spark via arrow
            # to_pandas (decimals stay Decimal objects), oracle via duckdb
            # .df() (decimals become float64). Repr differences like
            # Decimal('44.00') vs 44.0 hash-mismatch there even when the
            # arrow values above compare equal (round-1 lesson: q01/q10/
            # q27/q44/q46).
            spd = s.to_pandas().astype(str)
            ddd = con.sql(oracle[q]).df()
            ddd = ddd[sorted(ddd.columns)].astype(str)
            if not spd.equals(ddd):
                neq = (spd != ddd)
                cols = [c for c in spd.columns if neq[c].any()]
                ex = [(c, spd[c][neq[c]].iloc[0], ddd[c][neq[c]].iloc[0])
                      for c in cols[:3]]
                status.append(f"PANDAS-REPR diffs: {ex}")
        if status:
            n_fail += 1
            print(f"{q:24s} FAIL  {' | '.join(status)}")
        else:
            n_pass += 1
            print(f"{q:24s} PASS  ({s.num_rows} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(qdirs) - n_pass - n_fail} rows-only")


if __name__ == "__main__":
    main()
