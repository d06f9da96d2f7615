#!/usr/bin/env python
"""Per-query Spark vs DuckDB-oracle timing at an arbitrary SF dir.

Companion to bench.py/bench_oracle.py for residue profiling (the
BASELINE.md per-query experiment tables): times the NAMED queries only,
in forced mode by default (every output cell hashed on both engines, so
neither optimizer can prune projection-only work — see bench.py), warm,
min-of-N.

Usage:
  SPARK_GRAFT_SF_DIR=.scratch/sf1 python tools/residue_bench.py \
      q_category_path q_salted_agg [--runs 3] [--count-mode]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--count-mode", action="store_true")
    ap.add_argument("--spark-only", action="store_true")
    ap.add_argument("--duckdb-only", action="store_true")
    args = ap.parse_args()
    force = not args.count_mode
    os.environ["MXS_BENCH_FORCE"] = "1" if force else "0"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from magicxml_spark.queries import ORACLE, QUERIES

    out: dict[str, dict[str, float]] = {}

    if not args.duckdb_only:
        from pyspark.sql import functions as F

        from magicxml_spark.session import get_spark

        spark = get_spark("residue-bench")

        def _measure(df) -> None:
            if force:
                df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).agg(
                    F.expr("bit_xor(h)")
                ).collect()
            else:
                df.count()

        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
        if not os.path.isdir(warm_dir):
            warm_dir = "/root/testdata/sf0.001"
        for name in args.queries:
            _measure(QUERIES[name](spark, warm_dir))
            best = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                _measure(QUERIES[name](spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(name, {})["spark"] = round(best, 3)

    if not args.spark_only:
        import duckdb

        from magicxml_spark.tables import TABLE_NAMES

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in args.queries:
            sql = ORACLE.get(name)
            if sql is None:
                continue
            wrapped = (
                f"SELECT sum(hash(t)) FROM ({sql}) t"
                if force
                else f"SELECT count(*) FROM ({sql})"
            )
            best = None
            for _ in range(args.runs):
                t0 = time.perf_counter()
                con.execute(wrapped).fetchone()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out.setdefault(name, {})["duckdb"] = round(best, 3)

    for name, row in out.items():
        if "spark" in row and "duckdb" in row and row["duckdb"] > 0:
            row["ratio"] = round(row["spark"] / row["duckdb"], 2)
    print(json.dumps({"sf_dir": sf_dir, "forced": force, "queries": out}))


if __name__ == "__main__":
    sys.exit(main())
