#!/usr/bin/env python
"""Spark-side forced-hash probe at an arbitrary SF (BASELINE protocol):
per query, warm at sf0.001, then MXS_BENCH_FORCE-style xxhash64/bit_xor
over every output cell, min-of-N. Usage:
  [MXS_PROBE_RUNS=2] SPARK_GRAFT_SF_DIR=.scratch/sf1 \
      python tools/sf1_force_probe.py q_a q_b ...
"""
from __future__ import annotations
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def force_measure(df):
    from pyspark.sql import functions as F
    return df.select(F.xxhash64(F.struct(*df.columns)).alias("h")).agg(
        F.expr("bit_xor(h)")).collect()[0][0]

def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".scratch/sf1")
    runs = int(os.environ.get("MXS_PROBE_RUNS", "2"))
    from magicxml_spark.queries import QUERIES
    from magicxml_spark.session import get_spark
    spark = get_spark("sf1-force-probe")
    out = {}
    for name in names:
        warm = "/root/testdata/sf0.001"
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        try:
            force_measure(QUERIES[name](spark, warm))
        except Exception as exc:
            print(f"warm-up failed {name}: {exc}", file=sys.stderr)
        raw = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"force[{i}]: {name}")
            t0 = time.perf_counter()
            force_measure(QUERIES[name](spark, sf_dir))
            raw.append(round(time.perf_counter() - t0, 2))
            print(f"  {name} run{i}: {raw[-1]}", file=sys.stderr)
        out[name] = {"min": min(raw), "runs": raw}
    print(json.dumps({"mode": "force", "sf_dir": sf_dir, "timings": out}))
    spark.stop()

if __name__ == "__main__":
    sys.exit(main())
