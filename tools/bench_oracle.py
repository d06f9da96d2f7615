#!/usr/bin/env python
"""Time the DuckDB oracle SQL for the bench headline set at a given SF.

Companion to bench.py: the per-round BENCH json records Spark times;
this records what DuckDB 1.x takes for the equivalent SQL on the SAME
parquet, giving the Spark/DuckDB ratio BASELINE.md tracks (the
reference publishes no numbers — see SURVEY.md §6 — so the oracle is
the baseline).

Usage: SPARK_GRAFT_SF_DIR=... python tools/bench_oracle.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q_flagship_revenue",
    "q_pricing_summary",
    "q_stock_aggregate",
    "q_topk_per_group",
    "q_category_path",
    "q_exact_dedup",
    "q_minhash_lsh_pairs",
    "q_simhash",
    "q_text_profile",
    "q_tfidf_top_terms",
    "q_cosine_topk",
    "q_sessionize",
    "q_range_join",
    "q_salted_agg",
    "q_events_stream_windowed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from magicxml_spark.queries import ORACLE
    from magicxml_spark.tables import TABLE_NAMES

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )

    # Default wrapper mirrors bench.py's `.count()` (driver contract).
    # MXS_BENCH_FORCE=1 instead hashes every output cell — count-style
    # wrappers let the optimizer prune unreferenced projections (DuckDB
    # does this aggressively: a projection-only query times as a bare
    # row count), so the forced mode is the apples-to-apples one for
    # projection-heavy queries. Set the same env on bench.py.
    force = os.environ.get("MXS_BENCH_FORCE") == "1"
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = ORACLE.get(name)
        if sql is None:
            continue
        wrapped = (
            f"SELECT sum(hash(t)) FROM ({sql}) t"
            if force
            else f"SELECT count(*) FROM ({sql})"
        )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(wrapped).fetchone()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_oracle_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
