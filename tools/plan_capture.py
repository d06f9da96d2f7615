#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/plan_capture.py <out_subdir> <suffix> q_a q_b ...
       python tools/plan_capture.py r12 before q_gopher_quality

Writes plans/<out_subdir>/<query>_<suffix>.txt for each query. Queries
whose builder performs eager lifecycle work (snapshot writes) still run
that work — the captured plan is the returned DataFrame's, which is
what the bench times after the eager phase.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_sub, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from magicxml_spark.queries import QUERIES
    from magicxml_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        out_sub,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("magicxml-plan-capture")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
