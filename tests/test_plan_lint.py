"""Structural plan lint over EVERY registered query.

The scale contract (SCALING.md) bans two plan shapes outright:
unbounded cartesian products (pair explosion no cluster survives) and
row-at-a-time Python UDF evaluation (BatchEvalPython — the 10-100x
slow path; Python belongs in Arrow-batched kernels only, which show as
ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas). This test
walks all registered queries and fails if either marker appears
anywhere in the analyzed or physical plan, so a future operator cannot
quietly reintroduce them. Streaming/snapshot queries execute their
lifecycle during construction — smoke SF keeps that cheap."""

from __future__ import annotations

import pytest

from magicxml_spark.queries import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_forbidden_shapes(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    bad = [marker for marker in FORBIDDEN if marker in plan]
    assert not bad, f"{name}: forbidden plan shape {bad}\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# Forced-broadcast whitelist gate (VERDICT r8 #2).
#
# A forced `F.broadcast(x)` is a promise that x fits in every executor AND
# the driver at ANY scale factor. That promise only holds for tables whose
# size is bounded by construction — fixed dimensions (nation=25, region=5,
# category dims), partitions-sized offset tables, sketch bit tables (m
# rows), capped vocabularies (max_vocab), planted-twin probes, one-row
# totals. An SF-proportional table behind a broadcast hint is a driver OOM
# at the 100 TB design point (the q_collect_distinct / bigram_surprisal
# defect class). This gate greps the source tree: every F.broadcast site
# must match a whitelisted (file, argument) pair with a recorded bound.
# Adding a new forced broadcast requires consciously extending the list.
# ---------------------------------------------------------------------------

import re
from pathlib import Path

SRC_ROOT = Path(__file__).resolve().parent.parent / "magicxml_spark"

# file (relative to magicxml_spark/) -> set of allowed broadcast argument
# prefixes, each bounded by construction (bound noted inline).
BROADCAST_WHITELIST = {
    "plans/layout.py": {"bounds"},  # global min/max agg: 1 row
    "sinks/xml_sink.py": {"dim"},  # distinct category paths: dim-sized
    "operators/sampling.py": {"off_df"},  # one row per partition
    "operators/category_path.py": {"dim"},  # category dimension
    "operators/text.py": {"tot"},  # corpus total: 1 row
    "operators/flatten.py": {"category_paths"},  # category dimension
    "operators/profiling.py": {"totals"},  # global agg: 1 row
    # offsets / 1-row total / 1-row KN discount-scalar row (built as
    # `scalars`, read back from the snapshot's parquet as `scal`)
    "operators/curation.py": {"off_df", "tot", "scalars", "scal"},
    "operators/dsir.py": {"totals"},  # global bucket-count sums: 1 row
    "operators/retrieval.py": {"stats"},  # global N/avgdl agg: 1 row
    "operators/similarity.py": {"sizes", "cdf"},  # n_cells-bounded
    "operators/sketches.py": {"sketch", "bits", "minmax"},  # m-bounded / 1 row
    "sources/synth_media.py": {"found"},  # planted-twin ids: probe-sized
    "analytics/ml.py": {"vocab"},  # max_vocab-capped
    "queries/relational.py": {"nation", "region"},  # 25 / 5 fixed rows
    "queries/analytics.py": {"n_docs"},  # global count: 1 row
    "queries/pipeline.py": {"src"},  # doc_id < 100 filter: <=100 rows
}

_BC_RE = re.compile(r"F\.broadcast\(\s*([A-Za-z_][A-Za-z0-9_]*)")


def test_no_forced_broadcast_of_unbounded_tables():
    violations = []
    for path in sorted(SRC_ROOT.rglob("*.py")):
        rel = path.relative_to(SRC_ROOT).as_posix()
        text = path.read_text(encoding="utf-8")
        for lineno, line in enumerate(text.splitlines(), 1):
            m = _BC_RE.search(line)
            if not m:
                if "broadcast(" in line and "F.broadcast" in line:
                    violations.append(f"{rel}:{lineno}: unparseable broadcast arg")
                continue
            arg = m.group(1)
            if arg not in BROADCAST_WHITELIST.get(rel, set()):
                violations.append(
                    f"{rel}:{lineno}: F.broadcast({arg}...) not whitelisted — "
                    "prove the table is size-bounded by construction and add "
                    "it to BROADCAST_WHITELIST, or drop the hint (AQE decides)"
                )
    assert not violations, "\n".join(violations)
