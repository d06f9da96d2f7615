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
