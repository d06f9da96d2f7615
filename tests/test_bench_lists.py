"""bench.py and tools/bench_oracle.py skip unknown names silently (a
typo would quietly drop a query from the per-round JSON) — pin every
listed name against the registry, and the registry against the driver
sample order's completeness assertion."""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _assigned(path: str, var: str):
    tree = ast.parse(open(os.path.join(REPO, path)).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == var:
                    return ast.literal_eval(node.value)
    raise AssertionError(f"{var} not found in {path}")


def test_bench_lists_name_registered_queries():
    from magicxml_spark.queries import ORACLE, QUERIES

    headline = _assigned("bench.py", "headline")
    groups = _assigned("bench.py", "secondary_groups")
    secondary = [n for g in groups.values() for n in g]
    oracle_headline = _assigned("tools/bench_oracle.py", "HEADLINE")
    for name in headline + secondary + oracle_headline:
        assert name in QUERIES, f"bench list names unregistered query {name}"
        assert name in ORACLE, f"bench query {name} has no oracle"
    # the two headline lists must stay in lockstep (the ratio tables
    # in BASELINE.md divide one by the other)
    assert headline == oracle_headline
    assert len(set(headline) & set(secondary)) == 0
    # subtotal groups are disjoint (each query contributes to exactly
    # one stable subtotal)
    assert len(secondary) == len(set(secondary))
