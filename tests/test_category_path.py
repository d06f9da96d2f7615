"""P8 recursive category path vs a direct reimplementation of the
reference closure (main.py:1487-1506) on trees with cycles, orphans,
and Undefined names (FIXTURES.md F2)."""

from __future__ import annotations

import pytest

from magicxml_spark.operators.category_path import (
    build_category_paths,
    build_category_paths_sql,
)

# (id, parent, name): depth chain, cycle pair, self-loop, orphan parent,
# Undefined name mid-chain
CATS = [
    ("1", None, "Root"),
    ("2", "1", "Mid"),
    ("3", "2", "Leaf"),
    ("4", "5", "CycleA"),
    ("5", "4", "CycleB"),
    ("6", "6", "SelfLoop"),
    ("7", "404", "Orphan"),
    ("8", "2", "Undefined"),
    ("9", "8", "UnderUndef"),
]


def reference_build_path(cid, categories, parents):
    # faithful reimplementation of main.py:1487-1506 for oracle use
    if not cid or cid == "Undefined":
        return "Undefined"
    path, current, visited = [], cid, set()
    while current and current in categories and current not in visited:
        visited.add(current)
        name = categories.get(current, "Undefined")
        if name and name != "Undefined":
            path.append(name)
        current = parents.get(current)
    if not path:
        return categories[cid] if cid in categories else "Undefined"
    return "///".join(reversed(path))


@pytest.fixture(scope="module")
def cats_df(spark):
    return spark.createDataFrame(CATS, ["id", "parent_id", "name"])


# threshold 0 forces the distributed iterative loop; the default takes
# the driver fast path — both must match the reference closure
@pytest.mark.parametrize("threshold", [100_000, 0], ids=["driver", "distributed"])
def test_matches_reference_closure(spark, cats_df, threshold):
    got = {
        r["id"]: r["category_path"]
        for r in build_category_paths(
            cats_df, skip_undefined_names=True, driver_threshold=threshold
        ).collect()
    }
    categories = {c[0]: c[2] for c in CATS}
    parents = {c[0]: c[1] for c in CATS if c[1]}
    for cid in categories:
        assert got[cid] == reference_build_path(cid, categories, parents), cid


@pytest.mark.parametrize("threshold", [100_000, 0], ids=["driver", "distributed"])
def test_full_mode_keeps_undefined(spark, cats_df, threshold):
    got = {
        r["id"]: r["category_path"]
        for r in build_category_paths(cats_df, driver_threshold=threshold).collect()
    }
    assert got["3"] == "Root///Mid///Leaf"
    assert got["9"] == "Root///Mid///Undefined///UnderUndef"
    assert got["6"] == "SelfLoop"
    assert got["4"] == "CycleB///CycleA"


def test_recursive_cte_agrees_on_acyclic(spark, cats_df):
    # the declarative twin (no cycle rows — recursion would loop)
    acyclic = cats_df.filter(~cats_df.id.isin("4", "5", "6"))
    loop = {
        r["id"]: r["category_path"] for r in build_category_paths(acyclic).collect()
    }
    sql = {
        r["id"]: r["category_path"]
        for r in build_category_paths_sql(spark, acyclic).collect()
    }
    assert loop == sql
