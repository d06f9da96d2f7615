"""Structural gate-shape lint (VERDICT r11 Next #2).

The langid gate-shape trap (BASELINE r11): a ``.filter`` placed
directly on the output of an operator that appends expensive computed
columns gets pushed below the operator's projections by predicate-
pushdown substitution and re-evaluates the chains with zero reuse
(350-420 s vs 17-22 s at sf1 for the langid gate). Round 11 fixed the
two call sites and documented the convention; this lint makes it a
GUARANTEE: it walks every source file's AST and fails on any
``.filter``/``.where`` whose receiver chain roots at a gate-producing
operator without an intervening ``localCheckpoint`` /
``gate_on_computed`` boundary — the forced-broadcast-whitelist
pattern, applied to plan shape.

The taint walk is function-scoped and intentionally simple: a call to
a producer taints its chain; ``.localCheckpoint()`` / ``.checkpoint()``
cleanse it; assignments propagate taint to names; ``filter``/``where``
on a tainted receiver is a violation. ``gate_on_computed(producer(...),
cols, pred)`` is safe by construction (the helper materializes before
filtering), so its RESULT is untainted.
"""

from __future__ import annotations

import ast
from pathlib import Path

SRC_ROOT = Path(__file__).resolve().parent.parent / "magicxml_spark"

#: Operators whose output carries expensive computed columns a pushed
#: predicate would re-evaluate. Extend this set when adding a new
#: operator of the class (any appended column whose expression tree is
#: non-trivial: vote chains, n-gram batteries, classifier scores).
GATE_PRODUCERS = {
    "with_lang",
    "lang_id",
    "lang_id_paragraphs",
    "gopher_quality",
    "fineweb_quality",
}

#: Methods that MATERIALIZE the frame — taint does not survive them.
CLEANSING = {"localCheckpoint", "checkpoint"}


def _find_violations(tree: ast.AST, filename: str) -> list[str]:
    violations: list[str] = []

    class FnWalker(ast.NodeVisitor):
        def __init__(self) -> None:
            self.tainted: set[str] = set()

        def _hot(self, node: ast.AST) -> bool:
            """Is this expression a frame whose plan still exposes the
            producer's computed-column expression trees?"""
            if isinstance(node, ast.Call):
                f = node.func
                if isinstance(f, ast.Name):
                    return f.id in GATE_PRODUCERS
                if isinstance(f, ast.Attribute):
                    if f.attr in CLEANSING:
                        return False
                    if f.attr in GATE_PRODUCERS:
                        return True
                    # any other method chains taint through (select,
                    # withColumn, join, drop, alias, ...)
                    return self._hot(f.value)
                return False
            if isinstance(node, ast.Attribute):
                return self._hot(node.value)
            if isinstance(node, ast.Name):
                return node.id in self.tainted
            return False

        def visit_Assign(self, node: ast.Assign) -> None:
            self.generic_visit(node)
            hot = self._hot(node.value)
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    if hot:
                        self.tainted.add(tgt.id)
                    else:
                        self.tainted.discard(tgt.id)

        def visit_Call(self, node: ast.Call) -> None:
            self.generic_visit(node)
            f = node.func
            if (
                isinstance(f, ast.Attribute)
                and f.attr in ("filter", "where")
                and self._hot(f.value)
            ):
                violations.append(
                    f"{filename}:{node.lineno}: .{f.attr}() directly on a "
                    f"gate-producer chain — the predicate will be pushed "
                    f"below the computed-column projections and re-evaluate "
                    f"them (20x at sf1, BASELINE r11). Use "
                    f"gate_on_computed(df, cols, pred) or materialize with "
                    f".localCheckpoint() first."
                )

    class TopWalker(ast.NodeVisitor):
        def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
            FnWalker().visit(node)

        visit_AsyncFunctionDef = visit_FunctionDef  # type: ignore[assignment]

    TopWalker().visit(tree)
    return violations


def test_no_direct_filter_on_gate_producers():
    all_violations: list[str] = []
    for path in sorted(SRC_ROOT.rglob("*.py")):
        rel = path.relative_to(SRC_ROOT).as_posix()
        tree = ast.parse(path.read_text(encoding="utf-8"))
        all_violations.extend(_find_violations(tree, rel))
    assert not all_violations, "\n".join(all_violations)


# --- red fixtures: the lint must FIRE on the mis-spellings it exists for ---

_BAD_CHAINED = """
def q_bad(spark, sf_dir):
    return with_lang(docs).filter(F.col("lang") == "en")
"""

_BAD_VIA_VARIABLE = """
def q_bad(spark, sf_dir):
    lid = with_lang(docs, max_chars=1000).select("doc_id", "text", "lang")
    return lid.where(F.col("lang") == "en")
"""

_BAD_KEEP_FRAME = """
def q_bad(spark, sf_dir):
    gq = gopher_quality(main).select("doc_id", "keep")
    return main.join(gq.filter(F.col("keep")).select("doc_id"), "doc_id")
"""

_GOOD_MATERIALIZED = """
def q_good(spark, sf_dir):
    lid = (with_lang(docs).select("doc_id", "text", "lang")
           .localCheckpoint(eager=True))
    return lid.filter(F.col("lang") == "en")
"""

_GOOD_GATED = """
def q_good(spark, sf_dir):
    en = gate_on_computed(with_lang(docs), ["doc_id", "text", "lang"],
                          F.col("lang") == "en")
    return en.filter(F.col("doc_id") > 0)
"""


def test_lint_fires_on_misspelled_fixtures():
    for src in (_BAD_CHAINED, _BAD_VIA_VARIABLE, _BAD_KEEP_FRAME):
        assert _find_violations(ast.parse(src), "<fixture>"), (
            f"lint failed to flag a known-bad spelling:\n{src}"
        )


def test_lint_passes_safe_fixtures():
    for src in (_GOOD_MATERIALIZED, _GOOD_GATED):
        assert not _find_violations(ast.parse(src), "<fixture>"), (
            f"lint wrongly flagged a safe spelling:\n{src}"
        )


def test_gate_on_computed_rejects_missing_cols(spark):
    import pytest
    from pyspark.sql import functions as F

    from magicxml_spark.plans.gating import gate_on_computed

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="not in the frame"):
        gate_on_computed(df, ["doc_id", "nope"], F.col("doc_id") > 0)


def test_gate_on_computed_filters_materialized(spark):
    from pyspark.sql import functions as F

    from magicxml_spark.plans.gating import gate_on_computed

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2 == 0).alias("keep")
    )
    out = gate_on_computed(df, ["doc_id", "keep"], F.col("keep"))
    assert sorted(r.doc_id for r in out.collect()) == [0, 2, 4, 6, 8]
    # the filter sits ABOVE a scan of the materialized frame — the
    # plan shows a scan over an existing RDD, not the original project
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
