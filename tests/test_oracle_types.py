"""Cross-engine output-type equivalence (VERDICT r3 #2).

The driver's correctness hash is type-sensitive: round 3's only red
rows were queries whose DuckDB oracle emitted HUGEINT (sum over
BIGINT) or a different DECIMAL precision than Spark, with every value
equal. These tests pin the equivalence map so the parity harness turns
red on that class — no pyspark session needed, pure function tests.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import compare_types, type_equivalent


@pytest.mark.parametrize(
    "spark_t,duck_t",
    [
        ("bigint", "BIGINT"),
        ("int", "INTEGER"),
        ("double", "DOUBLE"),
        ("string", "VARCHAR"),
        ("boolean", "BOOLEAN"),
        ("date", "DATE"),
        ("timestamp", "TIMESTAMP"),
        ("decimal(18,2)", "DECIMAL(18,2)"),
        ("array<double>", "DOUBLE[]"),
        ("array<string>", "VARCHAR[]"),
    ],
)
def test_exact_twins_accepted(spark_t, duck_t):
    assert type_equivalent(spark_t, duck_t)


@pytest.mark.parametrize(
    "spark_t,duck_t",
    [
        # the round-3 red rows: HUGEINT has no Spark twin
        ("bigint", "HUGEINT"),
        # DuckDB sum(DECIMAL(18,2)) widens to (38,2); Spark to (28,2)
        ("decimal(28,2)", "DECIMAL(38,2)"),
        ("decimal(18,2)", "DECIMAL(18,3)"),  # scale matters too
        ("bigint", "UBIGINT"),  # unsigned has no Spark twin
        ("int", "BIGINT"),  # width matters (q_ivf_refit_plan latent)
        ("bigint", "INTEGER"),
        ("double", "FLOAT"),
        ("array<bigint>", "HUGEINT[]"),  # nested elements checked too
    ],
)
def test_mismatches_rejected(spark_t, duck_t):
    assert not type_equivalent(spark_t, duck_t)


def test_compare_types_reports_by_column_name():
    con = duckdb.connect()
    rel = con.sql("SELECT 1::BIGINT AS a, sum(2::BIGINT) AS b")  # b: HUGEINT
    problems = compare_types(
        [("a", "bigint"), ("b", "bigint")], list(rel.columns), list(rel.types)
    )
    assert problems == ["b: spark bigint vs duckdb HUGEINT"]
    con.close()


def test_registry_lint_no_unmatched_oracle_types():
    """Registry-wide lint: every oracle's output types must be exact
    Spark twins BY CONSTRUCTION — no HUGEINT, no unsigned, and any
    DECIMAL only where the Spark side emits the identical (p,s). This
    runs the oracle (DuckDB only, sf0.001 — cheap) and checks its
    output types against the set Spark can mirror at all; the full
    per-query Spark-vs-DuckDB pairing is test_oracle_parity's
    types_match assertion."""
    from magicxml_spark.queries import ORACLE
    from tests.oracle_harness import duck_connection

    con = duck_connection("/root/testdata/sf0.001")
    never_ok = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
    # driver-hash-safe rendering (VERDICT r3 #4): temporal values must
    # be strftime'd to strings in BOTH engines (raw TIMESTAMP/DATE
    # rendering is engine-binding-dependent), and floats must be DOUBLE
    # (FLOAT/REAL widening to float64 is well-defined but the narrower
    # type has no tested driver-hash history). Every query today
    # complies; a new one violating this must consciously amend here.
    render_risky = ("TIMESTAMP", "DATE", "FLOAT", "REAL")
    bad = []
    for name, sql in sorted(ORACLE.items()):
        rel = con.sql(sql)
        for col, t in zip(rel.columns, rel.types):
            ts = str(t).upper()
            if any(n in ts for n in never_ok):
                bad.append(f"{name}.{col}: {ts} (no Spark twin)")
            elif any(n in ts for n in render_risky):
                bad.append(f"{name}.{col}: {ts} (render-risky: emit a string)")
    con.close()
    assert not bad, f"oracle outputs unsafe for a type-sensitive hash: {bad}"
