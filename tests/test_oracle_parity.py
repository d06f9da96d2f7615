"""THE correctness gate: every registered query vs its DuckDB oracle
at sf0.01 — the same comparison the driver records in
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from magicxml_spark.queries import ORACLE, QUERIES
from magicxml_spark.session import release_persisted_rdds
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.fixture(autouse=True)
def _sweep_checkpoints(spark):
    """Each parametrized case builds a fresh plan from the registry, so
    the previous case's leaked localCheckpoint blocks are garbage —
    release them so the 150+-query gate doesn't accumulate storage/GC
    (session.release_persisted_rdds documents the leak)."""
    yield
    release_persisted_rdds(spark)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_ORACLE)
    result = compare(df, duck, ORACLE[name])
    assert result["rows_match"], f"{name}: row counts {result['rows_spark']} vs {result['rows_duck']}"
    assert result["schema_match"], f"{name}: columns {result['cols_spark']} vs {result['cols_duck']}"
    # the driver's value hash is TYPE-sensitive (HUGEINT/DECIMAL(38,2)
    # oracle outputs hash differently from Spark's bigint/decimal even
    # when values are equal — the round-3 red rows); exact type twins
    # are part of the gate, not just equal values
    assert result["types_match"], f"{name}: output types differ {result['type_mismatches']}"
    assert result["values_match"], f"{name}: first diff {result.get('first_diff')}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
