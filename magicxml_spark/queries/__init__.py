"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when the semantics
are SQL-expressible, a DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports these to the verification driver.

Registration is by decorator so adding an operator is one function in
one themed module; importing this package pulls in every module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL
    (omit for genuinely non-SQL-expressible ops — driver then records a
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


# Import for side effects: each module registers its queries.
from magicxml_spark.queries import relational  # noqa: E402,F401
from magicxml_spark.queries import scalar  # noqa: E402,F401
from magicxml_spark.queries import hierarchy  # noqa: E402,F401
from magicxml_spark.queries import analytics  # noqa: E402,F401
from magicxml_spark.queries import extensions  # noqa: E402,F401
from magicxml_spark.queries import pipeline  # noqa: E402,F401
