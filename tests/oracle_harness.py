"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, sorted column names,
and an order-insensitive value hash — the same three checks
CORRECTNESS_r{N}.json records. Keeping this in-repo means every
`pytest` run IS the correctness gate."""

from __future__ import annotations

import math

import duckdb

from magicxml_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        # integral floats print identically everywhere; repr is
        # shortest-round-trip in both engines' Python bindings
        return repr(v)
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon_cell(row[i]) for i in order) for row in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    result = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(spark_cols),
        "cols_duck": sorted(duck_cols),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_duck"]
    result["schema_match"] = result["cols_spark"] == result["cols_duck"]
    if result["rows_match"] and result["schema_match"]:
        a = canonical_rows(spark_cols, spark_rows)
        b = canonical_rows(duck_cols, duck_rows)
        result["values_match"] = a == b
        if not result["values_match"]:
            result["first_diff"] = next(
                ((x, y) for x, y in zip(a, b) if x != y), ("<len>", "<len>")
            )
    else:
        result["values_match"] = False
    return result
