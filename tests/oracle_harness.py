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


# --- cross-engine output-type equivalence -----------------------------------
# The driver's value hash is TYPE-sensitive: DuckDB sum(BIGINT) emits
# HUGEINT and sum(DECIMAL(18,2)) emits DECIMAL(38,2), and both hash
# differently from Spark's bigint / decimal(28,2) even when every value
# is equal (round-3 red rows q_pii_scrub / q_moving_sum /
# q_token_shards). String-normalizing cells (the old behavior) erased
# that distinction, so the local gate stayed green while the driver's
# went red. `types_match` closes the blind spot: each Spark dtype must
# map to the EXACT DuckDB twin through the equivalence table below —
# HUGEINT has no Spark twin and always fails, and decimals must agree
# on precision AND scale.
_DUCK_EQUIV: dict[str, set[str]] = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "void": {'"NULL"', "NULL"},
}


def type_equivalent(spark_dtype: str, duck_type: str) -> bool:
    """True when a Spark column dtype and a DuckDB output type are exact
    cross-engine twins (same wire values under a type-sensitive hash)."""
    s = spark_dtype.strip().lower().replace(" ", "")
    d = duck_type.strip().upper().replace(" ", "")
    if s.startswith("decimal("):
        return d == s.upper()  # precision AND scale must agree
    if s.startswith("array<") and s.endswith(">") and d.endswith("[]"):
        return type_equivalent(s[6:-1], d[:-2])
    # structs/maps: no registered query emits them today; treat any
    # appearance as a mismatch so a new one forces an explicit decision
    if s.startswith(("struct<", "map<")):
        return False
    return d in _DUCK_EQUIV.get(s, set())


def compare_types(
    spark_dtypes: list[tuple[str, str]],
    duck_cols: list[str],
    duck_types: list,
) -> list[str]:
    """Column-name-aligned type check; returns mismatch descriptions."""
    duck_by_name = {c: str(t) for c, t in zip(duck_cols, duck_types)}
    problems = []
    for name, sdt in spark_dtypes:
        ddt = duck_by_name.get(name)
        if ddt is None:
            continue  # schema_match already reports missing columns
        if not type_equivalent(sdt, ddt):
            problems.append(f"{name}: spark {sdt} vs duckdb {ddt}")
    return problems


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
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_types = list(rel.types)
    duck_rows = rel.fetchall()

    result = {
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(spark_cols),
        "cols_duck": sorted(duck_cols),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_duck"]
    result["schema_match"] = result["cols_spark"] == result["cols_duck"]
    result["type_mismatches"] = compare_types(
        spark_df.dtypes, duck_cols, duck_types
    )
    result["types_match"] = not result["type_mismatches"]
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
