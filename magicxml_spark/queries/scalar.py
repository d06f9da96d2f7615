"""Scalar-function queries (SURVEY.md §2.3: P4, P9-P12, P17-P19, Q17).

Each query applies one scalar operator to columns constructed from the
testdata tables (the synthetic tables don't contain '///' strings or
'?'-sizes, so inputs are built with concat — the *operator under test*
is the engine function, evaluated JVM-side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magicxml_spark.functions.html import clean_description
from magicxml_spark.functions.strings import (
    _SANITIZE_WHITELIST,
    csv_normalize_value,
    decimal_comma_quirk,
    dedup_delimited,
    default_available,
    first_wins,
    md5_short_id,
    sanitize_name,
    strip_size_question,
)
from magicxml_spark.queries import query
from magicxml_spark.tables import table

# The RE2 (DuckDB) spelling of the sanitize whitelist — identical class,
# single-quotes doubled for SQL embedding.
_WHITELIST_SQL = _SANITIZE_WHITELIST.replace("'", "''")


# --- P10: sanitize_name ----------------------------------------------------
@query(
    "q_sanitize_name",
    oracle=f"""
    SELECT p_partkey,
           trim(regexp_replace(regexp_replace(regexp_replace(
                 '  ' || p_name || ' ™ ( ' || p_brand || ' )',
                 '{_WHITELIST_SQL}', '', 'g'),
                 '\\s+', ' ', 'g'),
                 '\\(\\s*([^)]+)\\s*\\)', '(\\1)', 'g')) AS sanitized
    FROM part
    """,
)
def q_sanitize_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    dirty = F.concat(F.lit("  "), F.col("p_name"), F.lit(" ™ ( "), F.col("p_brand"), F.lit(" )"))
    return part.select("p_partkey", sanitize_name(dirty).alias("sanitized"))


# --- P4: order-preserving delimited dedup ----------------------------------
@query(
    "q_dedup_delimited",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(lower(text), '\\s+')[1:8],
                                        x -> regexp_replace(x, '^\\s+|\\s+$', '', 'g')),
                         x -> x <> '') AS items
      FROM documents)
    SELECT doc_id,
           array_to_string(list_filter(items, (x, i) -> list_position(items, x) = i),
                           '///') AS deduped
    FROM v
    """,
)
def q_dedup_delimited(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    joined = F.concat_ws("///", F.slice(F.split(F.lower(F.col("text")), "\\s+"), 1, 8))
    return docs.select("doc_id", dedup_delimited(joined).alias("deduped"))


# --- P9: decimal-comma rewrite (quirk: tests the TAG, not the value) -------
@query(
    "q_decimal_comma",
    oracle="""
    SELECT p_partkey, tag,
           CASE WHEN regexp_matches(tag, '^([0-9]+\\.?[0-9]*|\\.[0-9]+)$')
                THEN replace(val, '.', ',') ELSE val END AS converted
    FROM (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN CAST(p_size AS VARCHAR) ELSE p_type END AS tag,
             CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 100 AS VARCHAR) AS val
      FROM part)
    """,
)
def q_decimal_comma(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    tag = F.when(F.col("p_partkey") % 2 == 0, F.col("p_size").cast("string")).otherwise(
        F.col("p_type")
    )
    val = F.concat(
        F.col("p_size").cast("string"), F.lit("."), (F.col("p_partkey") % 100).cast("string")
    )
    return part.select(
        "p_partkey", tag.alias("tag"), decimal_comma_quirk(tag, val).alias("converted")
    )


# --- P11: size '?'-strip ----------------------------------------------------
@query(
    "q_size_strip",
    oracle="""
    SELECT p_partkey, key, val,
           CASE WHEN lower(key) LIKE '%размер%' OR lower(key) LIKE '%size%'
                     OR (val LIKE '%?%' AND regexp_matches(val, '[0-9]'))
                THEN trim(replace(val, '?', '')) ELSE val END AS stripped
    FROM (
      SELECT p_partkey,
             CASE p_partkey % 3 WHEN 0 THEN 'Размер' WHEN 1 THEN 'size_eu'
                                ELSE 'color' END AS key,
             CASE WHEN p_partkey % 2 = 0 THEN '?' || CAST(p_size AS VARCHAR)
                  ELSE CAST(p_size AS VARCHAR) || ' cm' END AS val
      FROM part)
    """,
)
def q_size_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    key = (
        F.when(F.col("p_partkey") % 3 == 0, "Размер")
        .when(F.col("p_partkey") % 3 == 1, "size_eu")
        .otherwise("color")
    )
    val = F.when(
        F.col("p_partkey") % 2 == 0, F.concat(F.lit("?"), F.col("p_size").cast("string"))
    ).otherwise(F.concat(F.col("p_size").cast("string"), F.lit(" cm")))
    return part.select(
        "p_partkey",
        key.alias("key"),
        val.alias("val"),
        strip_size_question(key, val).alias("stripped"),
    )


# --- P12 + P18: first-wins fill and 'available' default ---------------------
@query(
    "q_defaults",
    oracle="""
    SELECT event_id,
           CASE WHEN avail_raw IS NULL OR avail_raw = '' THEN '1' ELSE avail_raw END AS available,
           coalesce(nullif(nullif(pick_a, ''), 'Undefined'),
                    nullif(nullif(pick_b, ''), 'Undefined'), '') AS first_pick
    FROM (
      SELECT event_id,
             CASE event_id % 3 WHEN 0 THEN '' WHEN 1 THEN NULL ELSE '0' END AS avail_raw,
             CASE event_id % 2 WHEN 0 THEN 'Undefined' ELSE event_type END AS pick_a,
             coalesce(event_type, '') || '-b' AS pick_b
      FROM events)
    """,
)
def q_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    avail_raw = (
        F.when(F.col("event_id") % 3 == 0, "")
        .when(F.col("event_id") % 3 == 1, F.lit(None).cast("string"))
        .otherwise("0")
    )
    pick_a = F.when(F.col("event_id") % 2 == 0, "Undefined").otherwise(F.col("event_type"))
    pick_b = F.concat(F.coalesce(F.col("event_type"), F.lit("")), F.lit("-b"))
    return ev.select(
        "event_id",
        default_available(avail_raw).alias("available"),
        first_wins(pick_a, pick_b).alias("first_pick"),
    )


# --- P19: CSV value normalization -------------------------------------------
@query(
    "q_csv_normalize",
    oracle="""
    SELECT doc_id,
           trim(replace(replace(source || ', ' || lang || chr(10) || 'x',
                                ', ', '///'),
                        chr(10), ' ')) AS room_type
    FROM documents
    """,
)
def q_csv_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    raw = F.concat(F.col("source"), F.lit(", "), F.col("lang"), F.lit("\n"), F.lit("x"))
    return docs.select("doc_id", csv_normalize_value("ROOM_TYPE", raw).alias("room_type"))


# --- Q17: md5 short id -------------------------------------------------------
@query(
    "q_md5_user_hash",
    oracle="""
    SELECT DISTINCT user_id, substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS user_hash
    FROM events
    """,
)
def q_md5_user_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select("user_id", md5_short_id(F.col("user_id")).alias("user_hash")).distinct()


# --- P17: description HTML clean (fast regexp path) --------------------------
@query(
    "q_html_clean",
    oracle="""
    SELECT doc_id,
           CASE WHEN trim(substr(text, 1, 30)) = '' THEN ''
                ELSE '<p>' || trim(substr(text, 1, 30)) || '</p>' END AS description
    FROM documents
    """,
)
def q_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    html = F.concat(F.lit("<div><b>"), F.substring("text", 1, 30), F.lit("</b></div>"))
    return docs.select("doc_id", clean_description(html).alias("description"))
