"""Bucketed co-located joins (SCALING.md 'Partitioning & shuffle').

Writing both sides of a recurring join bucketed by the join key means
later joins are Exchange-free: each task zips matching buckets. At
100 TB this converts the biggest repeated shuffle (lineitem x orders
on orderkey) into a local merge — the cost is paid once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Persist as a bucketed+sorted managed table (overwrite)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket keys. With equal
    bucket counts the plan contains NO Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
