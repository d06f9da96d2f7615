"""Conversion pipelines (reference query lifecycles, SURVEY §3).

``xml_to_csv`` is the flagship path (§3.1: URL/file -> validate ->
dialect detect -> flatten -> prune -> CSV). ``convert_file`` is the
extension-dispatch surface (§3.2). Everything between source and sink
is one lazy DataFrame plan — Catalyst owns ordering; the only driver
materializations are the tiny category dimension and the param-key
distinct scan (both bounded dimensions, SURVEY §4)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from magicxml_spark.operators.category_path import build_category_paths
from magicxml_spark.operators.flatten import (
    flatten_offer_records,
    flatten_russian_records,
    flatten_service_records,
)
from magicxml_spark.sinks.csv_sink import write_csv
from magicxml_spark.sinks.json_sink import write_json_array
from magicxml_spark.sinks.xml_sink import write_simple_catalog, write_yml_catalog
from magicxml_spark.sources.csv_source import read_csv
from magicxml_spark.sources.json_source import read_json
from magicxml_spark.sources import xml_source as _xml_source
from magicxml_spark.sources.xml_source import (
    read_categories,
    read_xml_records,
)


def flatten_xml(spark: SparkSession, path: str, dialect: str | None = None) -> DataFrame:
    """XML file -> flat string-typed DataFrame (dialect-dispatched).

    A single XML file scans as ONE partition (the XML source splits by
    file, not rowTag) — everything downstream would run serially, so an
    under-parallel scan is re-partitioned once up front. For repeated
    processing of one giant file, pre-split it on disk instead
    (sources.xml_split.presplit_xml)."""
    from magicxml_spark.sources.schema_registry import (
        content_key,
        meta_get,
        meta_put,
    )

    records, detected = read_xml_records(spark, path, dialect)
    target = spark.sparkContext.defaultParallelism
    if records.rdd.getNumPartitions() < max(2, target // 2):
        records = records.repartition(target)
    # the pipeline scans records several times (param-key distinct scan,
    # Q5 prune aggregate, final projection+write) — cache the typed
    # records so the XML text parses exactly once. On a re-ingest of
    # byte-identical content every derived artifact (pivot keys,
    # category paths, prune columns) replays from the metadata cache and
    # the whole conversion collapses to ONE parse+project+write pass.
    records = records.persist()
    cached = records
    ckey = content_key(path)
    if detected == "russian":
        flat = flatten_russian_records(records)
    elif detected == "service":
        flat = flatten_service_records(records)
    else:
        paths = None
        if detected == "offer":
            path_rows = meta_get("category_paths", ckey)
            if path_rows is None:
                cats = read_categories(spark, path)
                if not cats.isEmpty():
                    paths = build_category_paths(cats, skip_undefined_names=True)
                    # dimension-sized path maps replay from the driver
                    # metadata cache on re-ingest; an oversized dimension
                    # (same cap as read_categories' own cache,
                    # xml_source._CATEGORY_CACHE_MAX_ROWS) stays a lazy
                    # frame and is never collected — a catalog with
                    # millions of categories must not OOM the driver
                    # just to warm a convenience cache
                    cap = _xml_source._CATEGORY_CACHE_MAX_ROWS
                    sample = paths.limit(cap + 1).collect()
                    if len(sample) <= cap:
                        meta_put("category_paths", ckey, tuple(sample))
                else:
                    meta_put("category_paths", ckey, ())
            elif path_rows:
                paths = spark.createDataFrame(
                    list(path_rows), "id string, category_path string"
                )
        pivots = meta_get("pivot_keys", ckey)
        flat = flatten_offer_records(
            records, detected, category_paths=paths, pivot_keys=pivots
        )
        if pivots is None:
            meta_put("pivot_keys", ckey, getattr(flat, "_mxs_pivot_keys", None))
    # hand the cache handle to the caller so one-shot pipelines can
    # unpersist after their final action (long sessions don't leak)
    flat._mxs_cached = cached  # type: ignore[attr-defined]
    flat._mxs_content_key = ckey  # type: ignore[attr-defined]
    return flat


def xml_to_csv(
    spark: SparkSession,
    src: str,
    dst: str,
    dialect: str | None = None,
    single_file: bool = True,
) -> str:
    """§3.1 flagship: XML catalog -> pruned ';'-CSV (BOM single-file
    mode mirrors the reference byte format; multi-part for scale).

    Shuffle partitions are sized from the source bytes for the duration
    of the conversion (plans/partitioning.py): a 100 GB export and a
    100 KB fixture run the same code and each get a sane stage width."""
    from magicxml_spark.plans.partitioning import scoped_shuffle_partitions

    flat = flatten_xml(spark, src, dialect)
    try:
        with scoped_shuffle_partitions(spark, flat):
            return write_csv(
                flat,
                dst,
                single_file=single_file,
                meta_key=getattr(flat, "_mxs_content_key", None),
            )
    finally:
        cached = getattr(flat, "_mxs_cached", None)
        if cached is not None:
            cached.unpersist()


def csv_to_xml(
    spark: SparkSession, src: str, dst: str, xml_format: str = "yandex_market"
) -> str:
    df = read_csv(spark, src)
    if xml_format == "yandex_market":
        return write_yml_catalog(df, dst)
    return write_simple_catalog(df, dst)


def json_to_csv(spark: SparkSession, src: str, dst: str, single_file: bool = True) -> str:
    return write_csv(
        read_json(spark, src), dst, single_file=single_file, prune=False
    )


def csv_to_json(spark: SparkSession, src: str, dst: str) -> str:
    return write_json_array(read_csv(spark, src), dst)


def convert_file(spark: SparkSession, src: str, dst: str, **options) -> str:
    """§3.2 extension dispatch: route by source extension; XML is the
    default like the reference (main.py:1802-1812)."""
    ext = os.path.splitext(src)[1].lower()
    if ext == ".csv":
        return csv_to_xml(spark, src, dst, options.get("xml_format", "yandex_market"))
    if ext in (".xlsx", ".xls"):
        from magicxml_spark.sources.excel import read_excel

        return write_csv(read_excel(spark, src), dst, prune=False, single_file=True)
    if ext == ".json":
        return json_to_csv(spark, src, dst)
    return xml_to_csv(spark, src, dst, dialect=options.get("dialect"))
