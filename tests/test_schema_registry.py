"""Schema registry + ingest metadata cache (re-ingest fast path).

The registry exists so repeat ingests of a stable feed skip Spark XML's
structure-discovery pass (reference re-reads every feed at least twice:
preview then convert, main.py:1690-1770). These tests pin the three
load-bearing behaviors: reuse, drift fallback, and content-change
invalidation of the derived-metadata caches."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql.types import StructType

from magicxml_spark.sources import xml_source
from magicxml_spark.sources.schema_registry import (
    DEFAULT_REGISTRY,
    SchemaRegistry,
    content_key,
    meta_get,
    meta_put,
    sample_record_names,
    schema_covers,
)
from magicxml_spark.sources.xml_source import read_categories, read_xml_records

OFFER_DOC = """<?xml version='1.0' encoding='utf-8'?>
<yml_catalog date="2024-01-01"><shop>
<categories><category id="1">Root</category>
<category id="2" parentId="1">Child</category></categories>
<offers>
<offer id="10" available="1"><name>A</name><price>10.00</price>
<categoryId>2</categoryId><param name="Цвет">Red</param></offer>
<offer id="11"><name>B</name><price>20.00</price><categoryId>1</categoryId>
<param name="Цвет">Blue</param></offer>
</offers></shop></yml_catalog>"""


@pytest.fixture(autouse=True)
def _clean_registry():
    DEFAULT_REGISTRY.clear()
    yield
    DEFAULT_REGISTRY.clear()


def _write(tmp_path, body, name="feed.xml"):
    p = tmp_path / name
    p.write_text(body, encoding="utf-8")
    return str(p)


def test_registry_roundtrip_and_persistence(tmp_path):
    reg = SchemaRegistry(persist_dir=str(tmp_path / "schemas"))
    schema = StructType.fromJson(
        {"type": "struct", "fields": [
            {"name": "x", "type": "string", "nullable": True, "metadata": {}}]}
    )
    reg.put("offer", "feedA", schema)
    assert reg.get("offer", "feedA") == schema
    # a fresh registry over the same dir starts warm (JSON spill)
    reg2 = SchemaRegistry(persist_dir=str(tmp_path / "schemas"))
    assert reg2.get("offer", "feedA") == schema
    reg2.invalidate("offer", "feedA")
    assert reg2.get("offer", "feedA") is None
    assert SchemaRegistry(persist_dir=str(tmp_path / "schemas")).get(
        "offer", "feedA"
    ) is None


def test_sample_record_names_and_coverage(spark, tmp_path):
    names = sample_record_names(OFFER_DOC, "offer")
    assert names == {"_id", "_available", "name", "price", "categoryId", "param"}
    path = _write(tmp_path, OFFER_DOC)
    df, _ = read_xml_records(spark, path)
    assert schema_covers(df.schema, names)
    # a tag the feed never had is not covered
    assert not schema_covers(df.schema, names | {"vendor"})


def test_second_read_uses_registered_schema(spark, tmp_path):
    path = _write(tmp_path, OFFER_DOC)
    df1, d1 = read_xml_records(spark, path)
    assert DEFAULT_REGISTRY.get("offer", os.path.abspath(path)) is not None
    df2, d2 = read_xml_records(spark, path)
    assert d1 == d2 == "offer"
    assert df2.schema == df1.schema
    assert sorted(r["_id"] for r in df2.collect()) == ["10", "11"]


def test_schema_drift_falls_back_to_discovery(spark, tmp_path):
    path = _write(tmp_path, OFFER_DOC)
    read_xml_records(spark, path)
    grown = OFFER_DOC.replace(
        "<name>A</name>", "<name>A</name><vendor>ACME</vendor>"
    )
    time.sleep(0.01)
    _write(tmp_path, grown)
    df, _ = read_xml_records(spark, path)
    assert "vendor" in df.columns  # stale schema would have dropped it
    # and the registry now holds the refreshed schema
    assert "vendor" in DEFAULT_REGISTRY.get(
        "offer", os.path.abspath(path)
    ).fieldNames()


def test_refresh_schema_forces_discovery(spark, tmp_path):
    path = _write(tmp_path, OFFER_DOC)
    read_xml_records(spark, path)
    df, _ = read_xml_records(spark, path, refresh_schema=True)
    assert sorted(r["_id"] for r in df.collect()) == ["10", "11"]


def test_category_row_cache_replays_and_invalidates(spark, tmp_path):
    path = _write(tmp_path, OFFER_DOC)
    c1 = {(r["id"], r["parent_id"], r["name"]) for r in read_categories(spark, path).collect()}
    assert c1 == {("1", None, "Root"), ("2", "1", "Child")}
    # cached replay returns identical rows
    c2 = {(r["id"], r["parent_id"], r["name"]) for r in read_categories(spark, path).collect()}
    assert c2 == c1
    # content change -> different (path,size,mtime) key -> fresh read
    time.sleep(0.01)
    _write(
        tmp_path,
        OFFER_DOC.replace(
            "</categories>", '<category id="3" parentId="1">New</category></categories>'
        ),
    )
    c3 = {r["id"] for r in read_categories(spark, path).collect()}
    assert c3 == {"1", "2", "3"}


def test_meta_cache_content_keyed(tmp_path):
    p = _write(tmp_path, OFFER_DOC)
    key = content_key(p)
    assert key is not None
    meta_put("prune_cols", key, ["a", "b"])
    assert meta_get("prune_cols", key) == ["a", "b"]
    assert meta_get("prune_cols", None) is None
    time.sleep(0.01)
    _write(tmp_path, OFFER_DOC + " ")
    assert content_key(p) != key  # content changed -> new identity
    assert meta_get("prune_cols", content_key(p)) is None
    assert content_key(str(tmp_path)) is None  # directories have no key


def test_reingest_conversion_identical_and_content_change_reflected(spark, tmp_path):
    from magicxml_spark.plans.convert import xml_to_csv

    path = _write(tmp_path, OFFER_DOC)
    out1 = str(tmp_path / "o1.csv")
    out2 = str(tmp_path / "o2.csv")
    xml_to_csv(spark, path, out1, single_file=True)
    # steady-state re-ingest (schema + pivot keys + prune cols + category
    # paths all replay from cache) must be byte-identical
    xml_to_csv(spark, path, out2, single_file=True)
    b1 = open(out1, "rb").read()
    assert b1 == open(out2, "rb").read()
    assert b"category_path" in b1
    # grow the feed: new param key must appear (stale pivot/prune caches
    # would silently drop it)
    time.sleep(0.01)
    _write(
        tmp_path,
        OFFER_DOC.replace(
            '<param name="Цвет">Blue</param>',
            '<param name="Цвет">Blue</param><param name="Материал">Wood</param>',
        ),
    )
    out3 = str(tmp_path / "o3.csv")
    xml_to_csv(spark, path, out3, single_file=True)
    header = open(out3, encoding="utf-8-sig").readline()
    assert "Материал" in header


def test_presplit_cache_reuses_parts_dir(spark, tmp_path):
    # content-keyed presplit reuse: same bytes -> same parts dir
    big = OFFER_DOC.replace(
        "</offers>",
        "".join(
            f'<offer id="x{i}"><name>N{i}</name><price>1</price></offer>'
            for i in range(2000)
        )
        + "</offers>",
    )
    path = _write(tmp_path, big, "big.xml")
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime)
    from magicxml_spark.sources.xml_split import presplit_xml

    xml_source._PRESPLIT_CACHE.clear()
    d1 = str(tmp_path / "parts")
    presplit_xml(path, d1, "offer")
    xml_source._PRESPLIT_CACHE[key] = d1
    # read path must reuse the cached dir instead of re-splitting
    # (threshold forced low so the small fixture takes the presplit path)
    df, _ = read_xml_records(spark, path, presplit_threshold=1024)
    assert xml_source._PRESPLIT_CACHE[key] == d1
    assert df.count() == 2002
