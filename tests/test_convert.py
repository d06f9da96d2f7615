"""End-to-end conversion pipeline tests (SURVEY §3 lifecycles):
XML->CSV (flagship), CSV->XML (both formats), JSON->CSV, CSV->JSON,
plus pruning and sink format details."""

from __future__ import annotations

import csv
import io
import json
import os
import xml.etree.ElementTree as ET

import pytest

from magicxml_spark.plans.convert import (
    convert_file,
    csv_to_json,
    csv_to_xml,
    json_to_csv,
    xml_to_csv,
)
from magicxml_spark.sources.csv_source import read_csv, sniff_delimiter

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return tmp_path_factory.mktemp("convert")


def test_xml_to_csv_flagship(spark, outdir):
    out = str(outdir / "cat.csv")
    xml_to_csv(spark, f"{FIX}/cat.xml", out, single_file=True)
    raw = open(out, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM (K1)
    text = raw.decode("utf-8-sig")
    rows = list(csv.DictReader(io.StringIO(text), delimiter=";"))
    assert len(rows) == 2
    header = rows[0].keys()
    assert list(header) == sorted(header)  # Q8 sorted columns
    assert "delivery-options" not in header  # Q4 static exclude
    assert "oldprice" in header  # present for row 102
    byid = {r["attr_id"]: r for r in rows}
    assert byid["101"]["category_path"] == "Мебель///Диваны///Угловые"
    assert byid["101"]["Цвет"] == "Синий, Красный"
    assert byid["102"]["price"] == "500"


def test_csv_to_xml_yandex_roundtrip(spark, outdir):
    out = str(outdir / "out.xml")
    csv_to_xml(spark, f"{FIX}/input.csv", out, xml_format="yandex_market")
    root = ET.parse(out).getroot()
    assert root.tag == "yml_catalog"
    cats = root.findall(".//category")
    # Q9 dense ids: 2 distinct paths, first-seen order
    assert [(c.get("id"), c.text) for c in cats] == [
        ("1", "Мебель///Диваны"),
        ("2", "Мебель///Столы"),
    ]
    offers = root.findall(".//offer")
    assert [o.get("id") for o in offers] == ["1", "2", "3"]
    o1 = offers[0]
    assert o1.get("available") == "1"
    assert o1.findtext("categoryId") == "1"
    assert [p.text for p in o1.findall("picture")] == [
        "http://x/1.jpg",
        "http://x/2.jpg",
    ]
    assert o1.find("param").get("name") == "Цвет"
    # escaped quotes survive the XML trip
    assert root.findall(".//offer")[1].findtext("description") == 'Простой "стол"'


def test_csv_to_xml_simple(spark, outdir):
    out = str(outdir / "simple.xml")
    csv_to_xml(spark, f"{FIX}/input.csv", out, xml_format="simple")
    root = ET.parse(out).getroot()
    assert root.tag == "catalog"
    p1 = root.findall(".//product")[0]
    assert p1.get("id") == "1"
    assert [i.text for i in p1.findall("images/image")] == [
        "http://x/1.jpg",
        "http://x/2.jpg",
    ]
    assert p1.find("parameters/parameter").get("name") == "Цвет"


def test_json_to_csv_root_discovery(spark, outdir):
    out = str(outdir / "fromjson.csv")
    json_to_csv(spark, f"{FIX}/input.json", out)
    rows = list(
        csv.DictReader(
            io.StringIO(open(out, "rb").read().decode("utf-8-sig")), delimiter=";"
        )
    )
    # root discovery picked 'items'; nested objects dot-flattened (S8)
    assert len(rows) == 2
    assert rows[0]["nested.x"] == "10"
    assert rows[0]["name"] == "A"


def test_csv_to_json_array(spark, outdir):
    out = str(outdir / "out.json")
    csv_to_json(spark, f"{FIX}/input.csv", out)
    doc = json.loads(open(out, encoding="utf-8").read())
    assert isinstance(doc, list) and len(doc) == 3
    assert doc[0]["name"] == "Диван"


def test_convert_file_dispatch(spark, outdir):
    out = str(outdir / "dispatch.xml")
    convert_file(spark, f"{FIX}/input.csv", out)
    assert ET.parse(out).getroot().tag == "yml_catalog"


def test_delimiter_sniffing(spark):
    assert sniff_delimiter("a;b;c") == ";"
    assert sniff_delimiter("a,b,c") == ","
    assert sniff_delimiter("a,b;c;d") == ";"  # ties/less go ';'
    df = read_csv(spark, f"{FIX}/input.csv")
    assert df.columns[0] == "id" and df.count() == 3


def test_csv_to_xml_positional_id_fallback(spark, outdir, tmp_path_factory):
    # Q10: rows without an id column get positional ids 1..n
    src = tmp_path_factory.mktemp("noid") / "noid.csv"
    src.write_text("name;price\nA;1\nB;2\nC;3\n")
    out = str(outdir / "noid.xml")
    csv_to_xml(spark, str(src), out, xml_format="simple")
    root = ET.parse(out).getroot()
    assert [p.get("id") for p in root.findall(".//product")] == ["1", "2", "3"]


def test_empty_csv_rejected(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("empty") / "empty.csv"
    src.write_text("")
    with pytest.raises(ValueError, match="CSV data is empty"):
        csv_to_xml(spark, str(src), "/tmp/never.xml")


def test_csv_without_categories_to_yml(spark, outdir, tmp_path_factory):
    src = tmp_path_factory.mktemp("nocat") / "nocat.csv"
    src.write_text("id;name;price\n7;Стул;10\n")
    out = str(outdir / "nocat.xml")
    csv_to_xml(spark, str(src), out, xml_format="yandex_market")
    root = ET.parse(out).getroot()
    assert root.findall(".//category") == []
    offer = root.find(".//offer")
    assert offer.get("id") == "7" and offer.findtext("name") == "Стул"


def test_null_id_and_category_id_column(spark, outdir, tmp_path_factory):
    # empty id cell -> id="" (reference DictReader parity); an input
    # category_id column must not collide with the dimension join
    src = tmp_path_factory.mktemp("nullid") / "n.csv"
    src.write_text("id;name;category_path;category_id\n;A;X;77\n2;B;X;78\n")
    out = str(outdir / "nullid.xml")
    csv_to_xml(spark, str(src), out, xml_format="yandex_market")
    root = ET.parse(out).getroot()
    offers = root.findall(".//offer")
    assert [o.get("id") for o in offers] == ["", "2"]
    assert all(o.findtext("categoryId") == "1" for o in offers)


def test_oversized_category_dimension_stays_uncached(
    spark, outdir, tmp_path_factory, monkeypatch
):
    """VERDICT r3 #3: a category dimension larger than the driver cache
    cap must NOT be collect()ed into the conversion metadata cache
    (plans/convert.py mirrors xml_source's limit(cap+1) guard) — and the
    conversion output must be identical either way."""
    from magicxml_spark.sources import schema_registry, xml_source
    from magicxml_spark.sources.schema_registry import content_key, meta_get

    n = 8
    cats = "\n".join(
        '<category id="{}"{}>C{}</category>'.format(
            i, f' parentId="{i - 1}"' if i > 1 else "", i
        )
        for i in range(1, n + 1)
    )
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n<yml_catalog><shop>'
        f"<categories>\n{cats}\n</categories>"
        '<offers><offer id="1"><name>A</name><price>10</price>'
        f"<categoryId>{n}</categoryId></offer></offers>"
        "</shop></yml_catalog>"
    )
    src = tmp_path_factory.mktemp("bigcat") / "big.xml"
    src.write_text(xml, encoding="utf-8")

    def run(tag):
        schema_registry._META_CACHE.clear()
        xml_source._CATEGORY_CACHE.clear()
        out = str(outdir / f"bigcat_{tag}.csv")
        xml_to_csv(spark, str(src), out, single_file=True)
        return open(out, "rb").read()

    baseline = run("cached")  # cap 100k: dimension cached as before
    assert meta_get("category_paths", content_key(str(src))) is not None

    monkeypatch.setattr(xml_source, "_CATEGORY_CACHE_MAX_ROWS", n - 3)
    capped = run("uncached")  # cap 5 < 8: must stay lazy and uncached
    assert meta_get("category_paths", content_key(str(src))) is None
    assert capped == baseline
    path_col = [r for r in csv.DictReader(
        io.StringIO(capped.decode("utf-8-sig")), delimiter=";"
    )][0]["category_path"]
    assert path_col == "///".join(f"C{i}" for i in range(1, n + 1))
