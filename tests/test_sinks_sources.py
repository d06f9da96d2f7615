"""Sinks/sources unit tests: pruning, JSON envelope, K7 conventions,
binary stubs, path guard, Excel gating."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from magicxml_spark.operators.pruning import prune_columns, select_output_columns
from magicxml_spark.sinks.delivery import validated_file_path
from magicxml_spark.sinks.json_sink import (
    write_json_envelope,
    xml_records_to_json,
)
from magicxml_spark.sources.binary_docs import (
    extract_image_meta,
    extract_pdf_tables,
    png_to_jpg,
    read_binary,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_prune_columns(spark):
    df = spark.createDataFrame(
        [("a", "", "Undefined", "x", "1", "keep"), ("b", " ", "Undefined", "y", "2", "")],
        schema="name string, blank string, undef string, `z.col` string, "
        "`42` string, `Размер` string",
    )
    cols = select_output_columns(df)
    assert "blank" not in cols  # Q5 all-blank
    assert "undef" not in cols  # Q5 all-Undefined
    assert "42" not in cols  # Q7 digit-named
    assert "Размер" in cols  # Q6 important override
    assert cols == sorted(cols)  # Q8
    assert prune_columns(df).columns == cols


def test_json_envelope(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("n"))
    out = str(tmp_path / "env.json")
    write_json_envelope(df, out, exported_at="2024-01-01T00:00:00")
    doc = json.loads(open(out).read())
    assert doc["total"] == 3
    assert [d["n"] for d in doc["data"]] == [0, 1, 2]
    assert doc["exported_at"] == "2024-01-01T00:00:00"


def test_xml_to_json_conventions(spark):
    df, _ = __import__(
        "magicxml_spark.sources.xml_source", fromlist=["read_xml_records"]
    ).read_xml_records(spark, f"{FIX}/cat.xml")
    docs = [json.loads(r["json"]) for r in xml_records_to_json(df).collect()]
    byid = {d["@id"]: d for d in docs}
    assert byid["101"]["@available"] == "1"  # @attr prefix (K7)
    assert byid["101"]["param"][0]["#text"] == "Синий"  # #text + list promotion
    assert byid["101"]["param"][0]["@name"] == "Цвет"


@pytest.fixture(scope="module")
def binary_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bin")
    for i in range(3):
        (d / f"doc{i}.bin").write_bytes(bytes([i]) * (10 + i))
    return read_binary(spark, str(d)).localCheckpoint()


def test_binary_stub_pipelines(binary_df):
    tables = extract_pdf_tables(binary_df, deterministic_stub=True)
    assert tables.count() == 3
    assert tables.columns == ["path", "pdf_page", "table_number", "cell_row", "cell_json"]
    meta = extract_image_meta(binary_df, deterministic_stub=True)
    assert meta.filter(F.col("width") > 0).count() == 3
    jpg = png_to_jpg(binary_df, deterministic_stub=True)
    row = jpg.collect()[0]
    assert isinstance(row["jpg_content"], (bytes, bytearray))
    # determinism: same bytes -> same stub output
    again = png_to_jpg(binary_df, deterministic_stub=True).collect()[0]
    assert row["jpg_content"] == again["jpg_content"]


def test_path_guard(tmp_path):
    (tmp_path / "ok.csv").write_text("x")
    assert validated_file_path(str(tmp_path), "ok.csv").name == "ok.csv"
    for bad in ("../etc/passwd", "a/b.csv", "..\\win", "missing.csv"):
        with pytest.raises((ValueError, FileNotFoundError)):
            validated_file_path(str(tmp_path), bad)


def test_excel_gated(spark, tmp_path):
    from magicxml_spark.sources import excel

    try:
        import openpyxl  # noqa: F401

        have = True
    except ImportError:
        have = False
    if not have:
        with pytest.raises(NotImplementedError):
            excel.read_excel(spark, str(tmp_path / "x.xlsx"))
    else:
        df = spark.createDataFrame([("a", "1")], ["c1", "c2"])
        out = str(tmp_path / "x.xlsx")
        excel.write_excel(df, out)
        assert excel.read_excel(spark, out).count() == 1


def test_encoding_cascade_1251(spark, tmp_path):
    """S2: windows-1251 XML decodes through the cascade end-to-end."""
    from magicxml_spark.plans.convert import xml_to_csv

    xml = "<offers><offer id='1'><name>Привет Мир</name><price>5</price></offer></offers>"
    src = tmp_path / "cp1251.xml"
    src.write_bytes(xml.encode("windows-1251"))
    # driver-side sample decode accepts it; the Spark XML read needs the
    # file in utf-8, so re-encode through the fetch/decode shim first
    from magicxml_spark.sources.xml_source import decode_bytes

    text = decode_bytes(src.read_bytes())
    utf = tmp_path / "utf.xml"
    utf.write_text(text, encoding="utf-8")
    out = xml_to_csv(spark, str(utf), str(tmp_path / "out.csv"))
    body = open(out, encoding="utf-8-sig").read()
    assert "Привет Мир" in body


def test_multimodal_resize_and_frames(binary_df):
    from magicxml_spark.sources.binary_docs import resize_images, sample_video_frames

    resized = resize_images(binary_df, 4, 4, deterministic_stub=True).collect()
    assert all(len(r["resized"]) == 16 for r in resized)
    frames = sample_video_frames(
        binary_df, every_n=10, max_frames=3, deterministic_stub=True
    )
    rows = frames.collect()
    assert len(rows) == 9  # 3 files x 3 frames
    assert sorted({r["frame_index"] for r in rows}) == [0, 10, 20]
    # per-frame bytes deterministic and distinct per index
    one = [r for r in rows if r["path"] == rows[0]["path"]]
    assert len({bytes(r["frame"]) for r in one}) == 3


def test_multimodal_audio_chunking(binary_df):
    from magicxml_spark.sources.binary_docs import chunk_audio

    # stub treats 1 byte = 1 sample @16k; chunk 0.001s -> multiple chunks
    chunks = chunk_audio(
        binary_df, chunk_seconds=0.001, sample_rate=16_000,
        max_chunks=3, deterministic_stub=True,
    ).collect()
    by_path: dict[str, list] = {}
    for r in chunks:
        by_path.setdefault(r["path"], []).append(r)
    for path, rows in by_path.items():
        rows.sort(key=lambda r: r["chunk_index"])
        assert [r["chunk_index"] for r in rows] == list(range(len(rows)))
        assert all(r["sample_rate"] == 16_000 for r in rows)
        # chunk boundaries tile [0, total) without overlap
        for a, b in zip(rows, rows[1:]):
            assert b["start_s"] == round(a["start_s"] + 0.001, 3)
        # per-chunk bytes deterministic and distinct per index
        assert len({bytes(r["pcm"]) for r in rows}) == len(rows)
    # determinism across invocations
    again = chunk_audio(
        binary_df, chunk_seconds=0.001, sample_rate=16_000,
        max_chunks=3, deterministic_stub=True,
    ).collect()
    assert sorted((r["path"], r["chunk_index"], bytes(r["pcm"])) for r in again) == \
        sorted((r["path"], r["chunk_index"], bytes(r["pcm"])) for r in chunks)


def test_presplit_ignores_comments_and_selfclose(tmp_path):
    from magicxml_spark.sources.xml_split import presplit_xml

    doc = (
        "<offers><offer id='1'><a>x</a><!-- <offer promo> --><b>y</b></offer>"
        "<offer id='2'/></offers>"
    )
    src = tmp_path / "c.xml"
    src.write_text(doc)
    parts = presplit_xml(str(src), str(tmp_path / "parts"), "offer", records_per_part=10)
    import xml.etree.ElementTree as ET

    root = ET.parse(parts[0]).getroot()
    recs = root.findall("offer")
    assert len(recs) == 2
    assert recs[0].findtext("b") == "y"  # comment did not truncate record 1
    assert recs[1].get("id") == "2"  # self-closing record kept clean


def test_presplit_streams_bounded_memory(tmp_path):
    """The scanner must never hold the whole file: records are yielded
    incrementally from pathologically small read chunks (1-3 chars), with
    comments/CDATA/nesting straddling every chunk boundary."""
    import io

    from magicxml_spark.sources.xml_split import _iter_records, presplit_xml

    doc = (
        "<offers>"
        + "".join(
            f"<offer id='{i}'><!-- </offer> --><p><![CDATA[</offer>]]></p></offer>"
            for i in range(50)
        )
        + "</offers>"
    )
    for chunk in (1, 3, 64):
        recs = list(_iter_records(io.StringIO(doc), "offer", chunk=chunk))
        assert len(recs) == 50
        assert all(r.startswith("<offer id=") and r.endswith("</offer>") for r in recs)

    src = tmp_path / "big.xml"
    src.write_text(doc)
    parts = presplit_xml(str(src), str(tmp_path / "parts"), "offer", records_per_part=20)
    assert len(parts) == 3  # 20 + 20 + 10
    import xml.etree.ElementTree as ET

    totals = [len(ET.parse(p).getroot().findall("offer")) for p in parts]
    assert totals == [20, 20, 10]
