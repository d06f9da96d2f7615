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


def test_excel_roundtrip_real_path(spark, tmp_path):
    """S7/K5 are REAL in every environment: openpyxl when present,
    xlsx_lite (pure-stdlib ECMA-376 subset) otherwise. Write a
    DataFrame with unicode, XML-special chars, and empties, read it
    back, and get identical strings."""
    from magicxml_spark.sources import excel

    rows = [
        ("Диван «Мечта»", "1234.50", 'quote " amp & lt <'),
        ("", "500", "semi;colon"),
    ]
    df = spark.createDataFrame(rows, ["name", "price", "notes"])
    out = str(tmp_path / "x.xlsx")
    assert excel.write_excel(df, out) == out
    back = excel.read_excel(spark, out)
    assert back.columns == ["name", "price", "notes"]
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_xlsx_lite_package_structure_and_widths(tmp_path):
    """The lite writer emits a complete OOXML package (content types,
    package+workbook rels, workbook, sheet) and the reference's
    auto-width rule min(max_len + 2, 50) (main.py:683-718)."""
    import zipfile
    import xml.etree.ElementTree as ET

    from magicxml_spark.sources import xlsx_lite

    out = str(tmp_path / "w.xlsx")
    xlsx_lite.write_rows(out, ["short", "long"], [["ab", "x" * 200]])
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
        assert {
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/worksheets/sheet1.xml",
        } <= names
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    widths = [c.get("width") for c in sheet.iter(f"{ns}col")]
    assert widths == ["7", "50"]  # len('short')+2, capped at 50


def test_xlsx_lite_reads_shared_strings_and_sparse_rows(tmp_path):
    """Reader compatibility with files real Excel writes: shared-string
    cells (t='s'), numbers, booleans, and sparse rows addressed only by
    cell reference — hand-built package, no writer round-trip crutch."""
    import zipfile

    from magicxml_spark.sources import xlsx_lite

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    out = str(tmp_path / "ext.xlsx")
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c></row>'
        # sparse row: B2 missing entirely; C2 numeric; D2 boolean
        '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="C2"><v>42.5</v></c>'
        '<c r="D2" t="b"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        f'<sst xmlns="{ns}" count="4" uniqueCount="4">'
        "<si><t>id</t></si><si><t>name</t></si><si><t>val</t></si>"
        "<si><r><t>rich</t></r><r><t> text</t></r></si></sst>"
    )
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr("[Content_Types].xml", xlsx_lite._CONTENT_TYPES)
        zf.writestr("_rels/.rels", xlsx_lite._PKG_RELS)
        zf.writestr("xl/workbook.xml", xlsx_lite._workbook_xml("S1"))
        zf.writestr("xl/_rels/workbook.xml.rels", xlsx_lite._WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    header, rows = xlsx_lite.read_rows(out)
    assert header == ["id", "name", "val", ""]
    assert rows == [["rich text", "", "42.5", "True"]]


def test_convert_file_xlsx_to_csv(spark, tmp_path):
    """§3.2 extension dispatch: .xlsx -> ';'-CSV end-to-end over the
    real Excel path."""
    import csv
    import io

    from magicxml_spark.plans.convert import convert_file
    from magicxml_spark.sources import excel

    df = spark.createDataFrame([("1", "Стул"), ("2", "Стол")], ["id", "name"])
    src = str(tmp_path / "in.xlsx")
    excel.write_excel(df, src)
    dst = str(tmp_path / "out.csv")
    convert_file(spark, src, dst)
    text = open(dst, "rb").read().decode("utf-8-sig")
    rows = list(csv.DictReader(io.StringIO(text), delimiter=";"))
    assert {(r["id"], r["name"]) for r in rows} == {("1", "Стул"), ("2", "Стол")}


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


# ---------------------------------------------------------------------------
# WARC web-archive source (round 5: Common Crawl-shaped ingestion)
# ---------------------------------------------------------------------------


def _make_warc(records, per_record_gzip=False, whole_gzip=False):
    """Independent in-test WARC writer (ISO 28500 layout): records =
    [(warc_type, uri, date, http_status, content_type, body_bytes)]."""
    import gzip as _gz

    out = b""
    for i, (wtype, uri, date, status, ctype, body) in enumerate(records):
        if status is not None:
            block = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        else:
            block = body
        head = (
            f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
            + (f"WARC-Date: {date}\r\n" if date else "")
            + f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        rec = head + block + b"\r\n\r\n"
        out += _gz.compress(rec) if per_record_gzip else rec
    if whole_gzip:
        out = _gz.compress(out)
    return out


_WARC_RECORDS = [
    ("warcinfo", None, "2026-01-02T03:04:05Z", None, None, b"software: testcrawler\r\n"),
    (
        "response",
        "https://example.com/a",
        "2026-01-02T03:04:06Z",
        200,
        "text/html; charset=utf-8",
        b"<html><body><h1>Title</h1><p>Hello &amp; welcome</p>"
        b"<script>ignored()</script></body></html>",
    ),
    (
        "response",
        "https://example.com/b",
        "2026-01-02T03:04:07Z",
        404,
        "text/html",
        b"<html><body>not found</body></html>",
    ),
    (
        "response",
        "https://example.com/img",
        "2026-01-02T03:04:08Z",
        200,
        "image/png",
        b"\x89PNGfakebytes",
    ),
    ("request", "https://example.com/a", "2026-01-02T03:04:06Z", None, None, b"GET /a HTTP/1.1\r\n"),
]


def test_warc_source_plain_and_gzip(spark, tmp_path):
    """read_warc: response filtering, HTTP envelope split, HTML->text
    through the P17 cleaner, non-HTML payload kept binary; identical
    rows from plain, per-record-gzip (Common Crawl layout), and
    whole-file-gzip archives."""
    from magicxml_spark.sources.warc import read_warc

    (tmp_path / "plain.warc").write_bytes(_make_warc(_WARC_RECORDS))
    (tmp_path / "member.warc.gz").write_bytes(
        _make_warc(_WARC_RECORDS, per_record_gzip=True)
    )
    (tmp_path / "whole.warc.gz").write_bytes(
        _make_warc(_WARC_RECORDS, whole_gzip=True)
    )
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["warc_file"].rsplit("/", 1)[-1], []).append(r)
    assert set(by_file) == {"plain.warc", "member.warc.gz", "whole.warc.gz"}
    for fname, rs in by_file.items():
        rs = sorted(rs, key=lambda r: r["record_offset"])
        assert [r["warc_type"] for r in rs] == ["response"] * 3, fname
        a, b, img = rs
        assert a["target_uri"] == "https://example.com/a"
        assert a["http_status"] == 200
        assert a["http_content_type"].startswith("text/html")
        assert "Hello & welcome" in a["text"] and "ignored" not in a["text"]
        assert b["http_status"] == 404
        assert img["text"] is None
        assert bytes(img["payload"]) == b"\x89PNGfakebytes"

    # all record types on request
    all_rows = read_warc(
        spark, str(tmp_path), glob="plain.warc", record_types=()
    ).collect()
    assert sorted({r["warc_type"] for r in all_rows}) == [
        "request",
        "response",
        "warcinfo",
    ]


def test_warc_to_documents_projection(spark, tmp_path):
    """warc_to_documents: 200 + html only, stable digest ids, parsed
    fetch timestamp — the handoff row shape for the dedup/quality
    operators."""
    from magicxml_spark.sources.warc import read_warc, warc_to_documents

    (tmp_path / "c.warc").write_bytes(_make_warc(_WARC_RECORDS))
    docs = warc_to_documents(read_warc(spark, str(tmp_path))).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["url"] == "https://example.com/a"
    assert d["fetched_at"] is not None and d["fetched_at"].year == 2026
    assert "Hello & welcome" in d["text"]
    assert isinstance(d["doc_id"], int)


def test_warc_truncated_tail_keeps_prior_records():
    from magicxml_spark.sources.warc import iter_warc_records

    good = _make_warc(_WARC_RECORDS[:2])
    truncated = good + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Le"
    recs = list(iter_warc_records(truncated))
    assert len(recs) == 2


# ---------------------------------------------------------------------------
# RIFF media: real WAV audio chunking + MJPEG-AVI frame sampling
# ---------------------------------------------------------------------------


def test_wav_chunk_audio_real_path(spark, tmp_path):
    """chunk_audio is REAL for integer-PCM WAV: true duration from the
    sample count, chunk boundaries at exact sample positions, chunk
    payload = the actual PCM slice (byte-verified), file's own rate."""
    import struct as st

    from magicxml_spark.sources.binary_docs import chunk_audio, read_binary
    from magicxml_spark.sources.riff_media import decode_wav, encode_wav

    rate, seconds = 8000, 2.5
    n = int(rate * seconds)
    pcm = b"".join(
        st.pack("<h", int(10000 * ((i * 37) % 200 - 100) / 100)) for i in range(n)
    )
    wav = encode_wav(rate, 1, 16, pcm)
    assert decode_wav(wav) == (rate, 1, 16, n, pcm)
    (tmp_path / "tone.wav").write_bytes(wav)

    rows = sorted(
        chunk_audio(read_binary(spark, str(tmp_path)), chunk_seconds=1.0).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert len(rows) == 3  # 2.5 s at 1 s chunks
    assert [r["sample_rate"] for r in rows] == [rate] * 3
    assert (rows[0]["start_s"], rows[0]["end_s"]) == (0.0, 1.0)
    assert (rows[2]["start_s"], rows[2]["end_s"]) == (2.0, 2.5)
    assert bytes(rows[0]["pcm"]) == pcm[: rate * 2]
    assert bytes(rows[2]["pcm"]) == pcm[2 * rate * 2 :]
    # stereo 8-bit also decodes
    st8 = encode_wav(4000, 2, 8, bytes(range(256)) * 10)
    assert decode_wav(st8)[0:3] == (4000, 2, 8)
    # junk stays gated (None -> stub/raise path)
    assert decode_wav(b"RIFFjunk") is None

    # sub-frame chunk_seconds (chunk_seconds*rate < 1) must clamp to
    # one frame per chunk — never emit degenerate empty [0,0) slices
    tiny = sorted(
        chunk_audio(
            read_binary(spark, str(tmp_path)),
            chunk_seconds=1e-6,
            max_chunks=4,
        ).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert len(tiny) == 4
    for i, r in enumerate(tiny):
        assert bytes(r["pcm"]) == pcm[i * 2 : (i + 1) * 2]  # exactly 1 frame


def test_mjpeg_avi_frame_sampling_real_path(spark, tmp_path):
    """sample_video_frames is REAL for Motion-JPEG AVI: frames come
    back as the embedded JPEG bytes (decodable by jpeg_lite), sampled
    every_n with the max_frames cap; avi_info reads the header."""
    import numpy as np

    from magicxml_spark.sources.binary_docs import read_binary, sample_video_frames
    from magicxml_spark.sources.jpeg_lite import decode_jpeg, encode_jpeg
    from magicxml_spark.sources.riff_media import (
        avi_info,
        encode_mjpeg_avi,
        iter_mjpeg_frames,
    )

    rng = np.random.default_rng(11)
    w, h = 16, 12
    frames = [
        encode_jpeg(w, h, "RGB", bytes(rng.integers(0, 256, w * h * 3, dtype=np.uint8)))
        for _ in range(7)
    ]
    avi = encode_mjpeg_avi(frames, w, h, fps=10)
    info = avi_info(avi)
    assert info["total_frames"] == 7 and (info["width"], info["height"]) == (w, h)
    assert [f for _, f in iter_mjpeg_frames(avi)] == frames

    (tmp_path / "clip.avi").write_bytes(avi)
    rows = sorted(
        sample_video_frames(
            read_binary(spark, str(tmp_path)), every_n=3, max_frames=2
        ).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in rows] == [0, 3]
    for r in rows:
        dw, dh, mode, _ = decode_jpeg(bytes(r["frame"]))
        assert (dw, dh, mode) == (w, h, "RGB")
    assert bytes(rows[1]["frame"]) == frames[3]
