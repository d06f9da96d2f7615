"""WebDataset tar-shard source: member split, contiguous-sample
assembly (no shuffle), image-member decode triage, and the documents
projection. Shards are written with stdlib tarfile (reading is the
code under test; the container format is the stdlib's)."""

from __future__ import annotations

import io
import json
import tarfile

import pytest

from magicxml_spark.sources.webdataset import (
    iter_tar_members,
    read_webdataset,
    read_webdataset_samples,
    split_key,
    wds_image_meta,
    wds_to_documents,
)


def _mk_tar(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    buf = io.BytesIO()
    mode = "w:gz" if gz else "w"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        d = tarfile.TarInfo("imgs/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        for name, body in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            tf.addfile(ti, io.BytesIO(body))
    return buf.getvalue()


SAMPLES = [
    ("imgs/000001.png", b"\x89PNG-placeholder"),
    ("imgs/000001.txt", b"a cat sitting on a mat"),
    ("imgs/000001.json", json.dumps({"url": "http://x/1.jpg", "w": 6}).encode()),
    ("imgs/000002.seg.json", b'{"mask": []}'),
    ("imgs/000002.txt", b"two dogs running"),
    ("other/000002.txt", b"same basename, different dir"),
]


def test_split_key_convention():
    assert split_key("imgs/000001.seg.json") == ("imgs/000001", "seg.json")
    assert split_key("000001.png") == ("000001", "png")
    assert split_key("a.b") == ("a", "b")


def test_iter_tar_members_skips_dirs_and_survives_truncation():
    data = _mk_tar(SAMPLES)
    got = list(iter_tar_members(data))
    assert [g[0] for g in got] == [n for n, _ in SAMPLES]
    assert got[1][3] == b"a cat sitting on a mat"
    # size/offset are real: re-slice the raw tar at offset
    name, off, size, body = got[0]
    assert data[off : off + size] == body
    # truncate mid-member: earlier members survive
    cut = list(iter_tar_members(data[: got[3][1] - 10]))
    assert len(cut) >= 2
    # non-tar bytes -> empty, not an exception
    assert list(iter_tar_members(b"not a tar at all")) == []


@pytest.mark.parametrize("gz", [False, True], ids=["tar", "tar.gz"])
def test_read_webdataset_members(spark, tmp_path, gz):
    name = "shard-000.tar.gz" if gz else "shard-000.tar"
    (tmp_path / name).write_bytes(_mk_tar(SAMPLES, gz=gz))
    rows = read_webdataset(spark, str(tmp_path)).collect()
    assert len(rows) == 6
    by_member = {r["member"]: r for r in rows}
    r = by_member["imgs/000001.json"]
    assert r["sample_key"] == "imgs/000001" and r["ext"] == "json"
    assert bytes(by_member["imgs/000002.txt"]["content"]) == b"two dogs running"
    # multi-part extension honored
    assert by_member["imgs/000002.seg.json"]["ext"] == "seg.json"


def test_samples_assemble_contiguously_no_shuffle(spark, tmp_path):
    (tmp_path / "s.tar").write_bytes(_mk_tar(SAMPLES))
    df = read_webdataset_samples(spark, str(tmp_path))
    # the 100 TB contract: scan -> mapInPandas, NO exchange in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["sample_key"]: r for r in df.collect()}
    assert set(rows) == {"imgs/000001", "imgs/000002", "other/000002"}
    s1 = rows["imgs/000001"]
    assert s1["n_parts"] == 3 and sorted(s1["exts"]) == ["json", "png", "txt"]
    assert bytes(s1["parts"]["txt"]) == b"a cat sitting on a mat"
    # keep_exts prunes parts before they enter Arrow
    kept = read_webdataset_samples(
        spark, str(tmp_path), keep_exts=("txt",)
    ).collect()
    assert all(r["exts"] == ["txt"] for r in kept)
    assert len(kept) == 3


def test_wds_to_documents_projection(spark, tmp_path):
    (tmp_path / "s.tar").write_bytes(_mk_tar(SAMPLES))
    samples = read_webdataset_samples(spark, str(tmp_path))
    docs = wds_to_documents(samples).collect()
    by_url = {r["url"]: r for r in docs}
    # JSON sidecar url wins when present; sample key otherwise
    assert "http://x/1.jpg" in by_url
    assert by_url["http://x/1.jpg"]["text"] == "a cat sitting on a mat"
    assert "imgs/000002" in by_url and "other/000002" in by_url
    # doc_ids are distinct across dirs sharing a basename
    assert len({r["doc_id"] for r in docs}) == 3


def test_wds_image_meta_decodes_and_triages(spark, tmp_path):
    from magicxml_spark.sources.png_lite import encode_png

    w, h = 6, 4
    pix = bytes(
        v for y in range(h) for x in range(w) for v in (x * 40 % 256, y * 60 % 256, 7)
    )
    png = encode_png(w, h, "RGB", pix)
    members = [
        ("a/1.png", png),
        ("a/1.txt", b"caption"),
        ("a/2.png", b"corrupt not a png"),
        ("a/3.json", b"{}"),  # not an image ext: skipped entirely
    ]
    (tmp_path / "s.tar").write_bytes(_mk_tar(members))
    rows = {r["sample_key"]: r for r in wds_image_meta(spark, str(tmp_path)).collect()}
    assert set(rows) == {"a/1", "a/2"}
    ok = rows["a/1"]
    assert (ok["format"], ok["width"], ok["height"], ok["mode"]) == ("PNG", 6, 4, "RGB")
    assert rows["a/2"]["format"] is None  # corrupt member triaged, job alive


# ---------------------------------------------------------------------------
# Spark 4 Python Data Source packaging (format("webdataset"))
# ---------------------------------------------------------------------------


def test_datasource_members_and_partition_planning(spark, tmp_path):
    from magicxml_spark.sources.wds_datasource import WebDatasetDataSource

    spark.dataSource.register(WebDatasetDataSource)
    (tmp_path / "shard-000.tar").write_bytes(_mk_tar(SAMPLES[:3]))
    (tmp_path / "shard-001.tar").write_bytes(_mk_tar(SAMPLES[3:]))
    df = spark.read.format("webdataset").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    # one partition per shard: the task count is the shard count
    assert df.rdd.getNumPartitions() == 2
    by_member = {r["member"]: r for r in rows}
    assert by_member["imgs/000002.seg.json"]["ext"] == "seg.json"
    assert bytes(by_member["imgs/000001.txt"]["content"]) == b"a cat sitting on a mat"
    assert by_member["imgs/000001.txt"]["shard"].endswith("shard-000.tar")


def test_datasource_samples_mode(spark, tmp_path):
    from magicxml_spark.sources.wds_datasource import WebDatasetDataSource

    spark.dataSource.register(WebDatasetDataSource)
    (tmp_path / "s.tar.gz").write_bytes(_mk_tar(SAMPLES, gz=True))
    df = (
        spark.read.format("webdataset")
        .option("mode", "samples")
        .option("keep_exts", "txt,json")
        .load(str(tmp_path))
    )
    rows = {r["sample_key"]: r for r in df.collect()}
    assert set(rows) == {"imgs/000001", "imgs/000002", "other/000002"}
    assert sorted(rows["imgs/000001"]["exts"]) == ["json", "txt"]  # png pruned
    assert bytes(rows["imgs/000002"]["parts"]["txt"]) == b"two dogs running"
