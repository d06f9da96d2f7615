"""WebDataset tar-shard source — the de-facto sharded container for
multimodal (image/audio/text) training corpora.

Not a reference feature (the reference ingests catalog XML/CSV); this
is part of the LLM-data-pipeline extension alongside the WARC source:
training sets ship as directories of ``shard-00042.tar`` files whose
members follow the public WebDataset convention — every file belonging
to one sample shares a key (the member basename up to its FIRST dot),
the remainder is the extension (``img1.png`` + ``img1.cls`` +
``img1.seg.json`` form one 3-part sample), and a sample's members are
CONTIGUOUS within the shard.

Spark shape: ``binaryFile`` ingest -> ``mapInPandas`` (Arrow batches,
one task per shard — embarrassingly parallel across shards, the unit
WebDataset already sizes at ~1 GB for sequential-read throughput).
Because members of a sample are contiguous, ``read_webdataset_samples``
assembles one row per SAMPLE inside the tar walk — NO shuffle; the
member-level reader + a groupBy would pay a full exchange for a
grouping the container format already guarantees.

Container parsing is stdlib ``tarfile`` (ustar/GNU/PAX, gzip/bz2/xz
transparently via ``r:*``); payload decoding stays opt-in: image
members decode through image_lite (PNG/BMP/GIF/JPEG/TIFF — the same
pure-stdlib codecs the S11 source uses), everything else passes
through as binary.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WDS_MEMBER_SCHEMA = (
    "shard string, sample_key string, ext string, member string, "
    "offset bigint, size bigint, content binary"
)

WDS_SAMPLE_SCHEMA = (
    "shard string, sample_key string, n_parts int, exts array<string>, "
    "parts map<string, binary>"
)

WDS_IMAGE_META_SCHEMA = (
    "shard string, sample_key string, ext string, format string, "
    "width int, height int, mode string, size bigint"
)

# member extensions image_lite can actually decode (sniffed by magic
# bytes anyway — the ext list only picks which members to TRY)
_IMAGE_EXTS = ("png", "jpg", "jpeg", "bmp", "gif", "tif", "tiff")


def split_key(name: str) -> tuple[str, str]:
    """WebDataset key convention: basename up to the FIRST dot is the
    sample key, the rest is the (possibly multi-part) extension —
    ``dir/img1.seg.json`` -> (``dir/img1``, ``seg.json``). The leading
    directory stays on the key so two dirs can't collide."""
    d, base = os.path.split(name)
    key, _, ext = base.partition(".")
    return (os.path.join(d, key) if d else key), ext


def iter_tar_members(data: bytes) -> Iterator[tuple[str, int, int, bytes]]:
    """(name, data_offset, size, content) per REGULAR member.
    Directories, links, and zero-byte padding members are skipped;
    a truncated tail yields the members before it (sharded sets are
    routinely cut mid-upload)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:*")
    except tarfile.TarError:
        return
    with tf:
        while True:
            try:
                m = tf.next()
            except tarfile.TarError:
                return  # truncated/corrupt tail: keep what parsed
            if m is None:
                return
            if not m.isfile():
                continue
            f = tf.extractfile(m)
            if f is None:
                continue
            yield m.name, m.offset_data, m.size, f.read()


def read_webdataset(
    spark: SparkSession, path: str, glob: str = "*.tar*"
) -> DataFrame:
    """One row per tar member across every shard under ``path``, with
    the WebDataset (sample_key, ext) split applied. Member-level view —
    use ``read_webdataset_samples`` for the one-row-per-sample shape."""
    from magicxml_spark.sources.binary_docs import read_binary

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for name, off, size, body in iter_tar_members(bytes(content)):
                    key, ext = split_key(name)
                    rows.append((path_, key, ext, name, off, size, body))
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard",
                    "sample_key",
                    "ext",
                    "member",
                    "offset",
                    "size",
                    "content",
                ],
            )

    return read_binary(spark, path, glob).mapInPandas(batches, WDS_MEMBER_SCHEMA)


def read_webdataset_samples(
    spark: SparkSession,
    path: str,
    glob: str = "*.tar*",
    keep_exts: tuple[str, ...] | None = None,
) -> DataFrame:
    """One row per SAMPLE: ``parts`` maps extension -> member bytes.

    Grouping happens inside the tar walk (samples are contiguous by
    the format's contract), so the plan is scan -> mapInPandas with NO
    exchange — at 100 TB the alternative (member rows + groupBy key)
    shuffles the entire corpus to reassemble what the container
    already stored together. ``keep_exts`` prunes parts early (column
    pruning's byte-level analog: drop the .pyd/.info sidecars before
    they enter Arrow)."""
    from magicxml_spark.sources.binary_docs import read_binary

    keep = tuple(keep_exts) if keep_exts else None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                cur_key: str | None = None
                parts: list[tuple[str, bytes]] = []

                def flush():
                    if cur_key is not None and parts:
                        kept = [(e, b) for e, b in parts if keep is None or e in keep]
                        if kept:
                            rows.append(
                                (
                                    path_,
                                    cur_key,
                                    len(kept),
                                    [e for e, _ in kept],
                                    dict(kept),
                                )
                            )

                for name, _, _, body in iter_tar_members(bytes(content)):
                    key, ext = split_key(name)
                    if key != cur_key:
                        flush()
                        cur_key, parts = key, []
                    parts.append((ext, body))
                flush()
            yield pd.DataFrame(
                rows,
                columns=["shard", "sample_key", "n_parts", "exts", "parts"],
            )

    return read_binary(spark, path, glob).mapInPandas(batches, WDS_SAMPLE_SCHEMA)


def wds_image_meta(spark: SparkSession, path: str, glob: str = "*.tar*") -> DataFrame:
    """Decode-verify pass over image members: (format, width, height,
    mode) per image through image_lite's pure-stdlib codecs — the
    corrupt-sample triage step of a multimodal ingest (undecodable
    members surface as format NULL rather than failing the job)."""
    from magicxml_spark.sources.binary_docs import read_binary
    from magicxml_spark.sources.image_lite import decode_image

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for name, _, size, body in iter_tar_members(bytes(content)):
                    key, ext = split_key(name)
                    if ext.rsplit(".", 1)[-1].lower() not in _IMAGE_EXTS:
                        continue
                    dec = decode_image(body)
                    if dec is None:
                        rows.append((path_, key, ext, None, None, None, None, size))
                    else:
                        fmt, w, h, mode, _ = dec
                        rows.append((path_, key, ext, fmt, w, h, mode, size))
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard",
                    "sample_key",
                    "ext",
                    "format",
                    "width",
                    "height",
                    "mode",
                    "size",
                ],
            )

    return read_binary(spark, path, glob).mapInPandas(
        batches, WDS_IMAGE_META_SCHEMA
    )


def wds_to_documents(
    samples: DataFrame,
    text_ext: str = "txt",
    meta_ext: str = "json",
) -> DataFrame:
    """Project text-bearing samples into the pipeline's ``documents``
    shape (doc_id, url, text) — the bridge onto the dedup / quality /
    curation operators. ``url`` comes from the JSON sidecar's ``url``
    field when present (the LAION/img2dataset layout), else the sample
    key. Pure-Column transforms over the sample map — no extra Python
    stage."""
    text = F.col("parts").getItem(text_ext).cast("string")
    meta = F.col("parts").getItem(meta_ext).cast("string")
    url = F.coalesce(
        F.get_json_object(meta, "$.url"),
        F.col("sample_key"),
    )
    return (
        samples.filter(F.map_contains_key("parts", text_ext))
        .select(
            F.xxhash64(F.concat_ws("/", "shard", "sample_key")).alias("doc_id"),
            url.alias("url"),
            text.alias("text"),
        )
    )
