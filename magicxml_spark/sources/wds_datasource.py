"""Spark 4 Python Data Source for WebDataset tar shards.

``spark.read.format("webdataset").load(dir)`` — the idiomatic Spark
packaging of sources/webdataset.py, and the SCALE path for big shards:

* **Partition planning**: one input partition per shard file, planned
  on the driver from a directory listing — N shards -> N tasks, the
  parallelism WebDataset was designed around.
* **Streaming reads**: each task opens its shard with tarfile's
  sequential mode (``r|*``), yielding member (or sample) rows as the
  tar streams — the ~1 GB shard is NEVER materialized as a single
  in-memory row, unlike the ``binaryFile`` route where the whole file
  becomes one Arrow cell before the tar walk starts.

Options: ``mode`` = ``members`` (default, one row per tar member) or
``samples`` (one row per contiguous sample group); ``keep_exts`` =
comma-separated extension filter for samples mode.

Register once per session::

    from magicxml_spark.sources.wds_datasource import WebDatasetDataSource
    spark.dataSource.register(WebDatasetDataSource)
    df = spark.read.format("webdataset").option("mode", "samples").load(dir)
"""

from __future__ import annotations

import glob as globlib
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from magicxml_spark.sources.webdataset import split_key

_MEMBER_DDL = (
    "shard string, sample_key string, ext string, member string, "
    "offset long, size long, content binary"
)
_SAMPLE_DDL = (
    "shard string, sample_key string, n_parts int, exts array<string>, "
    "parts map<string, binary>"
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WebDatasetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("webdataset source requires a path: .load(<dir>)")
        self.glob = options.get("glob", "*.tar*")
        self.mode = options.get("mode", "members")
        keep = options.get("keep_exts")
        self.keep = tuple(e.strip() for e in keep.split(",")) if keep else None

    def partitions(self) -> list[_ShardPartition]:
        # one partition per shard: the task count IS the shard count,
        # planned from one driver-side listing (no data read here)
        if os.path.isfile(self.path):
            files = [self.path]
        else:
            files = sorted(globlib.glob(os.path.join(self.path, self.glob)))
        if not files:
            raise ValueError(f"no shards match {self.path}/{self.glob}")
        return [_ShardPartition(f) for f in files]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        # r|* = strictly sequential tar stream: members decompress and
        # yield as the file is read; peak memory is one member, not one
        # shard. offset_data is unavailable in stream mode -> -1.
        with tarfile.open(partition.path, mode="r|*") as tf:
            if self.mode == "samples":
                yield from self._samples(partition.path, tf)
            else:
                for m in tf:
                    if not m.isfile():
                        continue
                    f = tf.extractfile(m)
                    if f is None:
                        continue
                    key, ext = split_key(m.name)
                    off = m.offset_data if m.offset_data is not None else -1
                    yield (partition.path, key, ext, m.name, off, m.size, f.read())

    def _samples(self, shard: str, tf: tarfile.TarFile) -> Iterator[tuple]:
        cur_key: str | None = None
        parts: list[tuple[str, bytes]] = []

        def emit():
            kept = [(e, b) for e, b in parts if self.keep is None or e in self.keep]
            if kept:
                return (shard, cur_key, len(kept), [e for e, _ in kept], dict(kept))
            return None

        for m in tf:
            if not m.isfile():
                continue
            f = tf.extractfile(m)
            if f is None:
                continue
            key, ext = split_key(m.name)
            if key != cur_key:
                if cur_key is not None:
                    row = emit()
                    if row:
                        yield row
                cur_key, parts = key, []
            parts.append((ext, f.read()))
        if cur_key is not None:
            row = emit()
            if row:
                yield row


class WebDatasetDataSource(DataSource):
    """Register with ``spark.dataSource.register(WebDatasetDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        return (
            _SAMPLE_DDL
            if self.options.get("mode", "members") == "samples"
            else _MEMBER_DDL
        )

    def reader(self, schema) -> WebDatasetReader:
        return WebDatasetReader(dict(self.options))
