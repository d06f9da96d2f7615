"""WebDataset tar-shard SINK — the write twin of
``sources/webdataset.py`` (every source in the engine has a sink twin,
the reference's K1-K10 precedent; here the product being shipped is the
curated corpus itself).

Shape: one tar-packing pass per Spark partition (``mapInPandas`` + one
action), NO shuffle — a partition streams its samples into rolling tar
shards (a new shard starts when the current one would pass
``target_shard_bytes``; a sample is never split across shards, matching
the read side's contiguous-sample contract). Shard names are
deterministic per (partition, sequence): ``{prefix}-{pid:05d}-{seq:05d}
.tar``, so a re-run over identically partitioned input overwrites the
same files. Within a shard, member bytes/names/metadata are fully
deterministic (epoch mtime, zeroed uid/gid, 0o644), so identical input
partitions produce byte-identical shards.

Partitioning is the caller's knob, as with every distributed sink
here: ``df.repartition(n)`` (or repartitionByRange for sorted shards)
sizes the per-partition sample stream; ``target_shard_bytes`` splits
within a partition. At 100 TB this is exactly the WebDataset layout
discipline — ~1 GB shards for sequential-read throughput — produced
with one pass over the data and no exchange beyond what the caller
already chose.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WDS_MANIFEST_SCHEMA = (
    "shard string, n_samples long, n_members long, n_bytes long"
)

#: tarfile's close() appends two 512 B zero blocks, THEN pads the
#: archive up to a RECORDSIZE (10240 B) multiple. The final file size
#: is therefore exactly ceil((member_bytes + 1024) / 10240) * 10240 —
#: a flat "+10240" reserve under-counts by up to 512 B when
#: (est + 1024) % 10240 == 512 (ADVICE r8), so rollover uses the
#: exact closed-size formula instead of a reserve constant.
_TAR_END_BLOCKS = 1024  # two 512 B zero blocks
_TAR_RECORDSIZE = 10240


def _tar_closed_size(member_bytes: int) -> int:
    """Exact on-disk size of an uncompressed tar holding
    ``member_bytes`` of headers+padded payloads once closed."""
    raw = member_bytes + _TAR_END_BLOCKS
    return ((raw + _TAR_RECORDSIZE - 1) // _TAR_RECORDSIZE) * _TAR_RECORDSIZE


def _pack_member(tf: tarfile.TarFile, name: str, body: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(body)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tf.addfile(info, io.BytesIO(body))


def pack_webdataset(
    samples: DataFrame,
    path: str,
    target_shard_bytes: int = 1 << 30,
    prefix: str = "shard",
    compress: str | None = None,
    key_col: str = "sample_key",
    parts_col: str = "parts",
    exts_col: str | None = "exts",
) -> DataFrame:
    """LAZY packing plan for a sample frame (the
    ``read_webdataset_samples`` shape: ``sample_key`` + ``parts``
    map<ext, binary>, optionally ``exts`` for member order) into
    WebDataset tar shards under ``path``: one manifest row per shard
    written (shard, n_samples, n_members, n_bytes). Nothing happens
    until an action runs — use ``write_webdataset`` for the executing
    sink call. Exposed separately so the shuffle-free contract is plan
    -assertable: given pre-partitioned input the plan is scan ->
    mapInPandas with NO Exchange.

    Member names follow the convention the reader splits on:
    ``{sample_key}.{ext}``. When ``exts_col`` is present it fixes
    member order within the sample (round-trip fidelity); otherwise
    extensions are sorted. ``compress='gz'`` writes ``.tar.gz`` shards
    (the reader's ``r:*`` handles both transparently); note gz shard
    sizes are counted pre-compression against ``target_shard_bytes``
    (compressed shards only ever come out SMALLER than the target).
    Rollover checks the EXACT closed-archive size (member blocks +
    1024 B end-of-archive blocks, padded to a 10240 B record multiple
    — ``_tar_closed_size``) so uncompressed shards respect the target
    exactly, including the half-record corner a flat trailer reserve
    misses; tmp files are task-attempt-unique so speculative
    or retried attempts never interleave writes into one file.
    """
    if compress not in (None, "gz"):
        raise ValueError(f"unsupported compress={compress!r} (None or 'gz')")
    suffix = ".tar.gz" if compress == "gz" else ".tar"
    os.makedirs(path, exist_ok=True)
    cols = [key_col, parts_col] + (
        [exts_col] if exts_col and exts_col in samples.columns else []
    )
    has_exts = len(cols) == 3

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        state = {"seq": 0, "tf": None, "raw": None, "n_s": 0, "n_m": 0, "est": 0}
        out: list[tuple] = []

        def open_shard():
            os.makedirs(path, exist_ok=True)  # executor-side on a cluster
            name = f"{prefix}-{pid:05d}-{state['seq']:05d}{suffix}"
            full = os.path.join(path, name)
            # tmp name carries the task ATTEMPT id: with speculative
            # execution or a retried attempt, two attempts of the same
            # partition would otherwise open the same '.inprogress'
            # path 'wb' and interleave writes; attempt-unique tmps keep
            # every write private and the os.replace publish atomic
            # (last finisher wins with identical deterministic bytes)
            attempt = TaskContext.get().taskAttemptId()
            tmp = f"{full}.{attempt}.inprogress"
            fh = open(tmp, "wb")
            if compress == "gz":
                # tarfile's own "w:gz" stamps wall-clock time into the
                # gzip header; an explicit mtime=0 wrapper keeps shards
                # byte-deterministic for identical input
                import gzip

                gz = gzip.GzipFile(fileobj=fh, mode="wb", mtime=0, filename="")
                state["raw"] = (tmp, full, fh, gz)
                state["tf"] = tarfile.open(fileobj=gz, mode="w")
            else:
                state["raw"] = (tmp, full, fh, None)
                state["tf"] = tarfile.open(fileobj=fh, mode="w")
            state["n_s"] = state["n_m"] = state["est"] = 0

        def close_shard():
            if state["tf"] is None:
                return
            state["tf"].close()
            tmp, full, fh, gz = state["raw"]
            if gz is not None:
                gz.close()
            fh.close()
            os.replace(tmp, full)
            out.append(
                (full, state["n_s"], state["n_m"], os.path.getsize(full))
            )
            state["tf"] = None
            state["seq"] += 1

        for pdf in it:
            ext_series = pdf[exts_col] if has_exts else [None] * len(pdf)
            for key, parts, exts in zip(pdf[key_col], pdf[parts_col], ext_series):
                if parts is None:
                    continue
                # Arrow hands a Spark map back as a list of (k, v)
                # tuples; the reader's own output (pre-Arrow) is a dict
                pmap = parts if isinstance(parts, dict) else dict(parts)
                order = list(exts) if exts is not None else sorted(pmap.keys())
                members = [
                    (e, bytes(pmap[e])) for e in order if pmap.get(e) is not None
                ]
                if not members:
                    continue
                # 512 B header + payload rounded to 512 B blocks per member
                sample_bytes = sum(
                    512 + ((len(b) + 511) // 512) * 512 for _, b in members
                )
                if state["tf"] is None:
                    open_shard()
                elif (
                    _tar_closed_size(state["est"] + sample_bytes)
                    > target_shard_bytes
                ):
                    close_shard()
                    open_shard()
                for ext, body in members:
                    _pack_member(state["tf"], f"{key}.{ext}", body)
                state["n_s"] += 1
                state["n_m"] += len(members)
                state["est"] += sample_bytes
        close_shard()
        yield pd.DataFrame(
            out, columns=["shard", "n_samples", "n_members", "n_bytes"]
        )

    return samples.select(*cols).mapInPandas(pack, WDS_MANIFEST_SCHEMA)


def write_webdataset(
    samples: DataFrame,
    path: str,
    target_shard_bytes: int = 1 << 30,
    prefix: str = "shard",
    compress: str | None = None,
    key_col: str = "sample_key",
    parts_col: str = "parts",
    exts_col: str | None = "exts",
) -> list:
    """Executing sink: run the ``pack_webdataset`` plan and return the
    collected shard manifest rows — small by construction (one row per
    shard, ~1 GB of corpus each at the default target)."""
    return pack_webdataset(
        samples,
        path,
        target_shard_bytes=target_shard_bytes,
        prefix=prefix,
        compress=compress,
        key_col=key_col,
        parts_col=parts_col,
        exts_col=exts_col,
    ).collect()
