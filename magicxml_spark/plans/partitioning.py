"""Input-driven shuffle-partition sizing.

``spark.sql.shuffle.partitions`` is the one knob that cannot have a
single correct static value across scales: 32 is right for this repo's
local[32] test runs, and catastrophically wrong for a 100 TB scan
(3 GB+ per shuffle partition -> executor OOM / disk spill). Instead of
hardcoding per-deployment numbers, derive the partition count from the
bytes the job will actually read:

    partitions = clamp(ceil(input_bytes * expansion / target_bytes),
                       floor, ceiling)

* ``input_bytes`` comes from Catalyst's own statistics for the plan
  (``optimizedPlan().stats().sizeInBytes``) — the same estimate the
  optimizer uses for broadcast decisions, valid on any filesystem
  (HDFS/S3/local) because it is derived from the file index, not local
  stat calls. A local-file fallback sums ``df.inputFiles()`` sizes.
* ``expansion`` (default 3x) covers parquet-compressed -> in-memory
  row-format growth; shuffle wire bytes sit between the two.
* target 128 MB per partition matches the
  ``spark.sql.files.maxPartitionBytes`` default, so scan and shuffle
  stages see similarly-sized tasks.

With AQE enabled (this engine's default, session.py) the derived value
acts as the INITIAL partition number: AQE coalesces small post-shuffle
partitions down and splits skewed ones, so overshooting is cheap and
undershooting (the real hazard of a static small default) is what this
removes. At sf0.001 the events table sizes to the floor; a 100 TB
input sizes to ~2.3M raw / whatever ``ceiling`` a deployment sets —
the same code path, no retuning.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

TARGET_PARTITION_BYTES = 128 * 1024 * 1024
BYTES_EXPANSION = 3.0


def input_bytes(df: DataFrame) -> int:
    """Best-effort input size for a plan: Catalyst stats first (works on
    any filesystem, already cached in the file index), local file sizes
    as the fallback, 0 when neither is known (pure in-memory plans)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes().toString())
        # Catalyst reports Long.MaxValue-ish sentinels for unknown sizes
        if 0 < size < (1 << 60):
            return size
    except Exception:
        pass
    total = 0
    try:
        for uri in df.inputFiles():
            p = urlparse(uri)
            if p.scheme in ("", "file"):
                total += os.path.getsize(p.path)
    except Exception:
        return 0
    return total


def derive_shuffle_partitions(
    total_bytes: int,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    expansion: float = BYTES_EXPANSION,
    floor: int = 8,
    ceiling: int = 200_000,
) -> int:
    """Pure sizing rule (unit-testable): ceil-divide expanded input
    bytes by the per-partition target, clamped to [floor, ceiling].
    The ceiling guards driver memory — 200k partition *statuses* are
    cheap, 2M are not; deployments reading >25 TB per stage should
    raise it consciously."""
    expanded = int(total_bytes * expansion)
    n = -(-expanded // target_partition_bytes) if expanded > 0 else floor
    return max(floor, min(ceiling, n))


def auto_shuffle_partitions(
    spark: SparkSession,
    *dfs: DataFrame,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    expansion: float = BYTES_EXPANSION,
    floor: int = 8,
    ceiling: int = 200_000,
) -> int:
    """Size ``spark.sql.shuffle.partitions`` for a job over ``dfs`` and
    return the chosen count. Call once per logical job, before its
    first action, with the inputs the job will shuffle."""
    total = sum(input_bytes(df) for df in dfs)
    n = derive_shuffle_partitions(
        total, target_partition_bytes, expansion, floor, ceiling
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, *dfs: DataFrame, **kw):
    """``auto_shuffle_partitions`` with restore-on-exit, for sizing one
    pipeline inside a longer-lived session (the same scoped-conf shape
    clusters.py uses for its propagation rounds)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    n = auto_shuffle_partitions(spark, *dfs, **kw)
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
