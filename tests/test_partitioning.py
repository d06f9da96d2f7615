"""Input-driven shuffle-partition sizing (plans/partitioning.py)."""

from __future__ import annotations

from magicxml_spark.plans.partitioning import (
    TARGET_PARTITION_BYTES,
    auto_shuffle_partitions,
    derive_shuffle_partitions,
    input_bytes,
    scoped_shuffle_partitions,
)
from magicxml_spark.tables import table

SF_SMOKE = "/root/testdata/sf0.001"


def test_derive_rule_boundaries():
    # tiny inputs clamp to the floor
    assert derive_shuffle_partitions(0) == 8
    assert derive_shuffle_partitions(1024) == 8
    # 10 GiB at 3x expansion / 128 MiB target = 240 partitions
    assert derive_shuffle_partitions(10 * 1024**3) == 240
    # 100 TB sizes to the ceiling unless a deployment raises it
    assert derive_shuffle_partitions(100 * 1024**4) == 200_000
    assert derive_shuffle_partitions(100 * 1024**4, ceiling=3_000_000) == 2_457_600
    # expansion and target are knobs
    assert derive_shuffle_partitions(
        10 * 1024**3, expansion=1.0, target_partition_bytes=1024**3
    ) == 10


def test_input_bytes_matches_scan(spark):
    ev = table(spark, SF_SMOKE, "events")
    got = input_bytes(ev)
    assert got > 0
    # sanity: within an order of magnitude of the raw parquet file
    import os

    raw = os.path.getsize(f"{SF_SMOKE}/events.parquet")
    assert raw // 10 <= got <= raw * 10


def test_auto_sizing_sets_conf_and_scoped_restores(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        ev = table(spark, SF_SMOKE, "events")
        n = auto_shuffle_partitions(spark, ev)
        assert n == 8  # smoke SF is far below one target partition
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        # a fabricated smaller target forces a data-driven (non-floor) answer
        n2 = auto_shuffle_partitions(spark, ev, target_partition_bytes=4096)
        assert n2 > 8
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    with scoped_shuffle_partitions(spark, table(spark, SF_SMOKE, "lineitem")) as n3:
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n3)
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


# ---------------------------------------------------------------------------
# Z-order layout: multi-dimensional file skipping
# ---------------------------------------------------------------------------


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The point of the z-curve: per-file min-max stats prune on EITHER
    interleaved dimension, while 1-D range layout prunes only its own
    sort column and round-robin layout prunes nothing."""
    import glob as _glob

    from pyspark.sql import functions as F

    from magicxml_spark.plans.layout import cluster_write, zorder_key

    n, n_files = 100_000, 16
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000003 % 1000).alias("x"),
        ((F.col("id") * 40503) % 999983 % 1000).alias("y"),
    )

    paths = {k: str(tmp_path / k) for k in ("rr", "rx", "zo")}
    df.repartition(n_files).write.parquet(paths["rr"])
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(
        paths["rx"]
    )
    cluster_write(df, "x", "y", paths["zo"], n_files)

    def overlapping(path: str, xr, yr) -> int:
        hit = 0
        for f in _glob.glob(path + "/part-*.parquet"):
            st = (
                spark.read.parquet(f)
                .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
                .collect()[0]
            )
            if st[0] is None:
                continue
            if xr and (st[1] < xr[0] or st[0] > xr[1]):
                continue
            if yr and (st[3] < yr[0] or st[2] > yr[1]):
                continue
            hit += 1
        return hit

    box_x, box_y = (100, 199), (100, 199)
    # round-robin: every file spans everything -> zero skipping
    assert overlapping(paths["rr"], box_x, box_y) == n_files
    # range-by-x: prunes the x predicate well...
    assert overlapping(paths["rx"], box_x, None) <= 3
    # ...but a y-only predicate reads EVERY file
    assert overlapping(paths["rx"], None, box_y) == n_files
    # z-order: both single-dimension predicates skip most files
    zx = overlapping(paths["zo"], box_x, None)
    zy = overlapping(paths["zo"], None, box_y)
    assert zx <= n_files // 2 and zy <= n_files // 2, (zx, zy)
    # and the conjunctive box touches only the curve's corner region
    assert overlapping(paths["zo"], box_x, box_y) <= 4
