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
