"""SparkSession factory.

One place to encode the execution-model decisions that matter at 100 TB:
AQE on (runtime coalescing + skew-join handling), shuffle partitions
sized to the environment instead of the 200 default, Arrow transfer for
the pandas-UDF slow path, UTC session timezone so results are comparable
with external engines (DuckDB oracle, parquet readers).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "magicxml-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    In local mode the driver JVM is the whole cluster; on a real
    cluster every setting here still applies (AQE re-plans shuffles at
    runtime, so ``shuffle_partitions`` is an upper bound, not a tuning
    cliff).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]" if cpus else "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus or "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the reference's record dicts are case-sensitive ('ID' and 'id'
        # are distinct columns, main.py:447); Spark's default
        # case-insensitive resolution would make them ambiguous
        .config("spark.sql.caseSensitive", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long, converted in tables.table()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_persisted_rdds(spark: SparkSession) -> int:
    """Unpersist (non-blocking) every RDD still registered in the
    context's persistent-RDD map and return how many were released.

    Why this exists: the engine materializes multi-consumer
    intermediates with ``localCheckpoint`` (plan-truncation, guide §5),
    and in a long-lived session those checkpointed RDD blocks are NOT
    reclaimed when the Python DataFrame goes out of scope — measured:
    ~8-10 persistent RDDs leak per composition-query build and survive
    both ``gc.collect()`` and a JVM ``System.gc()`` (a strong JVM-side
    reference keeps the ContextCleaner's weak refs from firing). A
    harness that builds hundreds of plans in one session (bench.py's
    warm-up + timed runs, the oracle-parity gate, q_probe) accumulates
    those blocks in storage memory and pays growing GC on every later
    query — the later measurements then charge the earlier queries'
    garbage, exactly what guide §1's isolate-each-query rule exists to
    prevent.

    Safety contract: call this only BETWEEN self-contained query
    builds. A localCheckpointed RDD has no lineage to recompute from,
    so unpersisting it breaks RE-EXECUTION of any still-live DataFrame
    that references it — harnesses that rebuild each measured plan from
    the registry (bench.py, q_probe, the parity gate) never do that."""
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.iterator()
    n = 0
    while it.hasNext():
        it.next()._2().unpersist(False)
        n += 1
    return n
