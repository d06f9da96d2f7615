"""Key-distribution profiling: the measurement step behind every skew
decision in this engine (salting width, AQE skew-join expectations,
broadcast-vs-shuffle calls).

At 100 TB you do not discover a hot key by OOMing an executor — you run
``key_skew_profile`` on the join/agg key first (one aggregation, the
profile output is top-N rows) and read off whether the heaviest key's
share justifies salting (operators/bucketing.salted_agg) or the skew is
within AQE's split threshold. The profile is itself scale-safe: one
hash aggregation with map-side partial counts, one scalar aggregate for
the totals, a broadcast of that single totals row back onto the top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Top-N heaviest keys of ``key_col`` with the stats a partitioning
    decision needs:

    * ``n_rows``      — rows carrying this key (= shuffle partition size
                        if the key hashes alone)
    * ``rank``        — by n_rows desc, key asc (deterministic)
    * ``pct_of_total``— this key's share of all rows, percent, 4dp
    * ``skew_ratio``  — n_rows / mean-rows-per-distinct-key: ~1 means
                        uniform; >> shuffle-partition count means one
                        task drags the stage and salting pays

    Scale shape: groupBy(key) count (map-side partial), then the top-N
    via orderBy().limit() — Spark's TakeOrderedAndProject, a per-
    partition top-N merged on the driver, NOT a global sort and NOT a
    single-task window (the counted table has one row per distinct key,
    which at corpus scale is billions). row_number ranks only the ≤ N
    surviving rows; ONE summary row cross-joins back broadcast.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
    )
    top = counts.orderBy(F.desc("n_rows"), "key").limit(top_n)
    w = W.orderBy(F.desc("n_rows"), "key")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            "rank",
            F.round(F.col("n_rows") * 100.0 / F.col("_total"), 4).alias(
                "pct_of_total"
            ),
            # multiply in DOUBLE: n_rows * n_keys as long*long overflows
            # at exactly the billions-of-keys scale this module targets
            F.round(
                F.col("n_rows").cast("double") * F.col("_n_keys") / F.col("_total"), 4
            ).alias("skew_ratio"),
        )
    )


def recommend_salt_factor(
    top_key_rows: int,
    total_rows: int,
    n_partitions: int,
    skew_tolerance: float = 2.0,
    max_salt: int = 256,
) -> int:
    """Salt factor for a groupBy/join key given its measured profile
    (``key_skew_profile`` output) and the stage's partition count.

    Returns 1 (no salting) while the heaviest key stays within
    ``skew_tolerance`` x the average partition's row share — salting
    un-needed keys only adds a second shuffle. Past that, the factor
    is the number of average-sized partition slices the hot key spans,
    clamped to ``max_salt`` (beyond a few hundred the second-phase
    merge stops being 'tiny').

    Pure arithmetic — callable on driver-side profile rows or encoded
    in a config review; deliberately NOT auto-applied inside operators
    (salting changes the plan shape; the decision should be visible).
    """
    if total_rows <= 0 or n_partitions <= 0:
        return 1
    avg_partition_rows = total_rows / n_partitions
    if top_key_rows <= skew_tolerance * avg_partition_rows:
        return 1
    return min(max_salt, -(-top_key_rows // int(max(1.0, avg_partition_rows))))


def salted_agg(
    df: DataFrame,
    key_col: str,
    aggs: dict[str, tuple[str, str]],
    salt_factor: int,
) -> DataFrame:
    """Two-phase salted aggregation, EXACTLY equal to
    ``df.groupBy(key).agg(...)`` for decomposable aggregates.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {'count', 'sum', 'min', 'max'} — the aggregates whose two-phase
    split (partial per (key, salt), merge per key) is algebraically
    exact: count merges by sum, sum/min/max by themselves. Phase one
    spreads the hot key over ``salt_factor`` reducers; phase two's
    input is |distinct keys| x salt_factor rows — tiny.

    Use ``recommend_salt_factor`` on a ``key_skew_profile`` row to pick
    ``salt_factor``; factor 1 degenerates to the plain plan.

    The salt MUST be row-derived, never key-derived: hashing the group
    key would give every row of the hot key the same salt — zero
    spread. ``monotonically_increasing_id`` spreads rows round-robin
    within each input partition; the final result is salt-invariant
    (the merge removes it), so salt nondeterminism across runs is fine.
    """
    _MERGE = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (_, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"{name}: non-decomposable agg {fn!r}")
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor))
    )
    partial = salted.groupBy(key_col, "_salt").agg(
        *[
            _PARTIAL[fn](F.col(col)).alias(f"_p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(key_col).agg(
        *[
            _MERGE[fn](F.col(f"_p_{name}")).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )
