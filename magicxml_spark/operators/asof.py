"""As-of (most-recent-match) join — a time-series operator the
reference lacks and Spark has no built-in for; standard in training-data
pipelines for stamping events with the latest preceding dimension state
(price as of trade time, config as of event time).

Spark-first design: the naive formulation (range join + per-key argmax)
explodes to O(left x right-per-key) pairs before pruning. Instead we use
the union + ordered-window formulation:

1. Union right rows (payload carried) with left rows (payload null)
   on the join key, tagging sides.
2. One window per key ordered by (timestamp, side) with
   ``last(payload, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT
   — each left row sees exactly the latest right row at-or-before it.
3. Keep the left side.

Cost: ONE shuffle on the key + a per-key sort — the same price as the
equi-join it replaces, with no pair explosion. At 100 TB the caveat is
key skew (one hot key's timeline sorts in one task); mitigate upstream
with key salting + re-merge, or pre-bucket both sides by key
(operators.bucketing) so the shuffle disappears entirely.

Right-side ties (same key + timestamp) resolve deterministically by
``tie_break`` ordering; right rows sort BEFORE left rows at an equal
timestamp, so the match is inclusive (right.ts == left.ts matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """For every left row, attach ``payload`` columns from the latest
    right row with the same key and ``right_ts <= left_ts`` (nulls when
    no such row). Column names: left columns unchanged; payload columns
    keep their right-side names (must not collide)."""
    for c in payload:
        if c in left.columns:
            raise ValueError(f"payload column collides with left side: {c}")

    extra = (
        [F.col(tie_break).alias("_asof_tie")]
        if tie_break is not None and tie_break not in payload
        else []
    )
    r = right.select(
        F.col(right_on).alias("_asof_key"),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c) for c in payload],
        *extra,
    )
    l = left.select(
        "*",
        F.col(left_on).alias("_asof_key"),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    both = l.unionByName(r, allowMissingColumns=True)

    order = [F.col("_asof_ts"), F.col("_asof_side")]
    if tie_break is not None:
        # right rows order by tie_break within an equal timestamp so
        # "latest" is well-defined even for exact-duplicate timestamps
        tb = tie_break if tie_break in payload else "_asof_tie"
        order.append(F.col(tb).asc_nulls_first())
    w = (
        Window.partitionBy("_asof_key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = both.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}") for c in payload]
    )
    return (
        filled.filter(F.col("_asof_side") == 1)
        .drop(*payload)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"_asof_{c}").alias(c) for c in payload],
        )
    )
