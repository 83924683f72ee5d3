"""Temporal join operators Spark's API lacks, built as compositions of
native ops (the task-class example: as-of join).

asof_join: for every left row, attach the LATEST right row whose
timestamp is at-or-before the left timestamp, per key — the
quotes-to-trades / snapshot-to-event alignment pass. Implemented with
the union + ordered last-non-null carry-forward trick: ONE key-based
shuffle of the combined rows, no range cross-join, no per-key
collect. At 10^12 rows both sides shuffle once on the (uniform) key
and the window is a linear scan per key partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame, key: str,
               ts: str, start: str, end: str,
               bucket_seconds: int = 3600) -> DataFrame:
    """Point-in-interval join without an inequality cross-join: both
    sides bucket on floor(epoch / bucket_seconds) — intervals EXPLODE
    across every bucket they cover, points land in exactly one — then
    an equi-join on (key, bucket) + the exact containment filter. A
    (point, interval) pair can only meet in the point's bucket, so no
    dedup pass is needed. Shuffle is uniform on (key, bucket); interval
    fan-out is len/bucket_seconds + 1, so pick the bucket near the
    typical interval length. Returns all point columns + the interval
    columns (suffixed where colliding is the caller's job)."""
    b = int(bucket_seconds)
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts)) / b).cast("long"))
    i = intervals.withColumn(
        "_b",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start)) / b).cast("long"),
            F.floor(F.unix_timestamp(F.col(end)) / b).cast("long"),
        )),
    )
    return (
        p.join(i, [key, "_b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_b")
    )


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str]) -> DataFrame:
    """Left rows + carried-forward `right_cols` from the newest right
    row with right_ts <= left_ts (inclusive) for the same `key`;
    nulls when no prior right row exists. Matches DuckDB's
    `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`.

    Rows sort by (_ts, _side) with right rows FIRST at equal
    timestamps, which is what makes the match inclusive."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != key else F.col(key)
          for c in lcols],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l.unionByName(r)
    w = (Window.partitionBy(key).orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = u.select(
        *lcols, "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
          for c in right_cols],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
