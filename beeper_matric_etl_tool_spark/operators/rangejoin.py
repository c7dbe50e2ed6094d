"""Range (interval-containment) join — the operator class Spark has no
native physical strategy for (SURVEY §2.12 scale path; cf. Flink interval
joins / TimescaleDB range semantics).

A naive point-in-interval join `l.ts BETWEEN r.start AND r.end` has no
equi-key, so Catalyst can only plan BroadcastNestedLoopJoin (fine when one
side is tiny) or a cartesian product (never fine). The scale path here is
BIN BUCKETING: quantize time into fixed bins, explode each interval to the
bins it covers, key each point by its single bin, equi-join on the bin, then
refine with the exact containment predicate.

- Each point lands in EXACTLY one bin → a (point, interval) pair can meet
  in at most one bin → no post-join dedup.
- Shuffle volume: |points| + Σ interval_span/bin — linear, tunable by bin
  size (bins ≪ interval count per bin keeps the refine selective).
- The equi-join is a plain hash exchange: AQE skew-split applies if one
  time bin is hot, broadcast applies if the exploded interval side is
  small. Catalyst sees a normal join, not a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default bin width — one hour in seconds
DEFAULT_BIN_S = 3600


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = DEFAULT_BIN_S,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with start ≤ ts ≤ end, joined via the
    bin-bucketed equi-join described in the module docstring. Column names
    are preserved from both inputs (they must not collide apart from the
    bin key this function adds and drops)."""
    if how != "inner":
        raise ValueError("interval_join supports inner containment joins")
    p = points.withColumn("__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    return (
        p.join(i, on="__bin", how="inner")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__bin")
    )
