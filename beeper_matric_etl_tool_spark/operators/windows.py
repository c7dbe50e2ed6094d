"""Event-time window aggregations (SURVEY §2.9 note, §7 Phase 4).

The reference's only aggregations are global counts; its event stream
nevertheless carries event-time (epoch-millis `timestamp`), so the engine
exposes the standard event-time window family over it — the same operators
Structured Streaming uses with a watermark (streaming/ingest.py), here in
batch form over the `events` table.

`F.window`/`F.session_window` are Catalyst-native: tumbling windows are a
single groupBy (one shuffle, map-side partial agg); sliding windows expand
each row into windows/slide rows *before* the partial agg — still one
shuffle; session windows sort within the key partition and merge gaps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame, ts_col: str, duration: str, *aggs: Column, extra_keys: list[str] | None = None
) -> DataFrame:
    win = F.window(F.col(ts_col), duration)
    keys = [win] + [F.col(k) for k in (extra_keys or [])]
    out = df.groupBy(*keys).agg(*aggs)
    return out.withColumn("window_start", F.col("window.start")).withColumn(
        "window_end", F.col("window.end")
    ).drop("window")


def sliding(
    df: DataFrame, ts_col: str, duration: str, slide: str, *aggs: Column
) -> DataFrame:
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win).agg(*aggs)
    return out.withColumn("window_start", F.col("window.start")).withColumn(
        "window_end", F.col("window.end")
    ).drop("window")


def sessionized(
    df: DataFrame, ts_col: str, gap: str, key_cols: list[str], *aggs: Column
) -> DataFrame:
    """Session windows: start = first event, end = last event + gap; a new
    session opens when the inter-event gap STRICTLY exceeds the timeout
    (an event at exactly prev+gap still merges — F.session_window
    semantics, pinned by test_session_window_boundary)."""
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win, *[F.col(k) for k in key_cols]).agg(*aggs)
    return out.withColumn("session_start", F.col("session_window.start")).withColumn(
        "session_end", F.col("session_window.end")
    ).drop("session_window")
