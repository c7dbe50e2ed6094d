"""Custom stateful streaming operator — `applyInPandasWithState`
(SURVEY §1.4 / §2.9 T5: "or applyInPandasWithState for custom state").

Where the merge-sink pipelines keep their state IN the target table, this
is the engine's escape hatch for state that isn't a table row: arbitrary
per-key accumulators maintained by the state store across micro-batches
and restarts. The demonstration operator is a per-sender running profile
(event count, last event time, first event time) — the "user activity
card" a chat dashboard shows.

Arrow-batched per group; the Python function sees each key's rows as
pandas frames, never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from beeper_matric_etl_tool_spark.streaming.ingest import load_stream, parse_events

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sender", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts", T.LongType()),
        T.StructField("last_ts", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts", T.LongType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, first_ts, last_ts = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        # a valid event may still carry a null timestamp (parse only
        # requires event_id) — it counts toward n_events but must not
        # poison the time bounds: min/max over an ALL-null slice is NaN,
        # and int(NaN) would kill the whole streaming query
        ts = pdf["timestamp"].dropna()
        if len(ts):
            batch_min = int(ts.min())
            batch_max = int(ts.max())
            first_ts = batch_min if first_ts is None else min(first_ts, batch_min)
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, first_ts, last_ts))
    yield pd.DataFrame(
        {"sender": [key[0]], "n_events": [n], "first_ts": [first_ts], "last_ts": [last_ts]}
    )


def start_user_profiles(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Event stream → per-sender stateful profile, upserted into a parquet
    dimension each micro-batch. State survives restarts via the checkpoint
    (the test proves counters keep accumulating across runs)."""
    events = parse_events(load_stream(spark, source_dir)).filter(F.col("error").isNull())
    profiles = events.groupBy("sender").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        from beeper_matric_etl_tool_spark import sinks

        if batch.isEmpty():
            return

        def merge(existing: DataFrame | None, b: DataFrame) -> DataFrame:
            if existing is None:
                return b
            # update-mode batches carry each key's REVISED profile — replace
            return existing.join(
                b.select("sender"), on="sender", how="left_anti"
            ).unionByName(b.select(*existing.columns))

        # hash-bucketed on the profile key: a batch updating few senders
        # rewrites few buckets, not the whole profile dimension
        sinks.partitioned_upsert(
            batch.sparkSession, target_dir, batch, merge, keys=["sender"]
        )

    writer = (
        profiles.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
