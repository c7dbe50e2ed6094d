"""Structured-Streaming ingestion — the reference's sync loop re-expressed
(SURVEY §2.9 T1–T8, §3 E1/E2).

Reference pipeline: Matrix `/sync` long-poll → per-event handlers →
per-row Postgres upserts, checkpointed by a `next_batch` token
(/root/reference/src/app/matrix/client.ts:90,254-284,
/root/reference/src/server/utils/db.utils.ts:271-290). One INSERT per
event — an N+1 pattern that cannot scale.

Spark-first mapping:

| reference                      | here                                     |
|--------------------------------|------------------------------------------|
| sync long-poll + next_batch    | file-source readStream + checkpointLocation (T1) |
| initialSyncLimit: 50           | maxFilesPerTrigger (T2)                  |
| back-pagination skip           | watermark: late rows dropped (T3)        |
| ON CONFLICT(event_id) upsert   | watermarked dropDuplicates + foreachBatch latest-by-key merge (T4/K1) |
| per-event membership upsert    | same foreachBatch, change-detecting merge (T5/K2) |
| 30 s dashboard poll            | trigger(processingTime='30 seconds') (T6) |
| WebSocket status push          | StreamingQuery.lastProgress (T7)         |
| `error TEXT` column            | dead-letter parse-error column (T8)      |

The file source here stands in for Kafka in production — the pipeline from
`load_stream` onward is source-agnostic (swap `readStream.text` for
`readStream.format("kafka")` and the JSON value column is the same).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from beeper_matric_etl_tool_spark import sinks
from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key_agg

#: wire schema of one Matrix-like event (FIXTURES.md streaming fixture)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("room_id", T.StringType(), False),
        T.StructField("sender", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),  # epoch millis (event time)
        T.StructField("is_encrypted", T.BooleanType(), True),
        T.StructField("content", T.StringType(), True),  # kept as JSON string (JSONB plane)
        T.StructField("relates_to", T.StringType(), True),
    ]
)

#: nested JSON fields that arrive as objects but are stored as JSON strings
_JSON_OBJECT_FIELDS = ("content", "relates_to")


def load_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """T1/T2 — raw line stream of event JSON. Reading as text (not
    spark.readStream.json) keeps unparseable lines visible for the
    dead-letter path instead of silently nulling them."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(source_dir)


def parse_events(raw: DataFrame) -> DataFrame:
    """E2 projection + T8 dead-letter.

    `from_json` yields null on malformed input; those rows are NOT dropped —
    they surface with `error` set and null payload (the reference's
    `error TEXT` column, db.utils.ts:58). Event time is converted from epoch
    millis to a timestamp column `ts` for watermarking.
    """
    schema_with_json_strings = T.StructType(
        [
            T.StructField(f.name, T.StringType() if f.name in _JSON_OBJECT_FIELDS else f.dataType, True)
            for f in EVENT_SCHEMA.fields
        ]
    )
    parsed = raw.withColumn("__parsed", F.from_json(F.col("value"), schema_with_json_strings))
    ok = F.col("__parsed").isNotNull() & F.col("__parsed.event_id").isNotNull()
    return parsed.select(
        F.col("__parsed.event_id").alias("event_id"),
        F.col("__parsed.room_id").alias("room_id"),
        F.col("__parsed.sender").alias("sender"),
        F.col("__parsed.event_type").alias("event_type"),
        F.col("__parsed.timestamp").alias("timestamp"),
        F.timestamp_millis(F.col("__parsed.timestamp")).alias("ts"),
        F.coalesce(F.col("__parsed.is_encrypted"), F.lit(False)).alias("is_encrypted"),
        F.col("__parsed.content").alias("content"),
        F.col("__parsed.relates_to").alias("relates_to"),
        F.when(ok, F.lit(None).cast("string")).otherwise(
            F.concat(F.lit("parse_error: "), F.col("value"))
        ).alias("error"),
    )


def deduplicate(events: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """T3/T4 via the engine's *state-store* path: watermarked dropDuplicates
    on the natural key.

    NOT used by `start_ingest`: profiling showed the per-key state store
    costs more than it buys when the sink is already idempotent-by-key —
    the merge sink dedups across ALL time (state bounded by the target
    table, maintained anyway), while dropDuplicates adds per-batch state
    files and only covers the watermark horizon. Kept for pipelines whose
    sink is append-only (e.g. Kafka-out), where in-stream dedup is the only
    option. Note it also requires splitting off dead-letter rows first
    (null keys would collapse), which forces a second pass over the source.
    """
    good = events.filter(F.col("error").isNull())
    dead = events.filter(F.col("error").isNotNull())
    # dropDuplicatesWithinWatermark, NOT dropDuplicates(['event_id']): a
    # plain key-only dedup never evicts state (the watermark only bounds
    # state when the event-time column is part of the key set), so a
    # long-running stream would accumulate every key ever seen until OOM —
    # the opposite of the "only covers the watermark horizon" contract.
    deduped = good.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return deduped.unionByName(dead)


def _read_watermark(spark: SparkSession, target_dir: str) -> int | None:
    """Stored high-water event time (epoch millis) of everything committed
    so far — a tiny JSON side file under ``_watermark`` (underscore-prefixed,
    so table reads skip it). O(ms) driver-side I/O per batch, replacing the
    old full-table max() scan. LOCAL FILESYSTEM ONLY (sinks.py "Filesystem
    contract"): the read/replace pair uses POSIX open/os.replace; on an
    object store this would become the same one-object GET/PUT the
    streaming checkpoint files already are — port via the Hadoop FS API,
    don't point the POSIX path at a bucket (scheme URIs are refused)."""
    sinks._require_local_path(target_dir, "_read_watermark")
    path = os.path.join(target_dir, "_watermark", "high_ms.json")
    if not os.path.isfile(path):
        return None
    import json

    with open(path) as fh:
        return json.load(fh)["high_ms"]


def _write_watermark(spark: SparkSession, target_dir: str, high_ms: int) -> None:
    import json

    sinks._require_local_path(target_dir, "_write_watermark")
    wm_dir = os.path.join(target_dir, "_watermark")
    os.makedirs(wm_dir, exist_ok=True)
    tmp = os.path.join(wm_dir, ".high_ms.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"high_ms": int(high_ms)}, fh)
    os.replace(tmp, os.path.join(wm_dir, "high_ms.json"))  # atomic swap


def merge_batch_writer(
    target_dir: str,
    keys: list[str],
    order_col: str = "timestamp",
    watermark_delay_ms: int | None = None,
    event_time_col: str = "timestamp",
):
    """K1-semantics idempotent sink for foreachBatch — dedup, late-drop and
    merge in ONE pass over the micro-batch.

    - **Effectively-once (T4)**: last-write-wins by key, so redeliveries
      collapse across batches AND restarts. This makes an in-stream
      dropDuplicates state store redundant — its state only covers the
      watermark horizon, costs per-batch state files, and (measured)
      doubled batch latency; the merge's "state" is the target table,
      maintained anyway.
    - **Touched-partition-only I/O**: the target is partitioned by event-time
      DAY (sinks.partitioned_upsert with a time bucket_expr) — each batch
      reads and dynamically overwrites ONLY the days it carries events for.
      A steady-state stream touches the most recent day or two, so per-batch
      I/O is O(|recent data|) regardless of how much history the target
      holds — the reference's in-place ``ON CONFLICT`` (db.utils.ts:30-152)
      without O(|table|) cost. Time bucketing is merge-key-stable because an
      event's time is part of its identity (timeline events are immutable;
      edits arrive as NEW events via relates_to): a redelivery of event_id
      always lands in the same day partition. Key-hash bucketing (the
      partitioned_upsert default) would NOT prune here — a large batch of
      random keys touches every hash bucket.
    - **Late-drop (T3)**: rows older than (stored high-water event time −
      delay) are back-paginated history (client.ts:272-274), dropped before
      the merge. The watermark is a one-row side file maintained
      monotonically per batch — never derived from a full table scan — and
      advances exactly like the built-in one: on each batch's input max.
    - Empty batches (availableNow's final commit) are a no-op.
    - **One stats job per batch (r13)**: emptiness, the watermark max and
      the touched-bucket set all come from ONE ``groupBy(bucket).agg(max)``
      over the persisted batch (≤ |touched days| rows to the driver) —
      previously three separate actions (isEmpty, agg(max),
      distinct-collect), each a scheduled job whose ~40 ms floor dominates
      small steady-state batches. The late filter runs BEFORE the stats
      job; that leaves the watermark advance unchanged: any row with
      ``ts > stored`` trivially survives the ``ts >= stored − delay``
      cutoff, so max(filtered) = max(unfiltered) whenever the max would
      advance the watermark, and when ALL rows are late the unfiltered max
      is below the stored mark anyway.
    """

    def write(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # day-of-event-time bucket; dead-letter rows (null event time)
        # land in their own -1 partition
        day_bucket = F.coalesce(
            F.floor(F.col(event_time_col) / F.lit(86_400_000)), F.lit(-1)
        ).cast("int")
        batch = batch.withColumn("__batch_id", F.lit(batch_id).cast("long")).withColumn(
            sinks.BUCKET_COL, day_bucket
        )
        stored = None
        if watermark_delay_ms is not None:
            stored = _read_watermark(spark, target_dir)
            if stored is not None:
                cutoff = stored - watermark_delay_ms
                batch = batch.filter(
                    F.col(event_time_col).isNull() | (F.col(event_time_col) >= cutoff)
                )
        # one materialization for the whole batch: the stats job below
        # fills the cache; the merge re-reads it — without this every
        # action re-runs source read + parse
        batch = batch.persist()
        try:
            stats = (
                batch.groupBy(sinks.BUCKET_COL)
                .agg(F.max(event_time_col).alias("__high"))
                .collect()
            )
            if not stats:
                return
            highs = [r["__high"] for r in stats if r["__high"] is not None]
            batch_high = max(highs) if highs and watermark_delay_ms is not None else None

            def merge(existing: DataFrame | None, b: DataFrame) -> DataFrame:
                # max_by aggregate, not a window: partial-combines map-side,
                # so each input partition ships one candidate per key. The
                # order tuple coalesces a null event time to LONG_MIN —
                # exactly desc_nulls_last — because a null inside max_by's
                # ordering struct would otherwise decide by engine whim
                # (dead-letter rows all carry null event time).
                src = b if existing is None else existing.unionByName(b)
                # normalize the order column to long by its ACTUAL type:
                # timestamps keep millisecond precision via unix_millis (a
                # bare long cast would silently truncate to seconds),
                # integrals cast losslessly, anything else is not a total
                # order we can guarantee — raise instead of guessing.
                order_dt = src.schema[order_col].dataType
                if isinstance(order_dt, (T.TimestampType, T.TimestampNTZType)):
                    # unix_millis rejects TIMESTAMP_NTZ outright; the cast to
                    # TIMESTAMP (session tz, pinned UTC) is monotonic so the
                    # merge ordering is preserved
                    ord_long = F.unix_millis(F.col(order_col).cast("timestamp"))
                elif isinstance(order_dt, T.DateType):
                    ord_long = F.unix_date(F.col(order_col)).cast("long")
                elif isinstance(order_dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
                    ord_long = F.col(order_col).cast("long")
                else:
                    raise TypeError(
                        f"merge_batch_writer: order_col {order_col!r} has type "
                        f"{order_dt.simpleString()}; supported orderings are "
                        f"integral (epoch millis) and timestamp/date columns"
                    )
                src = src.withColumn("__ord", F.coalesce(ord_long, F.lit(-(2**63))))
                return latest_by_key_agg(
                    src, keys=keys, max_order_cols=["__ord", "__batch_id"]
                ).drop("__ord")

            sinks.partitioned_upsert(
                spark, target_dir, batch, merge, persist=False,
                touched_vals=[r[0] for r in stats],
            )
            if batch_high is not None:
                stored = _read_watermark(spark, target_dir)
                if stored is None or batch_high > stored:
                    _write_watermark(spark, target_dir, batch_high)
        finally:
            batch.unpersist()

    return write


_INTERVAL_UNITS_MS = {
    "millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000
}


def _interval_ms(interval: str) -> int:
    """'1 hour' / '30 minutes' → milliseconds."""
    qty, unit = interval.strip().split()
    return int(qty) * _INTERVAL_UNITS_MS[unit.rstrip("s")]


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
    max_files_per_trigger: int | None = None,
    processing_interval: str | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Wire the full ingestion: ONE pass — source → parse (with dead-letter
    column) → idempotent late-dropping merge sink, checkpointed.
    `available_now=True` drains what exists and stops (the test/backfill
    mode); `processing_interval` is the steady-state trigger (T6).

    Dead-letter rows carry no trustworthy natural key; they get a synthetic
    content-derived one so distinct bad lines are each kept while exact
    redeliveries of the same bad line still collapse (deterministic under
    retries — no uuid/rand)."""
    events = parse_events(load_stream(spark, source_dir, max_files_per_trigger))
    events = events.withColumn(
        "__merge_key",
        F.coalesce(F.col("event_id"), F.concat(F.lit("dead:"), F.md5(F.col("error")))),
    )
    delay_ms = _interval_ms(watermark_delay)
    writer = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            merge_batch_writer(
                target_dir, keys=["__merge_key"], watermark_delay_ms=delay_ms
            )
        )
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_interval:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


def progress_summary(query: StreamingQuery) -> dict:
    """T7 — the sync-status surface: what the reference pushes over its
    WebSocket ({status, progress, currentOperation}), sourced from the
    engine's own progress events."""
    p = query.lastProgress or {}
    return {
        "id": str(query.id),
        "is_active": query.isActive,
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows"),
        "sources": [s.get("description") for s in p.get("sources", [])],
        "status": query.status.get("message") if query.status else None,
    }


def dim_merge_writer(target_dir: str, keys: list[str], order_col: str = "last_updated"):
    """T5/K2 — stateful dimension maintenance: each micro-batch of state
    deltas (membership changes, room updates) merges into the dimension
    table, LATEST-BY-ORDER both within the batch and against the stored
    state. The dimension is hash-bucket partitioned on its key, so a batch
    touching few members rewrites few buckets — not the whole dimension.

    Order-aware on purpose: a change-detecting merge (take incoming when
    any column differs) silently REGRESSES the dimension when a late
    backfill batch delivers an older state after a newer one — the same
    out-of-order hazard the event sink solves with its (__ord, __batch_id)
    max_by. Here the stored row competes with the incoming row under
    (order_col, payload…): the payload tail makes the order total, so a
    same-millisecond join+leave picks the same winner on every replay.
    Unchanged redeliveries still cause no churn outside the touched
    buckets (untouched partitions are never read or rewritten)."""
    from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key_agg

    def write(batch: DataFrame, batch_id: int) -> None:
        # no isEmpty() pre-check: partitioned_upsert's touched-bucket
        # collect discovers emptiness in the job it runs anyway and
        # returns before scheduling the merge/write jobs (r13)
        spark = batch.sparkSession
        payload = [c for c in batch.columns if c not in keys and c != order_col]
        order_cols = [order_col, *payload]
        # reduce the delta to the LATEST state per key (a bare dropDuplicates
        # would keep an arbitrary row — nondeterministic under retries)
        batch = latest_by_key_agg(batch, keys=keys, max_order_cols=order_cols)

        def merge(existing: DataFrame | None, b: DataFrame) -> DataFrame:
            if existing is None:
                return b
            src = existing.unionByName(b.select(*existing.columns))
            return latest_by_key_agg(src, keys=keys, max_order_cols=order_cols)

        sinks.partitioned_upsert(spark, target_dir, batch, merge, keys=keys)

    return write


def start_dim_maintenance(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    key_field: str = "sender",
    available_now: bool = True,
) -> StreamingQuery:
    """S3/S4/T5 — the membership-listener plane: consume the same event
    stream, reduce each micro-batch to per-key latest state, merge into the
    participants-style dimension."""
    events = parse_events(load_stream(spark, source_dir)).filter(F.col("error").isNull())
    dim = events.select(
        F.col(key_field).alias("user_id"),
        F.col("room_id"),
        F.col("event_type").alias("membership"),
        F.col("timestamp").alias("last_updated"),
    )
    writer = (
        dim.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(dim_merge_writer(target_dir, keys=["user_id", "room_id"]))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_merge_writer(target_dir: str):
    """Upsert per-window aggregate rows into the rollup table (keyed by
    window start): arriving batches revise only the windows they touch —
    and, the table being bucket-partitioned on the window key, only the
    buckets holding those windows are read and rewritten (a hypertable
    chunk rewrite, not a table rewrite)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        # emptiness discovered by partitioned_upsert's own collect (r13)
        spark = batch.sparkSession

        def merge(existing: DataFrame | None, b: DataFrame) -> DataFrame:
            if existing is None:
                return b
            # update-mode batches carry the REVISED totals for touched
            # windows — replace, don't add
            return existing.join(
                b.select("window_start"), on="window_start", how="left_anti"
            ).unionByName(b.select(*existing.columns))

        sinks.partitioned_upsert(spark, target_dir, batch, merge, keys=["window_start"])

    return write


def start_windowed_rollup(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """T6 + windows — the continuous aggregate (hypertable-rollup shape):
    event stream → watermarked tumbling-window counts/sums, incrementally
    maintained. `update` output mode emits only windows revised by each
    micro-batch; the sink upserts them by window key. Late events beyond
    the watermark stop revising closed windows — the streaming twin of the
    batch `events_time_windows` query (kind=tumbling), same F.window operator."""
    events = parse_events(load_stream(spark, source_dir)).filter(F.col("error").isNull())
    agg = (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window(F.col("ts"), window_duration))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    writer = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(rollup_merge_writer(target_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_merge_writer(target_dir: str, user_col: str = "sender"):
    """Sessions MERGE as late or bridging events arrive: a revised session
    can subsume several previously-emitted rows (its start moves earlier,
    its end later, or two sessions fuse into one). Replacement is therefore
    keyed on INTERVAL OVERLAP, not equality: each arriving session first
    anti-joins away every stored session of the same user whose half-open
    [start, end) interior intersects its own, then inserts itself. The target is
    hash-bucket partitioned on the user — a user's sessions always live in
    one bucket, so the overlap merge reads/rewrites only touched buckets."""

    def write(batch: DataFrame, batch_id: int) -> None:
        # emptiness discovered by partitioned_upsert's own collect (r13)
        spark = batch.sparkSession

        def merge(existing: DataFrame | None, b: DataFrame) -> DataFrame:
            if existing is None:
                return b
            inc = b.select(
                F.col(user_col).alias("__u"),
                F.col("session_start").alias("__ss"),
                F.col("session_end").alias("__se"),
            )
            # STRICT comparisons: session_window emits half-open
            # [start, end) intervals, so a stored session whose end equals
            # a new session's start is adjacent-but-DISJOINT — a closed
            # overlap test would anti-join it away and silently delete it.
            # (Truly fused sessions always share interior: the bridging
            # event extends the revised window across the old boundary.)
            overlap = (
                (existing[user_col] == F.col("__u"))
                & (existing["session_start"] < F.col("__se"))
                & (F.col("__ss") < existing["session_end"])
            )
            keep = existing.join(inc, overlap, "left_anti")
            return keep.unionByName(b.select(*existing.columns))

        sinks.partitioned_upsert(spark, target_dir, batch, merge, keys=[user_col])

    return write


def start_session_rollup(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous per-user session aggregate — the streaming twin of the
    batch `events_sessions` query, built on `F.session_window` (gap-based
    dynamic windows that MERGE inside the state store when a bridging
    event lands). Session aggregation only supports `append` output
    (Spark emits a session once the watermark closes it — checked: update
    raises STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION), so rows arriving
    at the sink are final; the overlap-replacing writer is kept anyway
    because re-emission after a checkpoint reset may carry REVISED
    boundaries for the same logical session, and overlap-replace is the
    idempotent merge under that failure mode where key-equality upsert
    would duplicate."""
    events = parse_events(load_stream(spark, source_dir)).filter(F.col("error").isNull())
    agg = (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window(F.col("ts"), gap), F.col("sender"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "sender",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(session_merge_writer(target_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bootstrap_then_ingest(
    spark: SparkSession,
    snapshot_dir: str | None,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    **ingest_kwargs,
) -> StreamingQuery:
    """S5/T2 — the initialFetch pattern (client.ts:304-314): a one-time
    batch backfill runs ONLY when no checkpoint exists (first start), then
    the incremental stream takes over from its checkpointed offsets.
    `snapshot_dir` holds the batch snapshot (parquet, stream-sink schema);
    restarts skip the backfill exactly like the reference skips
    initialFetch when a sync token is already persisted."""
    first_start = not os.path.isdir(checkpoint_dir)
    if first_start and snapshot_dir and os.path.isdir(snapshot_dir):
        snapshot = spark.read.parquet(snapshot_dir)
        if "__merge_key" not in snapshot.columns:
            # SAME key derivation as start_ingest: event_id alone would
            # collapse every dead-letter snapshot row (null event_id) under
            # one null key — and the survivor would never merge with the
            # stream's 'dead:…'-keyed redeliveries afterward
            key = (
                F.coalesce(
                    F.col("event_id"), F.concat(F.lit("dead:"), F.md5(F.col("error")))
                )
                if "error" in snapshot.columns
                else F.col("event_id")
            )
            snapshot = snapshot.withColumn("__merge_key", key)
        # the writer stamps its own __batch_id; drop a stale one if present
        if "__batch_id" in snapshot.columns:
            snapshot = snapshot.drop("__batch_id")
        merge_batch_writer(target_dir, keys=["__merge_key"])(snapshot, -1)
    return start_ingest(spark, source_dir, target_dir, checkpoint_dir, **ingest_kwargs)
