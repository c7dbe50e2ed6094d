"""Late-event reconciliation for streamed transcripts — the batch repair
closing the gap `streaming/stateful.py:start_transcript_stream` documents:
a gap-sessionizer without a watermark re-sort assigns an event older than
a CLOSED session to a spurious/corrupted session, so the streamed target
can drift from the batch-exact derivation. This module makes the drift
REPAIRABLE in place instead of "re-export everything":

- :func:`start_transcript_upsert_stream` — the same stateful assembler,
  but writing through `sinks.partitioned_upsert` into a sender-hash-
  bucketed layout (the `start_user_profiles` pattern) instead of the
  native append-only file sink. Exactly-once comes from session-identity
  replacement ((sender, session_start_ms) is the merge key), so a
  replayed micro-batch rewrites the same session rows; the bucketed
  layout is what lets the repair touch ONLY affected partitions (the
  native file sink's `_spark_metadata` log forbids batch rewrites, which
  is why the file-sink form stays the pure-append export and this form
  is the repairable store).
- :func:`batch_transcripts` — the authoritative batch derivation of the
  SAME source files in the streaming output schema (ms longs), reusing
  `ext/transcripts.py:assemble_transcripts` with the streaming turn-line
  rendering (the parity contract the streaming tests pin).
- :func:`repair_transcripts` — detect senders whose streamed rows differ
  from the batch derivation (per-sender count + order-free checksum
  compare; or an explicit ``senders`` list) and dynamic-overwrite ONLY
  their rows via the same partitioned upsert, converging the target to
  the batch-exact transcripts. With ``include_open=False`` (default —
  stream still running) each sender's FINAL batch session is treated as
  the stream's open session and left out of both compare and rewrite;
  ``include_open=True`` is the export/quiesced mode that converges the
  target to the full batch output.

Scale shape: the repair reads the target once for detection (per-sender
map-side-combined agg — no corpus shuffle beyond the sender key), derives
batch transcripts only to session-sized relations, and the rewrite I/O is
touched-buckets-only (`partitioned_upsert`'s contract). Detection uses a
64-bit-summed crc32 checksum — collisions are astronomically unlikely but
possible; pass ``senders=`` explicitly when exactness of the DETECTION
(not the repair itself) must be absolute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from beeper_matric_etl_tool_spark import sinks
from beeper_matric_etl_tool_spark.ext.transcripts import assemble_transcripts
from beeper_matric_etl_tool_spark.streaming.ingest import (
    load_stream,
    parse_events,
)

#: the transcript-row columns, in the streaming output order — the shared
#: schema contract between the stateful assembler, the batch derivation
#: and the repair compare
TRANSCRIPT_COLUMNS = (
    "sender", "session_start_ms", "session_end_ms",
    "n_events", "n_turns", "n_tokens", "transcript",
)


def _streaming_line():
    """The streaming assembler's turn rendering — ONE definition shared
    with `batch_transcripts` so the batch/stream parity contract cannot
    drift (streaming/stateful.py renders the same concat JVM-side)."""
    return F.concat(
        F.col("sender"), F.lit(" "), F.col("event_type"), F.lit(": "),
        F.coalesce(F.col("content"), F.lit("")),
    )


def _session_upsert(batch: DataFrame, target_dir: str) -> None:
    """Upsert closed-session rows by SESSION identity: replace any
    existing row with the same (sender, session_start_ms), append the
    rest. Micro-batch replay after a crash rewrites the same sessions —
    idempotent; bucketing stays on the sender hash so one sender's rows
    always live in one bucket (the repair's pruning unit)."""

    def merge(existing: DataFrame | None, b: DataFrame) -> DataFrame:
        if existing is None:
            return b
        return existing.join(
            b.select("sender", "session_start_ms").distinct(),
            on=["sender", "session_start_ms"],
            how="left_anti",
        ).unionByName(b.select(*existing.columns))

    sinks.partitioned_upsert(
        batch.sparkSession, target_dir, batch, merge, keys=["sender"]
    )


def start_transcript_upsert_stream(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
    flush_idle: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """`start_transcript_stream` with a REPAIRABLE target: closed
    sessions upsert into a sender-bucketed parquet layout via
    foreachBatch instead of appending through the native file sink.
    Same stateful assembler, same output schema, same session semantics
    (see streaming/stateful.py); what changes is the write path — and
    therefore what `repair_transcripts` is allowed to rewrite."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from beeper_matric_etl_tool_spark.streaming.stateful import (
        TRANSCRIPT_OUTPUT_SCHEMA,
        TRANSCRIPT_STATE_SCHEMA,
        _make_transcript_updater,
    )

    events = parse_events(
        load_stream(spark, source_dir, max_files_per_trigger)
    ).filter(F.col("error").isNull() & F.col("timestamp").isNotNull())
    lined = events.select(
        "sender", "timestamp", "event_id", _streaming_line().alias("line")
    )
    closed = lined.groupBy("sender").applyInPandasWithState(
        _make_transcript_updater(
            int(gap_minutes) * 60_000, int(max_turns), flush_idle
        ),
        outputStructType=TRANSCRIPT_OUTPUT_SCHEMA,
        stateStructType=TRANSCRIPT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if flush_idle
            else GroupStateTimeout.NoTimeout
        ),
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        _session_upsert(batch, target_dir)

    writer = (
        closed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_transcripts(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
) -> DataFrame:
    """The ORDER-EXACT batch derivation of the stream's source files, in
    the streaming output schema (`TRANSCRIPT_COLUMNS`, ms longs): parse
    the same JSON lines, drop dead-letter and NULL-timestamp rows (the
    stream's own filter), assemble with the streaming turn rendering.
    This is the ground truth the repair converges the target toward."""
    parsed = parse_events(spark.read.text(source_dir)).filter(
        F.col("error").isNull() & F.col("timestamp").isNotNull()
    )
    return assemble_transcripts(
        parsed,
        line=_streaming_line(),
        ts_col="ts",
        user_col="sender",
        order_col="event_id",
        gap_minutes=gap_minutes,
        max_turns=max_turns,
    ).select(
        "sender",
        F.unix_millis("session_start").alias("session_start_ms"),
        F.unix_millis("session_end").alias("session_end_ms"),
        "n_events", "n_turns", "n_tokens", "transcript",
    )


def _drop_final_open_session(batch: DataFrame) -> DataFrame:
    """Remove each sender's LAST batch session — the one still open in
    the stream's state store (a gap-sessionizer only closes a session
    when a later event or an idle timeout arrives), so it must not be
    compared against or written into a live stream's target."""
    last = batch.groupBy("sender").agg(
        F.max("session_start_ms").alias("__last_start")
    )
    return (
        batch.join(F.broadcast(last), on="sender")
        .filter(F.col("session_start_ms") < F.col("__last_start"))
        .drop("__last_start")
    )


def _sender_checksums(df: DataFrame) -> DataFrame:
    """(sender, __n, __ck): row count + order-free 64-bit checksum of the
    full row content — the per-sender compare unit. crc32 is summed as a
    long, so partition layout cannot move the value."""
    row = F.concat_ws(
        "", *[F.col(c).cast("string") for c in TRANSCRIPT_COLUMNS]
    )
    return df.groupBy("sender").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.crc32(row)).alias("__ck"),
    )


def repair_transcripts(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
    senders: list[str] | None = None,
    include_open: bool = False,
) -> list[str]:
    """Converge a streamed transcript target (the
    :func:`start_transcript_upsert_stream` layout) to the batch-exact
    derivation for every sender whose rows drifted — the late-event
    repair job. Returns the repaired senders (sorted).

    ``senders=None`` detects drift by per-sender count+checksum compare
    between the target and :func:`batch_transcripts` (full outer on the
    sender, so senders missing from either side are caught);
    ``include_open=False`` (default) excludes each sender's final batch
    session — still open in a live stream's state — from BOTH compare
    and rewrite, so repairing between micro-batches never duplicates a
    session the stream will close later. Run with ``include_open=True``
    only when the stream is quiesced/drained and the target should
    become the full export.

    The rewrite uses the `sinks.partitioned_upsert` layout primitives
    directly (same bucket formula, same dynamic-overwrite discipline)
    rather than the sink itself, because a repair can be DELETION-ONLY
    for a sender (spurious streamed rows, zero batch rows): touched
    buckets derive from the AFFECTED-SENDER list, not from the rewrite
    rows, and a touched bucket whose merge output is empty has its
    partition directory removed explicitly (dynamic overwrite only
    replaces partitions present in the output). Affected senders' rows
    are replaced wholesale; untouched buckets are never read and stay
    byte-identical (the sink's pinned contract)."""
    import os
    import shutil

    batch = batch_transcripts(spark, source_dir, gap_minutes, max_turns)
    if not include_open:
        batch = _drop_final_open_session(batch)
    batch = batch.localCheckpoint(eager=True)

    if senders is None:
        if sinks.has_parquet(target_dir):
            tgt = spark.read.parquet(target_dir).select(*TRANSCRIPT_COLUMNS)
        else:
            tgt = batch.filter(F.lit(False))
        cmp_ = _sender_checksums(batch).join(
            _sender_checksums(tgt).select(
                F.col("sender"),
                F.col("__n").alias("__tn"),
                F.col("__ck").alias("__tck"),
            ),
            on="sender",
            how="full_outer",
        )
        affected = [
            r["sender"]
            for r in cmp_.filter(
                ~(
                    F.col("__n").eqNullSafe(F.col("__tn"))
                    & F.col("__ck").eqNullSafe(F.col("__tck"))
                )
            ).select("sender").collect()
        ]
    else:
        affected = list(senders)
    if not affected:
        return []

    bucket = sinks.key_bucket(["sender"], sinks.DEFAULT_UPSERT_BUCKETS)
    aff = spark.createDataFrame([(s,) for s in affected], "sender string")
    touched = [r[0] for r in aff.select(bucket.alias("b")).distinct().collect()]
    repaired = batch.filter(F.col("sender").isin(affected)).withColumn(
        sinks.BUCKET_COL, bucket
    )
    existing = None
    if sinks.has_parquet(target_dir):
        existing = spark.read.parquet(target_dir).filter(
            F.col(sinks.BUCKET_COL).isin(touched)
        )
    if existing is None:
        merged = repaired
    else:
        # replace the affected senders' rows WHOLESALE — the repair owns
        # their full session history, not individual session identities
        # (a spurious streamed session has no batch counterpart to match)
        merged = existing.filter(
            ~F.col("sender").isin(affected)
        ).unionByName(repaired.select(*existing.columns))
    out = merged.repartition(max(len(touched), 1), F.col(sinks.BUCKET_COL))
    if existing is not None:
        # materialize before the overwrite deletes the files the merge
        # reads (partitioned_upsert's own discipline)
        out = out.localCheckpoint(eager=True)
    written = {r[0] for r in out.select(sinks.BUCKET_COL).distinct().collect()}
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(sinks.BUCKET_COL)
        .parquet(target_dir)
    )
    # deletion-only buckets: nothing in the output claims the partition,
    # so dynamic overwrite leaves the stale files — remove them explicitly
    for b in set(touched) - written:
        shutil.rmtree(
            os.path.join(target_dir, f"{sinks.BUCKET_COL}={b}"),
            ignore_errors=True,
        )
    return sorted(affected)
