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
from beeper_matric_etl_tool_spark.streaming.stateful import streaming_turn_line

#: the transcript-row columns, in the streaming output order — the shared
#: schema contract between the stateful assembler, the batch derivation
#: and the repair compare
TRANSCRIPT_COLUMNS = (
    "sender", "session_start_ms", "session_end_ms",
    "n_events", "n_turns", "n_tokens", "transcript",
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
    ).filter(
        F.col("error").isNull()
        & F.col("timestamp").isNotNull()
        # a keyless event belongs to no sender timeline — dropped here
        # AND in batch_transcripts, so the repair compare never sees a
        # NULL key (name-keyed joins cannot match one)
        & F.col("sender").isNotNull()
    )
    lined = events.select(
        "sender", "timestamp", "event_id", streaming_turn_line().alias("line")
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
    senders: list[str] | None = None,
) -> DataFrame:
    """The ORDER-EXACT batch derivation of the stream's source files, in
    the streaming output schema (`TRANSCRIPT_COLUMNS`, ms longs): parse
    the same JSON lines, drop dead-letter / NULL-timestamp / NULL-sender
    rows (the upsert stream's own filter), assemble with the SHARED
    streaming turn rendering (`stateful.streaming_turn_line`). This is
    the ground truth the repair converges the target toward.

    ``senders`` restricts the derivation to those keys BEFORE
    sessionization — sound because sessions are per-sender windows, so
    filtering first is semantically identical and drops a one-sender
    repair from corpus-sized to sender-sized."""
    parsed = parse_events(spark.read.text(source_dir)).filter(
        F.col("error").isNull()
        & F.col("timestamp").isNotNull()
        & F.col("sender").isNotNull()
    )
    if senders is not None:
        parsed = parsed.filter(F.col("sender").isin(list(senders)))
    return assemble_transcripts(
        parsed,
        line=streaming_turn_line(),
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


def _final_session_identities(batch: DataFrame) -> DataFrame:
    """(sender, session_start_ms) of each sender's LAST batch session —
    the one the repair claims NO authority over under
    ``include_open=False``: in a live stream it is still open in the
    state store (a gap-sessionizer only closes on a later event or an
    idle timeout); under ``flush_idle`` it may already sit CLOSED in the
    target. Both cases resolve by excluding the identity from the drift
    compare on BOTH sides and preserving any matching target row
    verbatim during a rewrite — so a repaired target never loses an
    idle-flushed final session and never duplicates one the stream will
    close later."""
    return batch.groupBy("sender").agg(
        F.max("session_start_ms").alias("session_start_ms")
    )


def _sender_checksums(df: DataFrame) -> DataFrame:
    """(sender, __n, __ck): row count + order-free 64-bit checksum of the
    full row content — the per-sender compare unit. crc32 is summed as a
    long, so partition layout cannot move the value. Fields join under
    an explicit unit separator: with no delimiter, adjacent numeric
    fields would make STRUCTURAL collisions ((1, 12) vs (11, 2)
    concatenate identically) — not crc32-random at all."""
    row = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in TRANSCRIPT_COLUMNS]
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
    sender, so senders missing from either side are caught); an explicit
    ``senders`` list ALSO narrows the batch derivation to those keys
    (sender-sized repair cost, see `batch_transcripts`).

    ``include_open=False`` (default) claims no authority over each
    sender's FINAL batch session: its (sender, session_start_ms)
    identity is excluded from the drift compare on BOTH sides, it is
    never written, and a target row already carrying that identity is
    preserved verbatim through a rewrite — so repairing between
    micro-batches never duplicates a session a live stream will close
    later, and never deletes one a ``flush_idle`` idle timeout already
    closed into the target. Run with ``include_open=True`` when the
    stream is quiesced/drained and the target should become the full
    export.

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

    batch = batch_transcripts(
        spark, source_dir, gap_minutes, max_turns, senders=senders
    ).localCheckpoint(eager=True)
    final_ids = None
    if not include_open:
        final_ids = _final_session_identities(batch)
        batch_scope = batch.join(
            F.broadcast(final_ids),
            on=["sender", "session_start_ms"],
            how="left_anti",
        )
    else:
        batch_scope = batch

    def _without_final(df: DataFrame) -> DataFrame:
        # the no-authority zone: rows carrying a final-session identity
        # are invisible to the compare and untouchable by the rewrite
        if final_ids is None:
            return df
        return df.join(
            F.broadcast(final_ids),
            on=["sender", "session_start_ms"],
            how="left_anti",
        )

    if senders is None:
        if sinks.has_parquet(target_dir):
            tgt = spark.read.parquet(target_dir).select(*TRANSCRIPT_COLUMNS)
        else:
            tgt = batch.filter(F.lit(False))
        cmp_ = _sender_checksums(batch_scope).join(
            _sender_checksums(_without_final(tgt)).select(
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
            # a NULL key cannot exist in either plane (both filter
            # sender IS NOT NULL) — dropped defensively: name-keyed
            # joins could neither rewrite nor delete it
            if r["sender"] is not None
        ]
    else:
        affected = [x for x in senders if x is not None]
    if not affected:
        return []

    bucket = sinks.key_bucket(["sender"], sinks.DEFAULT_UPSERT_BUCKETS)
    aff = spark.createDataFrame([(s,) for s in affected], "sender string")
    touched = [r[0] for r in aff.select(bucket.alias("b")).distinct().collect()]
    repaired = batch_scope.filter(F.col("sender").isin(affected)).withColumn(
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
        # (a spurious streamed session has no batch counterpart to
        # match) — EXCEPT rows in the no-authority zone (an affected
        # sender's idle-flushed final session survives verbatim)
        keep_final = (
            existing.filter(F.col("sender").isin(affected)).join(
                F.broadcast(final_ids),
                on=["sender", "session_start_ms"],
                how="left_semi",
            )
            if final_ids is not None
            else existing.filter(F.lit(False))
        )
        merged = (
            existing.filter(~F.col("sender").isin(affected))
            .unionByName(keep_final)
            .unionByName(repaired.select(*existing.columns))
        )
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
