"""Late-event reconciliation for streamed transcripts — the batch repair
closing the gap `streaming/stateful.py:start_transcript_stream` documents:
a gap-sessionizer without a watermark re-sort assigns an event older than
a CLOSED session to a spurious/corrupted session, so the streamed target
can drift from the batch-exact derivation. This module makes the drift
REPAIRABLE in place instead of "re-export everything":

- :func:`start_transcript_upsert_stream` — the same stateful assembler,
  but writing through `sinks.partitioned_upsert` into a key-hash-
  bucketed layout (the `start_user_profiles` pattern) instead of the
  native append-only file sink. Exactly-once comes from session-identity
  replacement ((key, session_start_ms) is the merge key), so a
  replayed micro-batch rewrites the same session rows; the bucketed
  layout is what lets the repair touch ONLY affected partitions (the
  native file sink's `_spark_metadata` log forbids batch rewrites, which
  is why the file-sink form stays the pure-append export and this form
  is the repairable store).
- :func:`batch_transcripts` — the authoritative batch derivation of the
  SAME source files in the streaming output schema (ms longs), reusing
  `ext/transcripts.py:assemble_transcripts` with the streaming turn-line
  rendering (the parity contract the streaming tests pin).
- :func:`repair_transcripts` — detect keys whose streamed rows differ
  from the batch derivation (per-key count + order-free checksum
  compare; or an explicit ``keys`` list) and dynamic-overwrite ONLY
  their rows via the same partitioned upsert, converging the target to
  the batch-exact transcripts. With ``include_open=False`` (default —
  stream still running) each key's FINAL batch session is treated as
  the stream's open session and left out of both compare and rewrite;
  ``include_open=True`` is the export/quiesced mode that converges the
  target to the full batch output.

Every function takes ``key_col`` — 'sender' (the per-user timeline,
default) or 'room_id' (the multi-speaker room document, the reference's
natural unit: its timeline listener consumes an ordered per-room stream,
reference src/app/matrix/client.ts:271-279). Whatever the key column,
the TARGET schema names the key slot 'sender' (`TRANSCRIPT_COLUMNS`) —
the same slot-aliasing contract the stateful assemblers use
(`streaming/stateful.py:start_transcript_stream`), so one repair
implementation serves both stream shapes.

Scale shape: the repair reads the target once for detection (per-key
map-side-combined agg — no corpus shuffle beyond the key), derives
batch transcripts only to session-sized relations, the affected-key set
stays a DATAFRAME end to end (semi/anti joins, never a driver-side list
— full drift of a corpus-sized key space repairs without driver
materialization; AQE broadcasts the key set when it is small), and the
rewrite I/O is touched-buckets-only (`partitioned_upsert`'s contract;
the only collects are bucket ids, bounded by the bucket count).
Detection uses TWO per-field null-flagged summed checksums from
STRUCTURALLY DIFFERENT hash families — crc32 and 32-bit-masked xxhash64
(r12: a same-length row substitution that collides crc32 would have
collided any salted crc32 too, CRC being affine in its init state; the
second family is genuinely independent) — summed 32-bit values on
purpose, ANSI-mode long sums must not overflow —
collisions are astronomically unlikely but possible; pass ``keys=``
explicitly when exactness of the DETECTION (not the repair itself) must
be absolute.
"""

from __future__ import annotations

import os

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
#: and the repair compare. 'sender' is the KEY SLOT: it holds the room id
#: when the stream is room-keyed (key_col='room_id').
TRANSCRIPT_COLUMNS = (
    "sender", "session_start_ms", "session_end_ms",
    "n_events", "n_turns", "n_tokens", "transcript",
)

#: active upsert streams by query id → absolute target dir; maintained by
#: :func:`start_transcript_upsert_stream` so :func:`repair_transcripts`
#: can refuse to rewrite a target a live query in THIS session is still
#: writing (see the repair docstring's quiesce contract).
_ACTIVE_UPSERT_TARGETS: dict[str, str] = {}


def _session_upsert(batch: DataFrame, target_dir: str) -> None:
    """Upsert closed-session rows by SESSION identity: replace any
    existing row with the same (sender, session_start_ms), append the
    rest. Micro-batch replay after a crash rewrites the same sessions —
    idempotent; bucketing stays on the key hash so one key's rows
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
    key_col: str = "sender",
    assembler: str = "arrival",
    lateness: str = "10 minutes",
) -> StreamingQuery:
    """`start_transcript_stream` with a REPAIRABLE target: closed
    sessions upsert into a key-bucketed parquet layout via foreachBatch
    instead of appending through the native file sink. Same stateful
    assemblers, same output schema, same session semantics (see
    streaming/stateful.py); what changes is the write path — and
    therefore what `repair_transcripts` is allowed to rewrite.

    ``key_col`` follows the assemblers' contract: 'sender' or 'room_id';
    the key value lands in the output's 'sender' slot either way, and
    turn lines keep their per-event speaker tag.

    ``assembler`` picks the ordering strategy:

    - 'arrival' (default) — the gap-sessionizer in arrival order; exact
      on in-order sources, late deliveries drift the target and
      `repair_transcripts` converges it after the fact. Supports
      ``flush_idle``.
    - 'watermarked' — the bounded-lateness EXACT assembler
      (`stateful._make_wm_transcript_updater`): events within the
      ``lateness`` horizon fold in true (ts, event_id) order, so the
      target needs NO repair for in-horizon input — the repair tier then
      serves beyond-horizon stragglers and `include_open=True` export
      (the upsert-layout twin of `finalize_transcripts`). flush_idle
      does not compose (an idle flush would break the byte-identical
      guarantee; the wm form closes on watermark advance instead)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from beeper_matric_etl_tool_spark.streaming.stateful import (
        TRANSCRIPT_OUTPUT_SCHEMA,
        TRANSCRIPT_STATE_SCHEMA,
        WM_TRANSCRIPT_STATE_SCHEMA,
        _make_transcript_updater,
        _make_wm_transcript_updater,
    )

    if assembler not in ("arrival", "watermarked"):
        raise ValueError(
            f"start_transcript_upsert_stream: unknown assembler "
            f"{assembler!r} (expected 'arrival' or 'watermarked')"
        )
    if assembler == "watermarked" and flush_idle:
        raise ValueError(
            "start_transcript_upsert_stream: flush_idle does not compose "
            "with the watermarked assembler — its sessions close on "
            "watermark advance (EventTimeTimeout), and an idle flush "
            "would emit a session a late in-horizon event may still "
            "extend, breaking the byte-identical-to-batch guarantee"
        )
    events = parse_events(
        load_stream(spark, source_dir, max_files_per_trigger)
    ).filter(
        F.col("error").isNull()
        & F.col("timestamp").isNotNull()
        # a keyless event belongs to no timeline — dropped here AND in
        # batch_transcripts, so the repair compare never sees a NULL key
        # (name-keyed joins cannot match one)
        & F.col(key_col).isNotNull()
    )
    if assembler == "watermarked":
        lined = events.select(
            F.col(key_col).cast("string").alias("__skey"),
            "timestamp",
            "event_id",
            "ts",
            streaming_turn_line().alias("line"),
        ).withWatermark("ts", lateness)
        closed = lined.groupBy("__skey").applyInPandasWithState(
            _make_wm_transcript_updater(
                int(gap_minutes) * 60_000, int(max_turns)
            ),
            outputStructType=TRANSCRIPT_OUTPUT_SCHEMA,
            stateStructType=WM_TRANSCRIPT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    else:
        lined = events.select(
            F.col(key_col).cast("string").alias("__skey"),
            "timestamp",
            "event_id",
            streaming_turn_line().alias("line"),
        )
        closed = lined.groupBy("__skey").applyInPandasWithState(
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
        # no isEmpty() pre-check: it would re-run the stateful plan once
        # before partitioned_upsert persists it; emptiness is discovered
        # by the upsert's own touched-bucket collect (r13)
        _session_upsert(batch, target_dir)

    writer = (
        closed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    _ACTIVE_UPSERT_TARGETS[q.id] = os.path.abspath(target_dir)
    return q


def batch_transcripts(
    spark: SparkSession,
    source_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
    keys: list[str] | None = None,
    key_col: str = "sender",
    senders: list[str] | None = None,
) -> DataFrame:
    """The ORDER-EXACT batch derivation of the stream's source files, in
    the streaming output schema (`TRANSCRIPT_COLUMNS`, ms longs): parse
    the same JSON lines, drop dead-letter / NULL-timestamp / NULL-key
    rows (the upsert stream's own filter), assemble with the SHARED
    streaming turn rendering (`stateful.streaming_turn_line`). This is
    the ground truth the repair converges the target toward — and the
    EXPORT fixed point of the watermarked assembler (see
    `streaming/stateful.py:finalize_transcripts`).

    ``keys`` restricts the derivation to those key values BEFORE
    sessionization — sound because sessions are per-key windows, so
    filtering first is semantically identical and drops a one-key
    repair from corpus-sized to key-sized. ``senders`` is the legacy
    alias of ``keys``."""
    if keys is not None and senders is not None:
        raise ValueError(
            "batch_transcripts: pass keys= or its legacy alias senders=, "
            "not both"
        )
    if keys is None:
        keys = senders
    parsed = parse_events(spark.read.text(source_dir)).filter(
        F.col("error").isNull()
        & F.col("timestamp").isNotNull()
        & F.col(key_col).isNotNull()
    )
    if keys is not None:
        parsed = parsed.filter(F.col(key_col).isin(list(keys)))
    return assemble_transcripts(
        parsed.withColumn("__skey", F.col(key_col).cast("string")),
        line=streaming_turn_line(),
        ts_col="ts",
        user_col="__skey",
        order_col="event_id",
        gap_minutes=gap_minutes,
        max_turns=max_turns,
    ).select(
        F.col("__skey").alias("sender"),
        F.unix_millis("session_start").alias("session_start_ms"),
        F.unix_millis("session_end").alias("session_end_ms"),
        "n_events", "n_turns", "n_tokens", "transcript",
    )


def finalize_transcripts(
    spark: SparkSession,
    source_dir: str,
    stream_target_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
    key_col: str = "sender",
) -> DataFrame:
    """The EXPORT fixed point of the watermarked assembler
    (`streaming/stateful.py:start_transcript_stream_watermarked`): after
    the source drains, the watermark stops advancing, so each key's
    final open session sits in the state store forever and never emits
    — by design (a later event could still extend it). The full-corpus
    export is therefore *streamed closed rows + the batch-derived
    tail*: every batch session whose (sender, session_start_ms)
    identity the stream has not emitted, anti-joined in. For any
    drift-free stream (all lateness within the watermark horizon — the
    wm assembler's pinned guarantee) the result is BYTE-IDENTICAL to
    :func:`batch_transcripts`, because streamed closed rows are
    byte-identical to their batch counterparts and the anti-join
    supplies exactly the complement.

    Precondition: the stream is quiesced/drained (same contract as
    `repair_transcripts` ``include_open=True``). Scale shape: one
    anti-join on the session identity — the streamed side ships only
    (key, start) pairs into the join; the batch derivation is the same
    session-sized relation the repair uses."""
    batch = batch_transcripts(
        spark, source_dir, gap_minutes, max_turns, key_col=key_col
    )
    if not sinks.has_parquet(stream_target_dir):
        return batch
    streamed = spark.read.parquet(stream_target_dir).select(
        *TRANSCRIPT_COLUMNS
    )
    tail = batch.join(
        streamed.select("sender", "session_start_ms"),
        on=["sender", "session_start_ms"],
        how="left_anti",
    )
    return streamed.unionByName(tail)


def _final_session_identities(batch: DataFrame) -> DataFrame:
    """(sender, session_start_ms) of each key's LAST batch session —
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


def _key_checksums(df: DataFrame) -> DataFrame:
    """(sender, __n, __ck, __ck2): row count + TWO order-free checksums
    of the full row content — the per-key compare unit. The first is a
    summed crc32, the second a summed 32-bit-masked xxhash64 of the SAME
    row rendering — two structurally different hash families, so a drift
    must collide both (~2⁻⁶⁴ for random corruption). A salted second
    crc32 (what r11 shipped) is NOT independent for the common
    single-row same-length substitution: CRC32 is affine in its initial
    state at fixed message length, so any same-length row swap that
    collides crc32(row) deterministically collides crc32(salt||row) too
    — xxhash64 shares no such structure (r12, ADVICE). Both sums are of
    32-bit values on purpose: per-key sums stay inside a long for any
    plausible key cardinality — Spark 4 runs ANSI mode by default, where
    a long-sum overflow is a runtime ERROR, and unmasked xxhash64 sums
    would cross it after a handful of rows. Fields
    join under an explicit unit separator: with no delimiter, adjacent
    numeric fields would make STRUCTURAL collisions ((1, 12) vs (11, 2)
    concatenate identically) — not crc32-random at all. Each field also
    carries an explicit null flag: concat_ws SKIPS null arguments (it
    does not render them), so without the flag a NULL and an empty
    string would hash identically and a NULL-vs-'' drift would evade
    detection."""
    parts: list[F.Column] = []
    for c in TRANSCRIPT_COLUMNS:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        parts.append(F.isnull(F.col(c)).cast("int"))
    row = F.concat_ws("\x1f", *parts)
    return df.groupBy("sender").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.crc32(row)).alias("__ck"),
        # mask BEFORE summing: xxhash64 & 0xFFFFFFFF keeps each term in
        # [0, 2³²) so the ANSI-safe bounded-sum property of the crc32
        # sum carries over to the independent family
        F.sum(
            F.xxhash64(row).bitwiseAND(F.lit(0xFFFFFFFF))
        ).alias("__ck2"),
    )


def _require_quiesced(spark: SparkSession, target_dir: str) -> None:
    """Refuse to repair a target an ACTIVE upsert stream in this session
    is still writing: the repair rmtree's bucket directories and
    dynamic-overwrites partitions, and a racing micro-batch could
    resurrect pre-repair rows or read half-deleted buckets. This guard
    catches the in-session footgun; across sessions the quiesce
    requirement is a documented precondition the operator must enforce
    (stop or drain the stream first)."""
    tgt = os.path.abspath(target_dir)
    active = {q.id for q in spark.streams.active}
    for qid, qtgt in _ACTIVE_UPSERT_TARGETS.items():
        if qtgt == tgt and qid in active:
            raise RuntimeError(
                f"repair_transcripts: streaming query {qid} is actively "
                f"writing {target_dir!r}; stop or drain it before "
                f"repairing (the rewrite is not safe concurrently with "
                f"the upsert stream's foreachBatch)"
            )


def repair_transcripts(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
    keys: list[str] | None = None,
    include_open: bool = False,
    key_col: str = "sender",
    senders: list[str] | None = None,
) -> DataFrame:
    """Converge a streamed transcript target (the
    :func:`start_transcript_upsert_stream` layout) to the batch-exact
    derivation for every key whose rows drifted — the late-event
    repair job. Returns the affected keys as a ONE-COLUMN DATAFRAME
    (``sender``), already materialized (localCheckpoint) so it stays
    valid after the rewrite; collect it only when you know the drifted
    set is small — under full drift it is corpus-keyed, which is
    exactly why the repair itself never materializes it on the driver
    (the only collects in this function are bucket ids, bounded by the
    bucket count).

    **Quiesce contract (hard precondition):** no live
    `start_transcript_upsert_stream` query may be writing
    ``target_dir`` while the repair runs — the rewrite deletes and
    dynamic-overwrites the very partitions a racing micro-batch would
    read and write, with no commit protocol between them. Queries
    started in THIS session are checked and refused automatically;
    cross-session writers must be stopped (or fully drained via
    ``trigger(availableNow=True)`` termination) by the operator.

    ``keys=None`` detects drift by per-key count+checksum compare
    between the target and :func:`batch_transcripts` (full outer on the
    key, so keys missing from either side are caught); an explicit
    ``keys`` list ALSO narrows the batch derivation to those values
    (key-sized repair cost, see `batch_transcripts`). ``senders`` is
    the legacy alias of ``keys``. ``key_col`` selects the timeline key
    of the SOURCE ('sender' or 'room_id' — the multi-speaker room
    stream); the target schema's key slot is named 'sender' either way.

    ``include_open=False`` (default) claims no authority over each
    key's FINAL batch session: its (sender, session_start_ms)
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
    for a key (spurious streamed rows, zero batch rows): touched
    buckets derive from the AFFECTED-KEY set, not from the rewrite
    rows, and a touched bucket whose merge output is empty has its
    partition directory removed explicitly (dynamic overwrite only
    replaces partitions present in the output). Affected keys' rows
    are replaced wholesale; untouched buckets are never read and stay
    byte-identical (the sink's pinned contract, re-pinned for this
    path in tests/test_streaming.py)."""
    import shutil

    if keys is not None and senders is not None:
        raise ValueError(
            "repair_transcripts: pass keys= or its legacy alias senders=, "
            "not both"
        )
    if keys is None:
        keys = senders
    _require_quiesced(spark, target_dir)
    batch = batch_transcripts(
        spark, source_dir, gap_minutes, max_turns, keys=keys, key_col=key_col
    ).localCheckpoint(eager=True)
    final_ids = None
    if not include_open:
        final_ids = _final_session_identities(batch)
        batch_scope = batch.join(
            final_ids,
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
            final_ids,
            on=["sender", "session_start_ms"],
            how="left_anti",
        )

    if keys is None:
        if sinks.has_parquet(target_dir):
            tgt = spark.read.parquet(target_dir).select(*TRANSCRIPT_COLUMNS)
        else:
            tgt = batch.filter(F.lit(False))
        cmp_ = _key_checksums(batch_scope).join(
            _key_checksums(_without_final(tgt)).select(
                F.col("sender"),
                F.col("__n").alias("__tn"),
                F.col("__ck").alias("__tck"),
                F.col("__ck2").alias("__tck2"),
            ),
            on="sender",
            how="full_outer",
        )
        # the affected-key set stays a DataFrame: under full drift it is
        # corpus-keyed, so a driver-side list would OOM the driver and an
        # isin() literal would blow up the plan. A NULL key cannot exist
        # in either plane (both filter the key NOT NULL) — dropped
        # defensively: name-keyed joins could neither rewrite nor delete
        # it. localCheckpoint both cuts the checksum-compare lineage (the
        # set is consumed by three joins + the bucket collect) and keeps
        # the returned frame valid after the target is overwritten.
        affected = (
            cmp_.filter(
                ~(
                    F.col("__n").eqNullSafe(F.col("__tn"))
                    & F.col("__ck").eqNullSafe(F.col("__tck"))
                    & F.col("__ck2").eqNullSafe(F.col("__tck2"))
                )
            )
            .select("sender")
            .filter(F.col("sender").isNotNull())
            .localCheckpoint(eager=True)
        )
    else:
        affected = spark.createDataFrame(
            [(k,) for k in keys if k is not None], "sender string"
        ).localCheckpoint(eager=True)
    if affected.isEmpty():
        return affected

    bucket = sinks.key_bucket(["sender"], sinks.DEFAULT_UPSERT_BUCKETS)
    # bounded collect: distinct BUCKET ids of the affected keys — at most
    # DEFAULT_UPSERT_BUCKETS rows regardless of drift size
    touched = [
        r[0] for r in affected.select(bucket.alias("b")).distinct().collect()
    ]
    # semi/anti joins carry the affected set to the executors; AQE
    # broadcasts it when small (the designed few-drifted-keys case) and
    # shuffles it when corpus-sized (full drift) — never an isin literal
    repaired = batch_scope.join(
        affected, on="sender", how="left_semi"
    ).withColumn(sinks.BUCKET_COL, bucket)
    existing = None
    if sinks.has_parquet(target_dir):
        existing = spark.read.parquet(target_dir).filter(
            F.col(sinks.BUCKET_COL).isin(touched)
        )
    if existing is None:
        merged = repaired
    else:
        # replace the affected keys' rows WHOLESALE — the repair owns
        # their full session history, not individual session identities
        # (a spurious streamed session has no batch counterpart to
        # match) — EXCEPT rows in the no-authority zone (an affected
        # key's idle-flushed final session survives verbatim)
        keep_final = (
            existing.join(affected, on="sender", how="left_semi").join(
                final_ids,
                on=["sender", "session_start_ms"],
                how="left_semi",
            )
            if final_ids is not None
            else existing.filter(F.lit(False))
        )
        merged = (
            existing.join(affected, on="sender", how="left_anti")
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
    return affected
