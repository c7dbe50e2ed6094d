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

        # no isEmpty() pre-check: it would re-run the stateful plan once
        # before partitioned_upsert persists it; the upsert's own
        # touched-bucket collect discovers emptiness and returns before
        # scheduling the merge/write jobs (r13)
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


# --------------------------------------------------------------------------
# Continuous conversation-transcript assembly
# --------------------------------------------------------------------------

TRANSCRIPT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("sender", T.StringType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("transcript", T.StringType()),
    ]
)

TRANSCRIPT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("turns", T.ArrayType(T.StringType())),
    ]
)


def streaming_turn_line() -> "F.Column":
    """The ONE turn-line rendering every streaming transcript surface
    shares — both stateful assemblers and the reconcile module's batch
    derivation import THIS definition, so the stream/batch/repair parity
    contract cannot drift through a divergent copy. NULL-propagating on
    event_type/sender by design: a typeless event renders a NULL line,
    which every plane SKIPS in the joined transcript while still
    counting its turn slot (the batch operator's array_join semantics
    and the oracle's string_agg agree)."""
    return F.concat(
        F.col("sender"), F.lit(" "), F.col("event_type"), F.lit(": "),
        F.coalesce(F.col("content"), F.lit("")),
    )


def _closed_session(key: str, st: tuple, gap_ms: int) -> dict:
    start_ms, last_ms, n_events, turns = st
    # a NULL line (typeless event) fills its turn slot but renders
    # nothing — matching the batch operator, whose array_join skips null
    # elements while size() counts them; a bare join would crash on None
    transcript = "\n".join(t for t in turns if t is not None)
    return {
        "sender": key,
        "session_start_ms": start_ms,
        "session_end_ms": last_ms + gap_ms,
        "n_events": n_events,
        "n_turns": len(turns),
        # UNCONDITIONAL split — the batch plane's token_count is
        # size(split(text, " ")), which is 1 for the empty string, and
        # python's "".split(" ") == [""] agrees. A former `if transcript
        # else 0` guard here made an ALL-typeless session (every turn a
        # NULL line → empty transcript) violate the stream≡batch parity
        # contract and read as drift to repair_transcripts.
        "n_tokens": len(transcript.split(" ")),
        "transcript": transcript,
    }


def _make_transcript_updater(gap_ms: int, max_turns: int, flush_idle: bool):
    if max_turns < 1:
        # match the batch operator's contract (assemble_transcripts)
        raise ValueError(f"transcript stream: max_turns={max_turns} < 1")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        out: list[dict] = []
        if flush_idle and state.hasTimedOut:
            # idle flush: the open session closes with no new rows
            out.append(_closed_session(key[0], tuple(state.get), gap_ms))
            state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in TRANSCRIPT_OUTPUT_SCHEMA])
            return
        st = list(state.get) if state.exists else None
        frames = [p for p in pdfs if not p.empty]
        # pd.concat([]) raises — a key can surface with only empty frames
        batch = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if len(batch):
            batch = batch.sort_values(["timestamp", "event_id"])
            for ts_ms, line in zip(batch["timestamp"], batch["line"]):
                ts_ms = int(ts_ms)
                if st is not None and ts_ms - st[1] > gap_ms:
                    out.append(_closed_session(key[0], tuple(st), gap_ms))
                    st = None
                if st is None:
                    st = [ts_ms, ts_ms, 0, []]
                st[1] = max(st[1], ts_ms)
                st[2] += 1
                if len(st[3]) < max_turns:
                    # arrow may surface a NULL line as None OR NaN —
                    # normalize so the array<string> state stays valid
                    st[3].append(line if isinstance(line, str) else None)
        if st is not None:
            state.update(tuple(st))
            if flush_idle:
                state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(out, columns=[f.name for f in TRANSCRIPT_OUTPUT_SCHEMA])

    return update


def start_transcript_stream(
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
) -> StreamingQuery:
    """Continuous conversation-transcript assembly — the STREAMING form of
    `ext/transcripts.py:assemble_transcripts`: per-sender inactivity
    sessions accumulate in the state store across micro-batches and
    restarts; a session CLOSES (and its transcript row appends to the
    parquet target, exactly-once via the native file sink) when a later
    event arrives past the gap — or, with ``flush_idle=True``, when the
    processing-time timeout fires on an idle key. Turn lines are rendered
    JVM-side (one concat column) BEFORE the stateful stage; the Python
    function only appends bounded lists — state per key is ≤ max_turns
    lines plus three longs.

    Ordering contract: turns order by (timestamp, event_id) WITHIN each
    micro-batch and by arrival across batches — a strict event-time total
    order holds exactly when the source delivers each sender's timeline
    in order (the chat-sync contract; the reference's timeline listener
    consumes an ordered per-room stream). The batch operator is the
    order-exact form for backfills; the parity test pins closed sessions
    equal between the two on in-order input. Late events WITHIN the gap
    horizon extend the open session (their lines order by arrival);
    events older than a CLOSED session start a spurious new session —
    the same semantics every gap-sessionizer has without a watermark
    re-sort. When late delivery is expected, use the REPAIRABLE layout
    instead: `streaming/reconcile.py:start_transcript_upsert_stream`
    writes a sender-bucketed upsert target that
    `reconcile.repair_transcripts` converges back to the batch-exact
    derivation in place (this native-file-sink form is append-only —
    its _spark_metadata log forbids batch rewrites — so it stays the
    pure-append export path).

    session_end_ms = last event + gap, matching the batch operator and
    `F.session_window`."""
    from beeper_matric_etl_tool_spark.streaming.ingest import (
        load_stream,
        parse_events,
    )

    events = parse_events(
        load_stream(spark, source_dir, max_files_per_trigger)
    ).filter(
        F.col("error").isNull()
        & F.col("timestamp").isNotNull()
        & F.col(key_col).isNotNull()
    )
    # ``key_col`` generalizes the session key: 'sender' (default — the
    # per-user timeline) or 'room_id' (the MULTI-SPEAKER room document,
    # the reference's natural unit; the batch twin is events_sessions
    # kind='transcript_room'). Turn lines keep the per-event SPEAKER tag
    # either way — the line renders from the sender column BEFORE the
    # key is aliased into the output's 'sender' slot.
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
    writer = (
        closed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# Watermarked transcript assembly — bounded-lateness EXACT ordering
# --------------------------------------------------------------------------

WM_TRANSCRIPT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("turns", T.ArrayType(T.StringType())),
        T.StructField("pend_ts", T.ArrayType(T.LongType())),
        T.StructField("pend_eid", T.ArrayType(T.StringType())),
        T.StructField("pend_line", T.ArrayType(T.StringType())),
    ]
)


def _make_wm_transcript_updater(gap_ms: int, max_turns: int):
    """The watermark re-sort the arrival-order assembler lacks. Invariants:

    - events with ts < watermark are FINAL in both membership and order
      (any future delivery carries ts >= watermark), so they fold into a
      COMPACT open-session accumulator (start, last, n, first max_turns
      lines) exactly once, in globally-sorted (ts, event_id) order;
    - events with ts >= watermark are UNSTABLE (a late sibling could
      still sort before them) and wait in a raw buffer — bounded by the
      lateness horizon x event rate, never the stream's lifetime;
    - an open session CLOSES only when last_ms + gap < watermark: every
      future event then has ts >= watermark > last + gap, i.e. strictly
      past the gap, so the close is final by construction;
    - an arriving event with ts < watermark is beyond the declared
      lateness horizon and DROPS deterministically (the documented
      watermark contract), never mis-sorts into a folded prefix.

    Consequence (pinned in tests): for any input whose lateness stays
    within the watermark delay, the closed-session stream is
    BYTE-IDENTICAL to `ext/transcripts.py:assemble_transcripts` — the
    property the arrival-order form (`start_transcript_stream`) only
    holds on in-order input."""

    if max_turns < 1:
        # match the batch operator's contract (assemble_transcripts)
        raise ValueError(f"transcript stream: max_turns={max_turns} < 1")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            start, last, n, turns, p_ts, p_eid, p_line = state.get
            pend = list(zip(p_ts, p_eid, p_line))
            open_s = (
                [start, last, n, list(turns)] if start is not None else None
            )
        else:
            pend, open_s = [], None
        for pdf in pdfs:
            if pdf.empty:
                continue
            for ts_ms, eid, line in zip(
                pdf["timestamp"], pdf["event_id"], pdf["line"]
            ):
                ts_ms = int(ts_ms)
                if ts_ms < wm:
                    continue  # beyond the lateness horizon — dropped
                pend.append(
                    (ts_ms, str(eid), line if isinstance(line, str) else None)
                )
        pend.sort(key=lambda e: (e[0], e[1]))
        stable = [e for e in pend if e[0] < wm]
        pend = [e for e in pend if e[0] >= wm]
        out: list[dict] = []
        for ts_ms, _eid, line in stable:
            if open_s is not None and ts_ms - open_s[1] > gap_ms:
                out.append(
                    _closed_session(
                        key[0],
                        (open_s[0], open_s[1], open_s[2], open_s[3]),
                        gap_ms,
                    )
                )
                open_s = None
            if open_s is None:
                open_s = [ts_ms, ts_ms, 0, []]
            open_s[1] = ts_ms  # stable region is sorted: ts only advances
            open_s[2] += 1
            if len(open_s[3]) < max_turns:
                open_s[3].append(line)
        if open_s is not None and open_s[1] + gap_ms < wm:
            out.append(
                _closed_session(
                    key[0], (open_s[0], open_s[1], open_s[2], open_s[3]),
                    gap_ms,
                )
            )
            open_s = None
        if open_s is None and not pend:
            if state.exists:
                state.remove()
        else:
            s = open_s if open_s is not None else [None, None, None, []]
            state.update(
                (
                    s[0], s[1], s[2], s[3],
                    [e[0] for e in pend],
                    [e[1] for e in pend],
                    [e[2] for e in pend],
                )
            )
            # event-time timeout re-arm: with NoTimeout a key is only
            # invoked when NEW rows arrive, so an idle sender's session
            # would never close on watermark advance alone. Wake at the
            # next decision point: the open session's close time or the
            # earliest unstable event becoming stable. Both candidates
            # are >= the current watermark by construction (a closable
            # session already closed above; pend holds ts >= wm), so +1
            # satisfies Spark's timeout-after-watermark requirement.
            cands = []
            if open_s is not None:
                cands.append(open_s[1] + gap_ms)
            if pend:
                cands.append(pend[0][0])
            state.setTimeoutTimestamp(min(cands) + 1)
        yield pd.DataFrame(
            out, columns=[f.name for f in TRANSCRIPT_OUTPUT_SCHEMA]
        )

    return update


def start_transcript_stream_watermarked(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    max_turns: int = 64,
    lateness: str = "10 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    key_col: str = "sender",
) -> StreamingQuery:
    """Continuous transcript assembly with a WATERMARK RE-SORT — the
    bounded-lateness exact form. Where `start_transcript_stream` orders
    turns by arrival across micro-batches (exact only on in-order
    sources) and `streaming/reconcile.py` repairs drift after the fact,
    this operator buys exactness up front: events buffer per sender
    until the event-time watermark passes them, fold into sessions in
    true (ts, event_id) order, and a session only closes when no
    within-horizon event can still extend or reorder it. Closed output
    is byte-identical to the batch operator for any input whose
    lateness stays within ``lateness``; events later than that drop
    deterministically (the watermark contract — choose the horizon the
    way you would for any windowed aggregation).

    State per sender: one compact open session (<= max_turns lines +
    three longs) + the unstable buffer (events newer than the
    watermark — bounded by lateness x per-sender rate, NOT by session
    length or stream lifetime, because the stable prefix folds
    incrementally). The cost vs the arrival-order form is output
    latency: a session appears only after the watermark passes its gap.

    **Finalize/export contract:** after the source drains the watermark
    stops advancing, so each key's final open session never emits —
    deliberately (a later event could still extend it; there is no
    flush_idle here because an idle flush would break the byte-identical
    guarantee). The full-corpus export is
    `streaming/reconcile.py:finalize_transcripts`: streamed closed rows
    + the batch-derived complement, pinned byte-identical to the full
    batch derivation for drift-free streams.

    Exactly-once via the native file sink, like the arrival-order
    form."""
    events = parse_events(
        load_stream(spark, source_dir, max_files_per_trigger)
    ).filter(
        F.col("error").isNull()
        & F.col("timestamp").isNotNull()
        & F.col(key_col).isNotNull()
    )
    # key_col generalizes the session key exactly as in
    # start_transcript_stream: 'room_id' yields the multi-speaker room
    # document; the speaker tag renders per event regardless of key
    lined = events.select(
        F.col(key_col).cast("string").alias("__skey"),
        "timestamp",
        "event_id",
        "ts",
        streaming_turn_line().alias("line"),
    ).withWatermark("ts", lateness)
    closed = lined.groupBy("__skey").applyInPandasWithState(
        _make_wm_transcript_updater(int(gap_minutes) * 60_000, int(max_turns)),
        outputStructType=TRANSCRIPT_OUTPUT_SCHEMA,
        stateStructType=WM_TRANSCRIPT_STATE_SCHEMA,
        outputMode="append",
        # EventTimeTimeout: idle keys MUST wake when the watermark passes
        # their next decision point (close an open session / fold newly
        # stable events) — with NoTimeout only keys with fresh rows are
        # invoked and an idle sender's last session would never close
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        closed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
