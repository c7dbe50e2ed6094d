"""Streaming behavior tests (SURVEY §2.9 T1–T8): checkpointed resume,
redelivery collapse, watermark late-drop, dead-letter rows. These are
stateful and deliberately outside the DuckDB oracle tier (SURVEY §7)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.streaming import ingest

T0_MS = 1718000000000  # fixed event-time origin (epoch millis)


def _event(eid: str, ts_offset_min: int = 0, body: str = "hi", etype: str = "m.room.message"):
    return json.dumps(
        {
            "event_id": eid,
            "room_id": "!r1",
            "sender": "@alice:example.org",
            "event_type": etype,
            "timestamp": T0_MS + ts_offset_min * 60_000,
            "is_encrypted": False,
            "content": {"body": body, "msgtype": "m.text"},
            "relates_to": None,
        }
    )


_MTIME_SEQ = [0]


def _write_file(src, name: str, lines: list[str]) -> None:
    """Write a source file with a strictly increasing mtime: Spark's
    FileStreamSource orders files by MODIFICATION TIME (ms resolution)
    under maxFilesPerTrigger, and several tests depend on delivery
    order — two files written within the same millisecond would arrive
    in undefined order."""
    p = src / name
    p.write_text("\n".join(lines) + "\n")
    _MTIME_SEQ[0] += 2
    t = time.time() + _MTIME_SEQ[0]
    os.utime(p, (t, t))


def _run_drain(spark, src, tgt, ckpt, **kw):
    q = ingest.start_ingest(
        spark, str(src), str(tgt), str(ckpt), available_now=True, **kw
    )
    q.awaitTermination(120)
    assert not q.isActive
    return q


def test_ingest_dedup_redelivery_and_resume(spark, tmp_path):
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()

    # batch 1: three events, e1 duplicated in the same sync page (T4)
    _write_file(src, "page1.json", [_event("e1"), _event("e2", 1), _event("e1"), _event("e3", 2)])
    q = _run_drain(spark, src, tgt, ckpt)
    out = spark.read.parquet(str(tgt))
    assert sorted(r.event_id for r in out.collect()) == ["e1", "e2", "e3"]

    # batch 2 after restart: same page redelivered as a new file + one new
    # event — only e4 lands (T1 resume from checkpoint + K1 idempotence)
    _write_file(src, "page2.json", [_event("e1"), _event("e2", 1), _event("e4", 3)])
    _run_drain(spark, src, tgt, ckpt)
    out = spark.read.parquet(str(tgt))
    assert sorted(r.event_id for r in out.collect()) == ["e1", "e2", "e3", "e4"]
    # progress surface (T7)
    assert "batch_id" in ingest.progress_summary(q)


def test_dead_letter_rows_survive_with_error(spark, tmp_path):
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "page1.json", [_event("e1"), "{this is not json", _event("e2", 1)])
    _run_drain(spark, src, tgt, ckpt)
    out = spark.read.parquet(str(tgt)).collect()
    errors = [r for r in out if r.error is not None]
    assert len(errors) == 1 and errors[0].error.startswith("parse_error: ")
    assert sorted(r.event_id for r in out if r.error is None) == ["e1", "e2"]


def test_watermark_drops_backfilled_history(spark, tmp_path):
    """T3 — the back-pagination skip: after the watermark advanced past t,
    a restart delivering an event far older than the watermark drops it."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "page1.json", [_event("e1", ts_offset_min=600)])  # watermark -> t0+600m-60m
    _run_drain(spark, src, tgt, ckpt, watermark_delay="1 hour")

    _write_file(src, "page2.json", [_event("old", ts_offset_min=0), _event("e2", 601)])
    _run_drain(spark, src, tgt, ckpt, watermark_delay="1 hour")
    out = spark.read.parquet(str(tgt))
    ids = sorted(r.event_id for r in out.collect())
    assert "old" not in ids
    assert ids == ["e1", "e2"]


def test_dimension_maintenance_merges_state_deltas(spark, tmp_path):
    """T5 — membership deltas continuously upserted: latest state per
    (user, room) wins; a second run with an unchanged redelivery leaves the
    dimension identical (change detection skips dead writes)."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "dim", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "p1.json", [
        _event("m1", 0, etype="join"),
        _event("m2", 1, etype="leave"),   # same (sender, room): later state
    ])
    q = ingest.start_dim_maintenance(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tgt)).collect()
    assert len(rows) == 1  # one row per (user_id, room_id)

    _write_file(src, "p2.json", [_event("m3", 2, etype="ban")])
    q = ingest.start_dim_maintenance(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    rows = {(r.user_id, r.room_id): r.membership for r in spark.read.parquet(str(tgt)).collect()}
    assert rows == {("@alice:example.org", "!r1"): "ban"}


def test_processing_time_trigger_steady_state(spark, tmp_path):
    """T6 — the steady-state trigger (the reference's 30 s poll, scaled to
    1 s for the test): files dropped while the query runs are picked up by
    subsequent triggered micro-batches."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "p1.json", [_event("e1")])
    q = ingest.start_ingest(
        spark, str(src), str(tgt), str(ckpt), processing_interval="1 second"
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(tgt)).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        _write_file(src, "p2.json", [_event("e2", 1)])
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(tgt)).count() >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        ids = sorted(r.event_id for r in spark.read.parquet(str(tgt)).collect())
        assert ids == ["e1", "e2"]
        assert q.isActive  # steady-state query keeps running until stopped
    finally:
        q.stop()


def test_append_log_sink(spark, tmp_path):
    """K5/K6/K7 — append-only logs accumulate and are stamped."""
    from beeper_matric_etl_tool_spark import sinks

    path = str(tmp_path / "log")
    df1 = spark.createDataFrame([("ok",)], "status string")
    df2 = spark.createDataFrame([("degraded",)], "status string")
    sinks.append_log(df1, path)
    sinks.append_log(df2, path)
    rows = spark.read.parquet(path).collect()
    assert sorted(r.status for r in rows) == ["degraded", "ok"]
    assert all(r.created_at is not None for r in rows)


def test_windowed_rollup_incremental_maintenance(spark, tmp_path):
    """Continuous aggregate: second batch revises only the windows it
    touches; late data beyond the watermark cannot reopen closed windows."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "roll", tmp_path / "ckpt"
    src.mkdir()
    # hour 0: two events; hour 1: one event
    _write_file(src, "p1.json", [_event("e1", 0), _event("e2", 30), _event("e3", 70)])
    q = ingest.start_windowed_rollup(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    rolled = {r.window_start: r.n_events for r in spark.read.parquet(str(tgt)).collect()}
    assert sorted(rolled.values()) == [1, 2]

    # batch 2: one more event in hour 1 (revises that window only) plus one
    # far-future event advancing the watermark
    _write_file(src, "p2.json", [_event("e4", 80), _event("e5", 600)])
    q = ingest.start_windowed_rollup(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    rolled = {r.window_start: r.n_events for r in spark.read.parquet(str(tgt)).collect()}
    assert sorted(rolled.values()) == [1, 2, 2]  # hour0=2, hour1=2, hour10=1

    # batch 3: a very late event for hour 0 — beyond watermark, dropped
    _write_file(src, "p3.json", [_event("late", 5)])
    q = ingest.start_windowed_rollup(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    rolled2 = {r.window_start: r.n_events for r in spark.read.parquet(str(tgt)).collect()}
    assert rolled2 == rolled


def _event_from(eid: str, sender: str, ts_offset_min: int) -> str:
    e = json.loads(_event(eid, ts_offset_min))
    e["sender"] = sender
    return json.dumps(e)


def test_session_rollup_merges_bridged_sessions(spark, tmp_path):
    """Continuous session aggregate (append mode — Spark emits a session
    once the watermark closes it): gap-based per-user sessions, where a
    bridging event FUSES what would otherwise be two sessions inside the
    state store. Alice gets a bridge, bob doesn't — same timestamps, so
    the fused-vs-split outcome isolates the merge behavior."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "sess", tmp_path / "ckpt"
    src.mkdir()

    def drain():
        q = ingest.start_session_rollup(spark, str(src), str(tgt), str(ckpt))
        q.awaitTermination(120)

    # 30-min gap. alice: 0, 10 (session ends 40) and 65 (second session);
    # bob: 0 and 65 — identical shape
    _write_file(src, "p1.json", [
        _event_from("a1", "@alice:x", 0),
        _event_from("a2", "@alice:x", 10),
        _event_from("b1", "@bob:x", 0),
    ])
    drain()
    _write_file(src, "p2.json", [
        _event_from("a3", "@alice:x", 65),
        _event_from("b2", "@bob:x", 65),
    ])
    drain()
    # bridge for alice ONLY: 38 lands inside session1 (ends 40) and its
    # own gap reaches 68 ≥ 65, so all four alice events fuse into one
    _write_file(src, "p3.json", [_event_from("a4", "@alice:x", 38)])
    drain()
    # watermark advancer (1-hour delay): closes everything before minute
    # ~1440, so the sessions above all emit
    _write_file(src, "p4.json", [_event_from("w1", "@carol:x", 1500)])
    drain()

    rows = [(r.sender, r.n_events) for r in spark.read.parquet(str(tgt)).collect()]
    alice = sorted(n for s, n in rows if s == "@alice:x")
    bob = sorted(n for s, n in rows if s == "@bob:x")
    assert alice == [4], rows      # one fused session
    assert bob == [1, 1], rows     # two separate sessions
    # carol's session is still open (no later watermark) — not emitted
    assert not any(s == "@carol:x" for s, _ in rows)


def test_stateful_user_profiles_accumulate_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-sender counters maintained by the state
    store — a second run (restart) keeps accumulating from checkpointed
    state rather than restarting from zero."""
    from beeper_matric_etl_tool_spark.streaming import stateful

    src, tgt, ckpt = tmp_path / "src", tmp_path / "prof", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "p1.json", [_event("e1", 0), _event("e2", 5), _event("e3", 9)])
    q = stateful.start_user_profiles(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    rows = {r.sender: r for r in spark.read.parquet(str(tgt)).collect()}
    assert rows["@alice:example.org"].n_events == 3

    _write_file(src, "p2.json", [_event("e4", 12)])
    q = stateful.start_user_profiles(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    r = {r.sender: r for r in spark.read.parquet(str(tgt)).collect()}["@alice:example.org"]
    assert r.n_events == 4
    assert r.first_ts == T0_MS and r.last_ts == T0_MS + 12 * 60_000

    # review-found defect, pinned: a valid event with a NULL timestamp
    # (parse only requires event_id) must count toward n_events without
    # poisoning the time bounds — int(NaN) over an all-null batch slice
    # used to kill the whole query
    import json as _json

    nullts = _json.dumps(
        {
            "event_id": "e5", "room_id": "!r1", "sender": "@dave:example.org",
            "event_type": "m.room.message", "timestamp": None,
            "is_encrypted": False, "content": {"body": "x"}, "relates_to": None,
        }
    )
    _write_file(src, "p3.json", [nullts])
    q = stateful.start_user_profiles(spark, str(src), str(tgt), str(ckpt))
    q.awaitTermination(120)
    d = {r.sender: r for r in spark.read.parquet(str(tgt)).collect()}["@dave:example.org"]
    assert d.n_events == 1 and d.first_ts is None and d.last_ts is None


def test_bootstrap_then_stream_runs_backfill_once(spark, tmp_path):
    """S5 — batch backfill only on first start (no checkpoint), stream
    resumes without re-running it afterwards."""
    snap, src, tgt, ckpt = (tmp_path / d for d in ("snap", "src", "tgt", "ckpt"))
    src.mkdir()
    # snapshot: two historical events, as parquet in the sink schema
    hist = spark.createDataFrame(
        [("h1", "!r1", "@a", "m.room.message", T0_MS - 10_000, False, "{}", None, None),
         ("h2", "!r1", "@a", "m.room.message", T0_MS - 5_000, False, "{}", None, None)],
        "event_id string, room_id string, sender string, event_type string, "
        "timestamp long, is_encrypted boolean, content string, relates_to string, error string",
    ).withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    hist.write.parquet(str(snap))

    _write_file(src, "p1.json", [_event("e1")])
    q = ingest.bootstrap_then_ingest(spark, str(snap), str(src), str(tgt), str(ckpt),
                                     available_now=True)
    q.awaitTermination(120)
    ids = sorted(r.event_id for r in spark.read.parquet(str(tgt)).collect())
    assert ids == ["e1", "h1", "h2"]

    # restart: checkpoint exists -> backfill skipped, new stream file lands
    _write_file(src, "p2.json", [_event("e2", 1)])
    q = ingest.bootstrap_then_ingest(spark, str(snap), str(src), str(tgt), str(ckpt),
                                     available_now=True)
    q.awaitTermination(120)
    ids = sorted(r.event_id for r in spark.read.parquet(str(tgt)).collect())
    assert ids == ["e1", "e2", "h1", "h2"]


def test_max_files_per_trigger_bounds_batches(spark, tmp_path):
    """T2 — initialSyncLimit analog: 4 source files with maxFilesPerTrigger=1
    drain as multiple bounded micro-batches, not one giant one."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    for i in range(4):
        _write_file(src, f"p{i}.json", [_event(f"e{i}", i)])
    q = ingest.start_ingest(spark, str(src), str(tgt), str(ckpt),
                            available_now=True, max_files_per_trigger=1)
    q.awaitTermination(180)
    assert spark.read.parquet(str(tgt)).count() == 4
    batch_ids = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
    assert len(batch_ids) >= 4  # one bounded batch per file


def test_dead_letter_redelivery_collapses_but_distinct_bad_lines_kept(spark, tmp_path):
    """The synthetic dead-letter merge key (dead:md5(error)): exact
    redelivery of the same bad line collapses to one quarantine row, while
    two DIFFERENT bad lines are both kept."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "p1.json", [_event("e1"), "{broken one", "{broken two"])
    q = _run_drain(spark, src, tgt, ckpt)
    _write_file(src, "p2.json", ["{broken one"])  # exact redelivery
    q = _run_drain(spark, src, tgt, ckpt)
    rows = spark.read.parquet(str(tgt)).collect()
    errors = sorted(r.error for r in rows if r.error is not None)
    assert len(errors) == 2  # two distinct bad lines, redelivery collapsed
    assert errors == ["parse_error: {broken one", "parse_error: {broken two"]


def test_state_store_deduplicate_path(spark, tmp_path):
    """The in-stream dropDuplicates variant (kept for append-only sinks
    where the merge sink's idempotence isn't available): duplicate ids
    collapse inside the stream, dead-letter rows pass through untouched."""
    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "p1.json", [_event("e1"), _event("e1"), _event("e2", 1), "not json {"])
    events = ingest.parse_events(ingest.load_stream(spark, str(src)))
    deduped = ingest.deduplicate(events)
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tgt))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tgt)).collect()
    good = sorted(r.event_id for r in rows if r.error is None)
    dead = [r for r in rows if r.error is not None]
    assert good == ["e1", "e2"]          # in-stream collapse of the dup
    assert len(dead) == 1 and dead[0].error.startswith("parse_error")


def test_merge_batch_writer_order_col_type_normalization(spark, tmp_path):
    """The merge's order column normalizes by its ACTUAL type: a
    timestamp-typed ordering keeps millisecond precision (a bare long cast
    truncates to seconds and would tie sub-second writes), and a
    non-orderable type raises instead of guessing."""
    import datetime as dt

    target = str(tmp_path / "ts-ordered")
    write = ingest.merge_batch_writer(target, keys=["k"], order_col="ts")
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    batch = spark.createDataFrame(
        [
            ("k1", t0 + dt.timedelta(milliseconds=1), T0_MS, "late"),
            ("k1", t0, T0_MS, "early"),
        ],
        # `timestamp` (epoch ms) feeds the day-bucket layout as usual; the
        # MERGE ordering runs on the timestamp-typed `ts`
        "k string, ts timestamp, timestamp long, v string",
    )
    write(batch, 0)
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {"k1": "late"}  # ms-precision order decided the merge

    # TIMESTAMP_NTZ ordering must work too (unix_millis rejects NTZ
    # directly — the writer casts through TIMESTAMP first; regression
    # cover for the branch that claimed NTZ support but raised
    # DATATYPE_MISMATCH on first use)
    target_ntz = str(tmp_path / "ntz-ordered")
    write_ntz = ingest.merge_batch_writer(target_ntz, keys=["k"], order_col="ts")
    batch_ntz = spark.createDataFrame(
        [
            ("k1", t0 + dt.timedelta(milliseconds=1), T0_MS, "late"),
            ("k1", t0, T0_MS, "early"),
        ],
        "k string, ts timestamp_ntz, timestamp long, v string",
    )
    write_ntz(batch_ntz, 0)
    got = {r.k: r.v for r in spark.read.parquet(target_ntz).collect()}
    assert got == {"k1": "late"}

    bad = spark.createDataFrame(
        [("k1", "not-orderable", T0_MS, "x")],
        "k string, ts string, timestamp long, v string",
    )
    with pytest.raises(TypeError, match="order_col"):
        ingest.merge_batch_writer(str(tmp_path / "bad"), keys=["k"], order_col="ts")(bad, 0)


def test_session_merge_keeps_adjacent_disjoint_sessions(spark, tmp_path):
    """Review-found data loss, pinned: session_window intervals are
    half-open [start, end), so a stored session whose end EQUALS a new
    session's start is adjacent but disjoint — the old closed-interval
    overlap test anti-joined it away and permanently deleted it."""
    from beeper_matric_etl_tool_spark.streaming.ingest import session_merge_writer

    tgt = str(tmp_path / "sessions")
    write = session_merge_writer(tgt, user_col="sender")
    s1 = spark.createDataFrame(
        [("@a:x", 1000, 2000, 3)],
        "sender string, session_start long, session_end long, n_events long",
    )
    write(s1, 0)
    # adjacent: starts exactly at the stored session's end
    s2 = spark.createDataFrame(
        [("@a:x", 2000, 3000, 2)],
        "sender string, session_start long, session_end long, n_events long",
    )
    write(s2, 1)
    rows = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(tgt).collect()
    )
    assert rows == [(1000, 2000, 3), (2000, 3000, 2)]  # BOTH sessions survive
    # genuine overlap still replaces: a fused revision spanning both
    s3 = spark.createDataFrame(
        [("@a:x", 1000, 3000, 5)],
        "sender string, session_start long, session_end long, n_events long",
    )
    write(s3, 2)
    rows = [(r.session_start, r.session_end, r.n_events)
            for r in spark.read.parquet(tgt).collect()]
    assert rows == [(1000, 3000, 5)]


def test_dim_merge_is_order_aware_across_batches(spark, tmp_path):
    """Review-found regression hazard, pinned: a late backfill batch
    carrying OLDER state for a key must not overwrite the newer stored
    state (the old change-detecting merge took any differing incoming
    row, regardless of order)."""
    from beeper_matric_etl_tool_spark.streaming.ingest import dim_merge_writer

    tgt = str(tmp_path / "dim")
    write = dim_merge_writer(tgt, keys=["user_id", "room_id"])
    newer = spark.createDataFrame(
        [("u1", "r1", "leave", 200)],
        "user_id string, room_id string, membership string, last_updated long",
    )
    write(newer, 0)
    older = spark.createDataFrame(
        [("u1", "r1", "join", 100)],
        "user_id string, room_id string, membership string, last_updated long",
    )
    write(older, 1)  # late-arriving backfill
    row = spark.read.parquet(tgt).collect()[0]
    assert (row.membership, row.last_updated) == ("leave", 200)  # no regression
    # a genuinely newer delta still wins
    newest = spark.createDataFrame(
        [("u1", "r1", "ban", 300)],
        "user_id string, room_id string, membership string, last_updated long",
    )
    write(newest, 2)
    row = spark.read.parquet(tgt).collect()[0]
    assert (row.membership, row.last_updated) == ("ban", 300)


def test_bootstrap_preserves_distinct_dead_letter_rows(spark, tmp_path):
    """Review-found collapse, pinned: snapshot dead-letter rows (null
    event_id) must each survive the backfill under the same
    'dead:md5(error)' key derivation the stream sink uses — a bare
    event_id key grouped them all under NULL and kept one."""
    from beeper_matric_etl_tool_spark.streaming import ingest

    snap, src, tgt, ckpt = (tmp_path / d for d in ("snap", "src", "tgt", "ckpt"))
    src.mkdir()
    hist = spark.createDataFrame(
        [
            ("e1", "!r", "@a:x", "m.room.message", T0_MS, False, "{}", None, None),
            (None, None, None, None, None, None, None, None, "parse_error: {bad one"),
            (None, None, None, None, None, None, None, None, "parse_error: {bad two"),
        ],
        "event_id string, room_id string, sender string, event_type string, "
        "timestamp long, is_encrypted boolean, content string, relates_to string, "
        "error string",
    ).withColumn("ts", F.timestamp_millis(F.col("timestamp")))
    hist.write.parquet(str(snap))
    _write_file(src, "p1.json", [_event("e2", 1)])
    # available_now: drain-and-stop so awaitTermination returns at
    # termination — the continuous default made this 3-row test sleep
    # the FULL 120 s timeout (r14; the bootstrap/key derivation under
    # test is identical in both trigger modes)
    q = ingest.bootstrap_then_ingest(
        spark, str(snap), str(src), str(tgt), str(ckpt), available_now=True
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tgt)).collect()
    dead = sorted(r.error for r in rows if r.error is not None)
    assert dead == ["parse_error: {bad one", "parse_error: {bad two"]
    assert sorted(r.event_id for r in rows if r.error is None) == ["e1", "e2"]


def test_quality_and_pii_kernels_run_in_stream(spark, tmp_path):
    """The curation kernels (ext/quality.py) are stateless column algebra,
    so the SAME expressions the batch pipeline and the driver-oracled
    queries use apply unchanged to a streaming DataFrame — streaming
    corpus curation is the batch kernels, not a parallel implementation.
    One planted PII doc and one degenerate doc flow through a readStream
    and come out flagged exactly as in batch."""
    from beeper_matric_etl_tool_spark.ext.quality import (
        pii_columns,
        quality_signal_columns,
        quality_verdict_columns,
    )

    src, tgt, ckpt = tmp_path / "qsrc", tmp_path / "qtgt", tmp_path / "qckpt"
    src.mkdir()
    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines "
        "under a wide sky full of bright and patient little stars"
    )
    docs = [
        '{"doc_id": 1, "text": "' + good + ' write to bob@example.org today"}',
        '{"doc_id": 2, "text": "' + ("spam " * 60).strip() + '"}',
    ]
    (src / "docs.json").write_text("\n".join(docs))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    signals = quality_signal_columns("text")
    pii = pii_columns("text")
    curated = (
        stream.select("doc_id", "text", *[c.alias(n) for n, c in signals.items()])
        .select("*", *[c.alias(n) for n, c in quality_verdict_columns().items()])
        .withColumn("scrubbed", pii["scrubbed"])
        .withColumn("n_emails", pii["n_emails"])
    )
    q = (
        curated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tgt))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.read.parquet(str(tgt)).collect()}
    assert rows[1].keep and rows[1].n_emails == 1
    assert "<EMAIL>" in rows[1].scrubbed and "bob@example.org" not in rows[1].scrubbed
    assert not rows[2].keep and not rows[2].ttr_ok


def test_pipeline_downstream_of_load_stream_is_source_agnostic(spark, tmp_path):
    """load_stream claims source-agnosticism: everything downstream of it
    consumes only a string `value` column. Pinned by driving parse_events
    → merge_batch_writer from a RATE source (no files anywhere on the
    source side) with a synthesized JSON value column — if anything below
    load_stream assumed file semantics (file names, maxFilesPerTrigger,
    per-file ordering), this wiring could not run at all."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.to_json(
                F.struct(
                    F.concat(F.lit("$ev"), F.col("value").cast("string")).alias("event_id"),
                    F.concat(F.lit("!r"), (F.col("value") % 4).cast("string")).alias("room_id"),
                    F.concat(F.lit("@u"), (F.col("value") % 7).cast("string")).alias("sender"),
                    F.lit("m.room.message").alias("event_type"),
                    F.unix_millis(F.col("timestamp")).alias("timestamp"),
                    F.lit(False).alias("is_encrypted"),
                    F.lit('{"body": "from-rate-source"}').alias("content"),
                    F.lit(None).cast("string").alias("relates_to"),
                )
            ).alias("value")
        )
    )
    events = ingest.parse_events(raw)
    tgt, ckpt = str(tmp_path / "tgt"), str(tmp_path / "ckpt")
    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            ingest.merge_batch_writer(tgt, keys=["event_id"], watermark_delay_ms=3_600_000)
        )
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            from beeper_matric_etl_tool_spark import sinks

            if sinks.has_parquet(tgt):
                n = spark.read.parquet(tgt).count()
                if n > 0:
                    break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert n > 0  # rows flowed source → parse → merge with zero files read
    out = spark.read.parquet(tgt)
    # every synthesized line parsed clean (no dead-letter rows) and the
    # merge key held (unique event_ids) — the same contracts the file
    # path's tests pin, now proven independent of the source kind
    assert out.filter(F.col("error").isNotNull()).count() == 0
    assert out.select("event_id").distinct().count() == out.count()
    assert {r.room_id for r in out.select("room_id").distinct().collect()} <= {
        "!r0", "!r1", "!r2", "!r3"
    }


def test_continuous_curation_stream_dedups_across_batches(spark, tmp_path):
    """The streaming funnel end-to-end: batch 1's survivor is appended to
    the persisted dedup index, so batch 2's copy of it is dropped even
    though the two documents never met in one micro-batch — the
    cross-batch property only the index can provide. Quality-gate
    rejects and within-index duplicates drop too; the audit trail
    records per-batch in/kept counts."""
    import time

    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index
    from beeper_matric_etl_tool_spark.streaming.curation import (
        start_curation_stream,
    )

    az = "abcdefghijklmnopqrstuvwxyz"

    def body(d: int) -> str:
        return " ".join(
            f"w{az[d]}{az[i // 26]}{az[i % 26]}fill {'the' if i % 2 else 'of'}"
            for i in range(30)
        )

    seed = spark.createDataFrame(
        [(0, "en", body(0))], "doc_id long, lang string, text string"
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(seed.select("doc_id", "text"), idx, portable=False)

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    audit = str(tmp_path / "audit")

    stream = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .json(str(src))
    )
    q = start_curation_stream(
        stream, idx, out, str(tmp_path / "ckpt"), audit_dir=audit
    )
    try:
        import json as _json

        def emit(name, rows):
            with open(src / name, "w") as fh:
                for r in rows:
                    fh.write(_json.dumps(r) + "\n")
            q.processAllAvailable()

        # batch 1: A unique, B duplicates the SEED (dropped via index),
        # C fails the quality gate (too short)
        emit("b1.json", [
            {"doc_id": 1, "lang": "en", "text": body(1)},
            {"doc_id": 2, "lang": "en", "text": body(0)},
            {"doc_id": 3, "lang": "en", "text": "the of too short"},
        ])
        kept1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept1 == {1}

        # batch 2: D duplicates batch 1's survivor A (cross-batch drop —
        # A entered the index when batch 1 committed), E unique
        emit("b2.json", [
            {"doc_id": 4, "lang": "en", "text": body(1)},
            {"doc_id": 5, "lang": "en", "text": body(5)},
        ])
        kept2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept2 == {1, 5}

        audits = {
            r["batch_id"]: (r["n_in"], r["n_kept"])
            for r in spark.read.parquet(audit).collect()
        }
        assert audits[0] == (3, 1) and audits[1] == (2, 1)
    finally:
        q.stop()


def test_curation_writer_validates_index_meta_at_construction(spark, tmp_path):
    """A writer whose id/text columns disagree with the dedup index's
    frozen _META.json must fail at CONSTRUCTION, not mid-stream after a
    corpus append (round-6 ADVICE item)."""
    import pytest as _pytest

    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index
    from beeper_matric_etl_tool_spark.streaming.curation import (
        curation_batch_writer,
    )

    idx = str(tmp_path / "idx")
    seed = spark.createDataFrame(
        [(1, "seed corpus document body")], "doc_id long, text string"
    )
    build_dedup_index(seed, idx)
    with _pytest.raises(ValueError, match="frozen config"):
        curation_batch_writer(idx, str(tmp_path / "out"), id_col="uid")
    with _pytest.raises(FileNotFoundError):
        curation_batch_writer(str(tmp_path / "noindex"), str(tmp_path / "out"))
    # matching config constructs fine
    assert curation_batch_writer(idx, str(tmp_path / "out")) is not None


def test_curation_stream_invalid_index_strands_no_marker(spark, tmp_path):
    """start_curation_stream against a non-index path must fail from the
    writer's read_meta gate BEFORE the checkpoint-binding marker is
    written — a stranded _STREAM.json in a wrong directory would block a
    later legitimate stream until an operator hand-deletes it (round-7
    ADVICE item). A missing directory likewise raises the gate's own
    error, not a raw open() FileNotFoundError from the marker writer."""
    import os as _os

    import pytest as _pytest

    from beeper_matric_etl_tool_spark.streaming.curation import (
        start_curation_stream,
    )

    notindex = tmp_path / "notindex"
    notindex.mkdir()
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "'en' AS lang", "'x' AS text")
    )
    with _pytest.raises(FileNotFoundError, match="not an index"):
        start_curation_stream(
            stream, str(notindex), str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )
    assert not _os.path.exists(notindex / "_STREAM.json")
    with _pytest.raises(FileNotFoundError):
        start_curation_stream(
            stream, str(tmp_path / "missing"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
        )


def test_curation_writer_rejects_flat_layout_outputs(spark, tmp_path):
    """The staged exactly-once writer dynamic-overwrites hive partitions;
    pointing it at a directory populated by the old FLAT-append layout
    would mix layouts and corrupt reads — the construction-time gate
    rejects it for both out_dir and audit_dir, while fresh/missing
    directories and matching hive layouts pass (round-7 ADVICE item)."""
    import pytest as _pytest

    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index
    from beeper_matric_etl_tool_spark.streaming.curation import (
        curation_batch_writer,
    )

    idx = str(tmp_path / "idx")
    build_dedup_index(
        spark.createDataFrame(
            [(1, "seed corpus document body")], "doc_id long, text string"
        ),
        idx,
    )
    flat = tmp_path / "flat_out"
    flat.mkdir()
    (flat / "part-00000-deadbeef.snappy.parquet").write_bytes(b"PAR1")
    with _pytest.raises(ValueError, match="flat-append"):
        curation_batch_writer(idx, str(flat))
    with _pytest.raises(ValueError, match="flat-append"):
        curation_batch_writer(
            idx, str(tmp_path / "fresh_out"), audit_dir=str(flat)
        )
    # staged layouts and fresh/missing directories all construct fine
    staged = tmp_path / "staged_out"
    (staged / "ingest_batch=0").mkdir(parents=True)
    (staged / "_SUCCESS").write_text("")
    assert curation_batch_writer(idx, str(staged)) is not None
    assert curation_batch_writer(
        idx, str(tmp_path / "fresh2"), audit_dir=str(tmp_path / "fresh3")
    ) is not None


def test_curation_batch_replay_is_idempotent(spark, tmp_path):
    """Re-running a micro-batch with the same batch_id (Spark's replay
    after a mid-commit crash) leaves corpus, index, and audit
    byte-count-identical: the probe excludes the batch's own index
    partition, so decisions repeat, and all three writes are dynamic
    partition overwrites of that batch's partitions."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index
    from beeper_matric_etl_tool_spark.streaming.curation import (
        curation_batch_writer,
    )

    az = "abcdefghijklmnopqrstuvwxyz"

    def body(d: int) -> str:
        return " ".join(
            f"w{az[d]}{az[i // 26]}{az[i % 26]}fill {'the' if i % 2 else 'of'}"
            for i in range(30)
        )

    seed = spark.createDataFrame(
        [(0, "en", body(0))], "doc_id long, lang string, text string"
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(seed.select("doc_id", "text"), idx)
    out, audit = str(tmp_path / "out"), str(tmp_path / "audit")
    write = curation_batch_writer(idx, out, audit_dir=audit)

    batch = spark.createDataFrame(
        [(1, "en", body(1)), (2, "en", body(0))],
        "doc_id long, lang string, text string",
    )
    write(batch, 0)

    def state():
        corpus = sorted(
            (r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()
        )
        fp = spark.read.parquet(idx + "/fingerprints").count()
        sig = spark.read.parquet(idx + "/signatures").count()
        aud = sorted(
            tuple(r) for r in spark.read.parquet(audit).collect()
        )
        return corpus, fp, sig, aud

    first = state()
    assert [d for d, _ in first[0]] == [1]  # doc 2 duplicated the seed
    # replay the SAME batch twice more — nothing may change
    write(batch, 0)
    write(batch, 0)
    assert state() == first
    # a genuinely new batch still appends (staged under its own id) and
    # cross-batch dedup against batch 0's survivor still works
    batch2 = spark.createDataFrame(
        [(3, "en", body(1)), (4, "en", body(4))],
        "doc_id long, lang string, text string",
    )
    write(batch2, 1)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 4]


def _tev(eid: str, sender: str, ts_min: int, body: str) -> str:
    return json.dumps(
        {
            "event_id": eid,
            "room_id": "!r1",
            "sender": sender,
            "event_type": "m.text",
            "timestamp": T0_MS + ts_min * 60_000,
            "is_encrypted": False,
            "content": body,
            "relates_to": None,
        }
    )


def test_transcript_stream_assembles_across_batches_and_restarts(spark, tmp_path):
    """Continuous transcript assembly (streaming/stateful.py:
    start_transcript_stream): a session spanning two micro-batches
    assembles into ONE transcript; a gap inside the data closes the open
    session and appends exactly its turns in (timestamp, event_id)
    order; the still-open session survives a RESTART via the state
    store and closes correctly afterwards; closed sessions equal the
    batch operator's output on the same (in-order) events minus each
    sender's final open session."""
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        start_transcript_stream,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    # batch 1: A opens a session (0, 5), B opens a session (0)
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "one"), _tev("a2", "@a", 5, "two"),
        _tev("b1", "@b", 0, "solo"),
    ])
    # batch 2: a3 extends A's session ACROSS the batch boundary (10);
    # a4 at 60 is past the 30-min gap → closes A's first session;
    # b2 at 90 closes B's first session
    _write_file(src, "f2.json", [
        _tev("a3", "@a", 10, "three"), _tev("a4", "@a", 60, "four"),
        _tev("b2", "@b", 90, "later"),
    ])

    def drain():
        q = start_transcript_stream(
            spark, str(src), str(tgt), str(ckpt),
            gap_minutes=30, max_turns=2, max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        assert not q.isActive

    drain()
    got = {
        r["sender"]: r
        for r in spark.read.parquet(str(tgt)).collect()
    }
    assert set(got) == {"@a", "@b"}
    a = got["@a"]
    # events 0,5,10 in one session; max_turns=2 truncates the third line
    assert a["session_start_ms"] == T0_MS
    assert a["session_end_ms"] == T0_MS + 10 * 60_000 + 30 * 60_000
    assert a["n_events"] == 3 and a["n_turns"] == 2
    assert a["transcript"] == "@a m.text: one\n@a m.text: two"
    b = got["@b"]
    assert b["n_events"] == 1 and b["transcript"] == "@b m.text: solo"

    # restart: a5 extends A's OPEN session (61 within gap of 60) — state
    # survived the restart; a6 at 200 closes it
    _write_file(src, "f3.json", [
        _tev("a5", "@a", 61, "five"), _tev("a6", "@a", 200, "done"),
    ])
    drain()
    rows = spark.read.parquet(str(tgt)).filter(F.col("sender") == "@a").collect()
    assert len(rows) == 2
    second = next(r for r in rows if r["session_start_ms"] == T0_MS + 60 * 60_000)
    assert second["n_events"] == 2
    assert second["transcript"] == "@a m.text: four\n@a m.text: five"

    # parity with the batch operator: run assemble_transcripts over the
    # SAME events (batch-parsed), matching line rendering — the closed
    # streaming sessions equal the batch sessions minus each sender's
    # final (still-open) one
    from beeper_matric_etl_tool_spark.ext.transcripts import assemble_transcripts
    from beeper_matric_etl_tool_spark.streaming.ingest import parse_events

    parsed = parse_events(spark.read.text(str(src)))
    line = F.concat(
        F.col("sender"), F.lit(" "), F.col("event_type"), F.lit(": "),
        F.coalesce(F.col("content"), F.lit("")),
    )
    batch = assemble_transcripts(
        parsed, line=line, ts_col="ts", user_col="sender",
        order_col="event_id", gap_minutes=30, max_turns=2,
    ).select(
        "sender",
        F.unix_millis("session_start").alias("session_start_ms"),
        F.unix_millis("session_end").alias("session_end_ms"),
        "n_events", "n_turns", "n_tokens", "transcript",
    ).collect()
    last_start = {}
    for r in batch:
        last_start[r["sender"]] = max(
            last_start.get(r["sender"], -1), r["session_start_ms"]
        )
    expected_closed = sorted(
        tuple(r) for r in batch if r["session_start_ms"] < last_start[r["sender"]]
    )
    streamed = sorted(
        tuple(r) for r in spark.read.parquet(str(tgt)).select(
            "sender", "session_start_ms", "session_end_ms",
            "n_events", "n_turns", "n_tokens", "transcript",
        ).collect()
    )
    assert streamed == expected_closed


def test_transcript_updater_idle_flush_path():
    """The flush_idle timeout branch, driven directly (a processing-time
    timeout cannot be made deterministic under availableNow triggers):
    a timed-out key emits its open session exactly as a gap-close would
    and clears its state; a live key under flush_idle re-arms the
    timeout after every update."""
    import pandas as pd

    from beeper_matric_etl_tool_spark.streaming.stateful import (
        _make_transcript_updater,
    )

    class FakeState:
        def __init__(self, value=None, timed_out=False):
            self._v = value
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_ms = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v, self.removed = None, True

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    gap_ms = 30 * 60_000
    upd = _make_transcript_updater(gap_ms, max_turns=2, flush_idle=True)

    # timed-out key: open session (start=0, last=60s, 3 events, 2 turns)
    st = (0, 60_000, 3, ["l1", "l2"])
    state = FakeState(value=st, timed_out=True)
    [out] = list(upd(("@x",), iter([]), state))
    assert state.removed and len(out) == 1
    row = out.iloc[0]
    assert row["session_end_ms"] == 60_000 + gap_ms
    assert row["n_events"] == 3 and row["n_turns"] == 2
    assert row["transcript"] == "l1\nl2"

    # live key: new rows re-arm the timeout with the gap duration
    batch = pd.DataFrame(
        {"timestamp": [1_000], "event_id": ["e1"], "line": ["hello"]}
    )
    state2 = FakeState()
    [out2] = list(upd(("@y",), iter([batch]), state2))
    assert len(out2) == 0 and state2.timeout_ms == gap_ms
    assert state2.get == (1_000, 1_000, 1, ["hello"])


def test_chat_to_curated_corpus_pipeline(spark, tmp_path):
    """The whole continuous training-data story, composed from the
    engine's own streaming stages: raw chat JSON → transcript stream
    (stateful session assembly) → parquet → curation stream (quality
    gate → scrub → exact/near dedup vs the persisted index). A replayed
    conversation — same sender, same turn bodies, later timestamps —
    assembles into a byte-identical transcript and is dropped by the
    INDEX even though the two copies never met in one micro-batch."""
    import json as _json

    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index
    from beeper_matric_etl_tool_spark.streaming.curation import (
        start_curation_stream,
    )
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        start_transcript_stream,
    )

    words = (
        "river meadow stone harbor lantern copper willow ember frost "
        "garden marble cedar falcon amber tunnel violet ginger hollow "
        "saddle barley canyon drift fable grove heron island jasper"
    ).split()

    def body(sender_i: int, turn: int) -> str:
        ws = [words[(sender_i * 31 + turn * 7 + j) % len(words)] for j in range(8)]
        return " ".join(ws[:4] + ["the"] + ws[4:] + ["and"])

    def ev(eid, sender, ts_min, text):
        return _json.dumps({
            "event_id": eid, "room_id": "!r", "sender": sender,
            "event_type": "chat", "timestamp": T0_MS + ts_min * 60_000,
            "is_encrypted": False, "content": text, "relates_to": None,
        })

    src = tmp_path / "chat"
    src.mkdir()
    tdir, tckpt = str(tmp_path / "transcripts"), str(tmp_path / "tckpt")

    def drain_transcripts():
        q = start_transcript_stream(
            spark, str(src), tdir, tckpt, gap_minutes=30, max_turns=16,
        )
        q.awaitTermination(180)
        assert not q.isActive

    def session(sender, si, start_min, closer_min):
        lines = [
            ev(f"{sender}-{start_min}-{t}", sender, start_min + t, body(si, t))
            for t in range(8)
        ]
        lines.append(ev(f"{sender}-close-{closer_min}", sender, closer_min, "bye"))
        return lines

    # two senders, one full session each + a closer event past the gap
    _write_file(src, "c1.json", session("ua", 0, 0, 60) + session("ub", 1, 0, 60))
    drain_transcripts()

    # curation stage: seed index, stream the transcript parquet through
    seed = spark.createDataFrame(
        [(0, " ".join(words) + " the and of unrelated seed corpus text")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(seed, idx, portable=False)
    tschema = (
        "sender string, session_start_ms long, session_end_ms long, "
        "n_events long, n_turns long, n_tokens long, transcript string"
    )
    docs_stream = (
        spark.readStream.schema(tschema).parquet(tdir).select(
            F.xxhash64("sender", "session_start_ms").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.col("transcript").alias("text"),
        )
    )
    out, audit = str(tmp_path / "corpus"), str(tmp_path / "audit")
    cq = start_curation_stream(
        docs_stream, idx, out, str(tmp_path / "cckpt"), audit_dir=audit
    )
    try:
        cq.processAllAvailable()
        kept1 = spark.read.parquet(out).collect()
        assert len(kept1) == 2  # both full sessions pass the gate + dedup
        texts1 = {r["text"] for r in kept1}

        # REPLAY: ua holds the same conversation again, later — the
        # transcript string is byte-identical (timestamps are not in the
        # rendered lines), so the INDEX drops it cross-batch
        _write_file(src, "c2.json", session("ua", 0, 300, 420))
        drain_transcripts()
        cq.processAllAvailable()
        kept2 = spark.read.parquet(out).collect()
        assert len(kept2) == 2
        assert {r["text"] for r in kept2} == texts1
        # the audit saw the replayed transcript arrive and kept nothing
        audits = sorted(
            (r["batch_id"], r["n_in"], r["n_kept"])
            for r in spark.read.parquet(audit).collect()
        )
        assert audits[-1][1] >= 1 and audits[-1][2] == 0
    finally:
        cq.stop()


def _drain_upsert(spark, src, tgt, ckpt, **kw):
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        start_transcript_upsert_stream,
    )

    q = start_transcript_upsert_stream(
        spark, str(src), str(tgt), str(ckpt), available_now=True,
        max_files_per_trigger=1, **kw,
    )
    q.awaitTermination(180)
    assert not q.isActive


def _rows(spark, tgt):
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        TRANSCRIPT_COLUMNS,
    )

    return sorted(
        tuple(r) for r in spark.read.parquet(str(tgt))
        .select(*TRANSCRIPT_COLUMNS).collect()
    )


def _affected(result):
    """repair_transcripts returns the affected keys as a DataFrame (never
    a driver list — the full-drift scale contract); tests collect it."""
    return sorted(r[0] for r in result.collect())


def test_transcript_repair_converges_late_event_drift(spark, tmp_path):
    """The late-event reconciliation story end to end: a redelivered
    event older than a CLOSED session corrupts the streamed assembly
    (it lands in the wrong open session — the documented no-watermark
    semantics); repair_transcripts detects exactly the drifted sender,
    rewrites only its rows, and the target converges byte-identical to
    the batch operator's closed sessions. A clean sender is neither
    flagged nor touched; a second repair is a no-op."""
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        repair_transcripts,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "one"), _tev("a2", "@a", 60, "two"),
        _tev("b1", "@b", 0, "solo"), _tev("b2", "@b", 90, "later"),
    ])
    _drain_upsert(spark, src, tgt, ckpt, gap_minutes=30, max_turns=4)
    # late redelivery: a0 at minute 5 belongs in @a's CLOSED first
    # session but extends the open one instead (arrival order)
    _write_file(src, "f2.json", [_tev("a0", "@a", 5, "late")])
    # closers so the corrupted session and @b's second both emit
    _write_file(src, "f3.json", [
        _tev("a9", "@a", 200, "done"), _tev("b3", "@b", 300, "done"),
    ])
    _drain_upsert(spark, src, tgt, ckpt, gap_minutes=30, max_turns=4)

    streamed = dict(
        ((r[0], r[1]), r[6]) for r in _rows(spark, tgt)
    )
    # the drift is real: the late line sits in the minute-60 session
    assert streamed[("@a", T0_MS + 60 * 60_000)] == (
        "@a m.text: two\n@a m.text: late"
    )

    batch = batch_transcripts(spark, str(src), gap_minutes=30, max_turns=4)
    rows = batch.collect()
    last = {}
    for r in rows:
        last[r["sender"]] = max(last.get(r["sender"], -1), r["session_start_ms"])
    expected_closed = sorted(
        tuple(r) for r in rows if r["session_start_ms"] < last[r["sender"]]
    )
    # detection flags ONLY the drifted sender; the repair converges the
    # target to the batch-exact closed sessions
    assert _affected(repair_transcripts(spark, str(src), str(tgt),
                                        gap_minutes=30, max_turns=4)) == ["@a"]
    assert _rows(spark, tgt) == expected_closed
    fixed = dict(((r[0], r[1]), r[6]) for r in _rows(spark, tgt))
    assert fixed[("@a", T0_MS)] == "@a m.text: one\n@a m.text: late"
    assert fixed[("@a", T0_MS + 60 * 60_000)] == "@a m.text: two"
    # converged: a second repair detects nothing and changes nothing
    assert _affected(repair_transcripts(spark, str(src), str(tgt),
                                        gap_minutes=30, max_turns=4)) == []
    assert _rows(spark, tgt) == expected_closed
    # export mode: include_open converges to the FULL batch derivation
    # (both senders gain their final, still-open session)
    repaired = repair_transcripts(
        spark, str(src), str(tgt), gap_minutes=30, max_turns=4,
        include_open=True,
    )
    assert _affected(repaired) == ["@a", "@b"]
    assert _rows(spark, tgt) == sorted(tuple(r) for r in rows)
    # the no-authority contract: a target row carrying a final-session
    # identity (here: written by the export-mode repair, in production
    # by a flush_idle close) is excluded from the default compare AND
    # preserved through rewrites — a subsequent include_open=False
    # repair detects nothing and deletes nothing
    assert _affected(repair_transcripts(
        spark, str(src), str(tgt), gap_minutes=30, max_turns=4
    )) == []
    assert _rows(spark, tgt) == sorted(tuple(r) for r in rows)


def test_transcript_repair_deletes_spurious_sender(spark, tmp_path):
    """Deletion-only repair: a sender present in the target with NO
    batch counterpart (e.g. rows from a replayed/poisoned source file)
    is detected and its rows removed — including when its hash bucket
    ends up empty (the dynamic-overwrite blind spot the repair handles
    explicitly)."""
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        _session_upsert,
        repair_transcripts,
    )

    src, tgt = tmp_path / "src", tmp_path / "tgt"
    src.mkdir()
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "one"), _tev("a2", "@a", 60, "two"),
    ])
    ghost = spark.createDataFrame(
        [("@ghost", T0_MS, T0_MS + 1800_000, 1, 1, 3, "@ghost m.text: boo")],
        "sender string, session_start_ms long, session_end_ms long, "
        "n_events long, n_turns long, n_tokens long, transcript string",
    )
    _session_upsert(ghost, str(tgt))
    got = _affected(repair_transcripts(spark, str(src), str(tgt)))
    assert "@ghost" in got
    remaining = {r[0] for r in _rows(spark, tgt)}
    assert "@ghost" not in remaining
    # explicit-keys form: key-scoped batch derivation, same delete (the
    # legacy `senders=` alias is pinned here on purpose)
    _session_upsert(ghost, str(tgt))
    assert _affected(repair_transcripts(
        spark, str(src), str(tgt), senders=["@ghost"]
    )) == ["@ghost"]
    assert "@ghost" not in {r[0] for r in _rows(spark, tgt)}


def test_transcript_stream_skips_null_sender_and_null_type_line(spark, tmp_path):
    """Hardening from review: a keyless event (no sender) is dropped by
    the upsert stream AND the batch derivation (a name-keyed repair
    could neither rewrite nor delete a NULL key); a typeless event
    renders a NULL line that fills its turn slot but is skipped in the
    joined transcript — matching the batch operator's array_join
    semantics — instead of crashing the stream."""
    import json as _json

    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        start_transcript_upsert_stream,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    no_sender = _json.dumps({
        "event_id": "x1", "room_id": "!r1", "sender": None,
        "event_type": "m.text", "timestamp": T0_MS, "is_encrypted": False,
        "content": "ghost", "relates_to": None,
    })
    no_type = _json.dumps({
        "event_id": "a2", "room_id": "!r1", "sender": "@a",
        "event_type": None, "timestamp": T0_MS + 60_000, "is_encrypted": False,
        "content": "typeless", "relates_to": None,
    })
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "one"), no_sender, no_type,
    ])
    _write_file(src, "f2.json", [_tev("a9", "@a", 200, "closer")])
    q = start_transcript_upsert_stream(
        spark, str(src), str(tgt), str(ckpt), gap_minutes=30,
        max_turns=4, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert not q.isActive
    rows = _rows(spark, tgt)
    senders = {r[0] for r in rows}
    assert None not in senders  # keyless event never entered a timeline
    [a] = [r for r in rows if r[0] == "@a"]
    # the typeless event fills a turn slot (n_turns counts it) but its
    # NULL line is skipped in the rendered transcript
    assert a[3] == 2 and a[4] == 2  # n_events, n_turns
    assert a[6] == "@a m.text: one"
    # batch twin agrees on both rules
    b = {
        r["sender"]: r
        for r in batch_transcripts(spark, str(src)).collect()
    }
    assert set(b) == {"@a"}


def test_session_upsert_replay_is_idempotent(spark, tmp_path):
    """The upsert stream's exactly-once story: replaying a micro-batch
    (same closed sessions) rewrites the same (sender, session_start_ms)
    rows instead of duplicating them; a genuinely new session appends."""
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        _session_upsert,
    )

    tgt = tmp_path / "tgt"
    schema = (
        "sender string, session_start_ms long, session_end_ms long, "
        "n_events long, n_turns long, n_tokens long, transcript string"
    )
    b1 = spark.createDataFrame(
        [("@x", 1000, 2000, 2, 2, 6, "@x t: a\n@x t: b")], schema
    )
    _session_upsert(b1, str(tgt))
    _session_upsert(b1, str(tgt))  # crash-replay of the same batch
    assert len(_rows(spark, tgt)) == 1
    b2 = spark.createDataFrame(
        [("@x", 9000, 9900, 1, 1, 3, "@x t: c")], schema
    )
    _session_upsert(b2, str(tgt))
    rows = _rows(spark, tgt)
    assert len(rows) == 2 and {r[1] for r in rows} == {1000, 9000}


def test_repair_full_drift_no_driver_key_materialization(spark, tmp_path, monkeypatch):
    """Full drift — empty/lost target, EVERY key drifted: the repair
    converges from nothing to the batch-exact closed sessions without
    ever materializing the affected-key set on the driver. Spy-pinned:
    every DataFrame.collect() issued during the repair returns at most
    DEFAULT_UPSERT_BUCKETS rows (bucket ids — the function's documented
    collect bound); the affected keys come back as a DataFrame."""
    # patch the CONCRETE class — pyspark 4 instances are
    # sql.classic.dataframe.DataFrame, which overrides collect()
    from pyspark.sql.classic.dataframe import DataFrame

    from beeper_matric_etl_tool_spark import sinks
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        repair_transcripts,
    )

    src, tgt = tmp_path / "src", tmp_path / "tgt"
    src.mkdir()
    lines = []
    for i in range(40):  # more keys than buckets — full drift spans all 16
        s = f"@u{i:02d}"
        lines += [_tev(f"{s}-1", s, 0, "one"), _tev(f"{s}-2", s, 200, "closer")]
    _write_file(src, "f1.json", lines)

    collected_sizes = []
    real_collect = DataFrame.collect

    def spy(self):
        rows = real_collect(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    res = repair_transcripts(spark, str(src), str(tgt))
    monkeypatch.undo()
    assert collected_sizes  # the bucket collects did run through the spy
    assert max(collected_sizes) <= sinks.DEFAULT_UPSERT_BUCKETS
    assert res.count() == 40  # every key was (correctly) affected
    rows_b = batch_transcripts(spark, str(src)).collect()
    last = {}
    for r in rows_b:
        last[r["sender"]] = max(last.get(r["sender"], -1), r["session_start_ms"])
    expected = sorted(
        tuple(r) for r in rows_b if r["session_start_ms"] < last[r["sender"]]
    )
    assert _rows(spark, tgt) == expected


def test_room_keyed_repair_converges(spark, tmp_path):
    """key_col='room_id' through the whole reconcile tier: a room-keyed
    upsert stream (the multi-speaker room document — the reference's
    natural unit) drifts on a late redelivery; repair_transcripts
    flags exactly the drifted room and converges its rows to the
    batch-exact interleaved transcript. Speaker tags are per EVENT (the
    line renders from the sender before the room key aliases into the
    output's 'sender' slot)."""
    import json as _json

    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        repair_transcripts,
    )

    def rev(eid, room, sender, ts_min, body):
        return _json.dumps({
            "event_id": eid, "room_id": room, "sender": sender,
            "event_type": "m.text", "timestamp": T0_MS + ts_min * 60_000,
            "is_encrypted": False, "content": body, "relates_to": None,
        })

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        rev("a1", "!r1", "@a", 0, "hi"), rev("b1", "!r1", "@b", 1, "yo"),
        rev("a2", "!r1", "@a", 60, "again"),
        rev("c1", "!r2", "@c", 0, "solo"), rev("c2", "!r2", "@c", 90, "later"),
    ])
    # late redelivery: b0 at minute 3 belongs in !r1's CLOSED first
    # session but extends the open one instead (arrival order)
    _write_file(src, "f2.json", [rev("b0", "!r1", "@b", 3, "late")])
    _write_file(src, "f3.json", [
        rev("a9", "!r1", "@a", 200, "done"), rev("c9", "!r2", "@c", 300, "done"),
    ])
    _drain_upsert(spark, src, tgt, ckpt, gap_minutes=30, max_turns=8,
                  key_col="room_id")

    rows_b = batch_transcripts(
        spark, str(src), gap_minutes=30, max_turns=8, key_col="room_id"
    ).collect()
    last = {}
    for r in rows_b:
        last[r["sender"]] = max(last.get(r["sender"], -1), r["session_start_ms"])
    expected = sorted(
        tuple(r) for r in rows_b if r["session_start_ms"] < last[r["sender"]]
    )
    # only the drifted room is flagged; the clean room is untouched
    assert _affected(repair_transcripts(
        spark, str(src), str(tgt), gap_minutes=30, max_turns=8,
        key_col="room_id",
    )) == ["!r1"]
    assert _rows(spark, tgt) == expected
    fixed = {(r[0], r[1]): r[6] for r in _rows(spark, tgt)}
    # the repaired first session interleaves BOTH speakers in true
    # (ts, event_id) order, late line included
    assert fixed[("!r1", T0_MS)] == (
        "@a m.text: hi\n@b m.text: yo\n@b m.text: late"
    )
    # converged: nothing further detected
    assert _affected(repair_transcripts(
        spark, str(src), str(tgt), gap_minutes=30, max_turns=8,
        key_col="room_id",
    )) == []


def test_all_typeless_session_token_parity(spark, tmp_path):
    """ADVICE r9 n_tokens edge: a session whose EVERY event is typeless
    (NULL event_type → NULL turn line) renders an empty transcript; the
    streaming plane must report n_tokens = 1 — the batch definition
    size(split('', ' ')) — not 0, or repair_transcripts would flag the
    sender as drifted forever."""
    import json as _json

    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        repair_transcripts,
    )

    def tev_typeless(eid, sender, ts_min):
        return _json.dumps({
            "event_id": eid, "room_id": "!r1", "sender": sender,
            "event_type": None, "timestamp": T0_MS + ts_min * 60_000,
            "is_encrypted": False, "content": "ignored", "relates_to": None,
        })

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        tev_typeless("t1", "@t", 0), tev_typeless("t2", "@t", 1),
        _tev("t9", "@t", 200, "closer"),
    ])
    _drain_upsert(spark, src, tgt, ckpt, gap_minutes=30, max_turns=4)
    [row] = _rows(spark, tgt)
    assert row[0] == "@t" and row[6] == ""  # empty transcript
    assert row[5] == 1  # n_tokens — the batch plane's size(split('',' '))
    [brow] = [
        r for r in batch_transcripts(spark, str(src)).collect()
        if r["session_start_ms"] == T0_MS
    ]
    assert brow["n_tokens"] == 1 and brow["transcript"] == ""
    # and therefore: no drift detected
    assert _affected(repair_transcripts(spark, str(src), str(tgt))) == []


def test_repair_refuses_active_upsert_stream(spark, tmp_path):
    """Quiesce contract (ADVICE r9): while a live upsert stream is
    writing the target, repair_transcripts refuses — its rmtree +
    dynamic overwrite has no commit protocol against a racing
    micro-batch. After the stream stops, the same repair proceeds."""
    import time

    import pytest

    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        repair_transcripts,
        start_transcript_upsert_stream,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "one"), _tev("a2", "@a", 200, "closer"),
    ])
    q = start_transcript_upsert_stream(
        spark, str(src), str(tgt), str(ckpt), available_now=False,
    )
    try:
        with pytest.raises(RuntimeError, match="actively writing"):
            repair_transcripts(spark, str(src), str(tgt))
    finally:
        q.stop()
    for _ in range(100):
        if not q.isActive:
            break
        time.sleep(0.1)
    assert not q.isActive
    # quiesced: the guard clears and the repair runs normally
    repair_transcripts(spark, str(src), str(tgt))


def test_key_checksums_distinguish_null_from_empty(spark):
    """ADVICE r9: concat_ws SKIPS null arguments, so without per-field
    null flags a NULL transcript and an empty-string transcript would
    checksum identically and a NULL-vs-'' drift would evade detection."""
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        _key_checksums,
    )

    schema = (
        "sender string, session_start_ms long, session_end_ms long, "
        "n_events long, n_turns long, n_tokens long, transcript string"
    )
    empty = spark.createDataFrame([("@x", 1, 2, 1, 1, 1, "")], schema)
    nul = spark.createDataFrame([("@x", 1, 2, 1, 1, 1, None)], schema)
    ck_empty = _key_checksums(empty).first()["__ck"]
    ck_null = _key_checksums(nul).first()["__ck"]
    assert ck_empty != ck_null


def test_repair_leaves_untouched_buckets_byte_identical(spark, tmp_path):
    """The repair's touched-buckets-only I/O claim, pinned physically
    (the partitioned-sinks test pattern): after repairing ONE drifted
    sender, every parquet file in every bucket other than that sender's
    is byte-identical — untouched buckets were neither rewritten nor
    reshuffled."""
    import hashlib
    import os as _os

    from beeper_matric_etl_tool_spark import sinks
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        _session_upsert,
        repair_transcripts,
    )

    def digests(root):
        out = {}
        for dirpath, dirs, files in _os.walk(root):
            dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
            for f in files:
                if f.endswith(".parquet"):
                    p = _os.path.join(dirpath, f)
                    with open(p, "rb") as fh:
                        out[_os.path.relpath(p, root)] = hashlib.md5(
                            fh.read()
                        ).hexdigest()
        return out

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    lines = []
    for i in range(40):
        s = f"@u{i:02d}"
        lines += [_tev(f"{s}-1", s, 0, "one"), _tev(f"{s}-2", s, 200, "closer")]
    _write_file(src, "f1.json", lines)
    _drain_upsert(spark, src, tgt, ckpt)
    # drift exactly one sender: a spurious non-final session
    ghost = spark.createDataFrame(
        [("@u00", T0_MS + 50 * 60_000, T0_MS + 80 * 60_000, 1, 1, 3,
          "@u00 m.text: spurious")],
        "sender string, session_start_ms long, session_end_ms long, "
        "n_events long, n_turns long, n_tokens long, transcript string",
    )
    _session_upsert(ghost, str(tgt))
    before = digests(str(tgt))
    assert _affected(repair_transcripts(spark, str(src), str(tgt))) == ["@u00"]
    after = digests(str(tgt))
    bucket_val = (
        spark.createDataFrame([("@u00",)], "sender string")
        .select(sinks.key_bucket(["sender"], sinks.DEFAULT_UPSERT_BUCKETS))
        .first()[0]
    )
    touched_dir = f"{sinks.BUCKET_COL}={bucket_val}"
    untouched_before = {
        p: h for p, h in before.items() if not p.startswith(touched_dir)
    }
    untouched_after = {
        p: h for p, h in after.items() if not p.startswith(touched_dir)
    }
    assert untouched_before and untouched_before == untouched_after
    # and the touched bucket did change (the ghost row is gone)
    assert {p: h for p, h in before.items() if p.startswith(touched_dir)} != {
        p: h for p, h in after.items() if p.startswith(touched_dir)
    }
    assert "spurious" not in {r[6] for r in _rows(spark, tgt)}


def test_watermarked_transcript_stream_reorders_within_lateness(spark, tmp_path):
    """The watermark re-sort: an event delivered AFTER its successor
    (cross-batch, within the lateness horizon) still folds into the
    transcript in true (ts, event_id) order — including winning a
    max_turns slot from the later-timestamped turn that arrived first,
    exactly what the arrival-order assembler cannot do. An event beyond
    the horizon drops deterministically. Sessions close only once the
    watermark passes their gap."""
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        start_transcript_stream_watermarked,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()

    def drain():
        q = start_transcript_stream_watermarked(
            spark, str(src), str(tgt), str(ckpt), gap_minutes=30,
            max_turns=2, lateness="5 minutes", max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        assert not q.isActive

    # batch1: alpha(0) and gamma(10) arrive; the clock key drags the
    # watermark forward in later batches
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "alpha"), _tev("a3", "@a", 10, "gamma"),
        _tev("c1", "@clk", 12, "x"),
    ])
    # batch2: beta(8) arrives LATE (after gamma) but within the horizon
    # (wm = 12-5 = 7 <= 8)
    _write_file(src, "f2.json", [_tev("a2", "@a", 8, "beta")])
    # batch3: clock jumps to 50 → wm 45 passes 10+30 → @a's session closes
    _write_file(src, "f3.json", [_tev("c2", "@clk", 50, "x")])
    # batch4: ghost(1) is beyond the horizon (wm 45) → dropped
    _write_file(src, "f4.json", [
        _tev("a9", "@a", 1, "ghost"), _tev("c3", "@clk", 200, "x"),
    ])
    drain()
    rows = [
        r for r in spark.read.parquet(str(tgt)).collect()
        if r["sender"] == "@a"
    ]
    assert len(rows) == 1
    r = rows[0]
    assert r["session_start_ms"] == T0_MS
    assert r["session_end_ms"] == T0_MS + (10 + 30) * 60_000
    assert r["n_events"] == 3  # alpha, beta, gamma — ghost dropped
    # the late beta WON the second max_turns slot from gamma: true
    # event-time order, not arrival order
    assert r["n_turns"] == 2
    assert r["transcript"] == "@a m.text: alpha\n@a m.text: beta"


def test_wm_transcript_updater_boundaries():
    """The three watermark boundary rules, driven directly: ts == wm
    stays UNSTABLE (a same-ts, smaller-id sibling may still arrive);
    last + gap == wm keeps the session OPEN (a future ts == wm event
    would still merge under the strict-> gap rule); incoming ts < wm
    drops without touching state."""
    import pandas as pd

    from beeper_matric_etl_tool_spark.streaming.stateful import (
        _make_wm_transcript_updater,
    )

    class FakeState:
        def __init__(self, value=None, wm=0):
            self._v = value
            self._wm = wm
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v, self.removed = None, True

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ts):
            self.timeout_ts = ts

    upd = _make_wm_transcript_updater(gap_ms=100, max_turns=5)

    def batch(*rows):
        return pd.DataFrame(
            {"timestamp": [r[0] for r in rows],
             "event_id": [r[1] for r in rows],
             "line": [r[2] for r in rows]}
        )

    # ts == wm: unstable — buffered, nothing folds; wakeup armed at the
    # pending event becoming stable
    st = FakeState(wm=1000)
    [out] = list(upd(("@x",), iter([batch((1000, "e1", "l1"))]), st))
    assert len(out) == 0
    assert st.get[0] is None and list(st.get[4]) == [1000]
    assert st.timeout_ts == 1001
    # wm advances past it → folds into an open session (not yet closed:
    # 1000 + 100 == 1100 is NOT < 1100); wakeup re-armed at close time
    st._wm = 1100
    [out] = list(upd(("@x",), iter([]), st))
    assert len(out) == 0 and st.get[0] == 1000 and st.get[2] == 1
    assert st.timeout_ts == 1101  # close time (1000+100) + 1
    # one tick further → closes, state clears
    st._wm = 1101
    [out] = list(upd(("@x",), iter([]), st))
    assert len(out) == 1 and out.iloc[0]["session_end_ms"] == 1100
    assert st.removed
    # beyond-horizon row drops without creating state
    st2 = FakeState(wm=1000)
    [out2] = list(upd(("@y",), iter([batch((999, "e9", "late"))]), st2))
    assert len(out2) == 0 and not st2.exists


def test_transcript_stream_room_keyed_multi_speaker(spark, tmp_path):
    """key_col='room_id': the streaming assembler sessionizes the ROOM
    timeline (the multi-speaker chat-LM document — the batch twin is
    events_sessions kind='transcript_room') while turn lines keep their
    per-event speaker tags; the output's 'sender' slot carries the room
    key."""
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        start_transcript_stream,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "hi bob"), _tev("b1", "@b", 1, "hi alice"),
    ])
    _write_file(src, "f2.json", [_tev("a2", "@a", 60, "new session")])
    q = start_transcript_stream(
        spark, str(src), str(tgt), str(ckpt), gap_minutes=30,
        max_turns=4, max_files_per_trigger=1, key_col="room_id",
    )
    q.awaitTermination(180)
    assert not q.isActive
    rows = spark.read.parquet(str(tgt)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sender"] == "!r1"  # the room key rides the key slot
    assert r["n_events"] == 2
    assert r["transcript"] == "@a m.text: hi bob\n@b m.text: hi alice"


def test_watermarked_finalize_equals_batch(spark, tmp_path):
    """The watermarked assembler's export fixed point, pinned: streamed
    closed rows + the batch-derived tail (finalize_transcripts) are
    byte-identical to the full batch derivation — with a non-trivial
    split (the stream really closed some sessions; the tail really
    carries the still-open remainder), out-of-order input included."""
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        finalize_transcripts,
    )
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        start_transcript_stream_watermarked,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "alpha"), _tev("a3", "@a", 10, "gamma"),
        _tev("c1", "@clk", 12, "x"),
    ])
    # beta arrives late but within the 5-minute horizon (wm = 12-5 = 7)
    _write_file(src, "f2.json", [
        _tev("a2", "@a", 8, "beta"), _tev("b1", "@b", 14, "solo"),
    ])
    # clock to 50 → wm 45 closes @a (10+30) and @b (14+30)
    _write_file(src, "f3.json", [_tev("c2", "@clk", 50, "x")])
    # second @a session + clock to 200 → wm 195 closes it (100+30)
    _write_file(src, "f4.json", [
        _tev("a9", "@a", 100, "second"), _tev("c3", "@clk", 200, "x"),
    ])
    # one more clock tick so the wm-195 timeouts actually fire
    _write_file(src, "f5.json", [_tev("c4", "@clk", 201, "x")])
    q = start_transcript_stream_watermarked(
        spark, str(src), str(tgt), str(ckpt), gap_minutes=30,
        lateness="5 minutes", max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert not q.isActive

    streamed = set(_rows(spark, tgt))
    batch = sorted(
        tuple(r)
        for r in batch_transcripts(spark, str(src), gap_minutes=30).collect()
    )
    # non-vacuous: the stream closed sessions AND left an open tail
    assert streamed and streamed < set(batch)
    # the export fixed point: finalize ≡ full batch, byte-identical
    fin = sorted(
        tuple(r)
        for r in finalize_transcripts(
            spark, str(src), str(tgt), gap_minutes=30
        ).select("sender", "session_start_ms", "session_end_ms",
                 "n_events", "n_turns", "n_tokens", "transcript").collect()
    )
    assert fin == batch


def test_watermarked_upsert_store_needs_no_repair(spark, tmp_path):
    """assembler='watermarked' on the REPAIRABLE layout: out-of-order
    (in-horizon) input lands batch-exact in the upsert target, so the
    default repair detects NOTHING — exact-up-front ordering composed
    with the in-place-rewritable store. include_open=True then converges
    the store to the full batch export in place (the upsert-layout twin
    of finalize_transcripts). flush_idle and unknown assemblers are
    refused loudly."""
    import pytest

    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        repair_transcripts,
        start_transcript_upsert_stream,
    )

    src, tgt, ckpt = tmp_path / "src", tmp_path / "tgt", tmp_path / "ckpt"
    src.mkdir()
    _write_file(src, "f1.json", [
        _tev("a1", "@a", 0, "alpha"), _tev("a3", "@a", 10, "gamma"),
        _tev("c1", "@clk", 12, "x"),
    ])
    # beta arrives late but within the 5-minute horizon
    _write_file(src, "f2.json", [
        _tev("a2", "@a", 8, "beta"), _tev("b1", "@b", 14, "solo"),
    ])
    _write_file(src, "f3.json", [_tev("c2", "@clk", 50, "x")])
    _write_file(src, "f4.json", [
        _tev("a9", "@a", 100, "second"), _tev("c3", "@clk", 200, "x"),
    ])
    _write_file(src, "f5.json", [_tev("c4", "@clk", 201, "x")])

    with pytest.raises(ValueError, match="flush_idle"):
        start_transcript_upsert_stream(
            spark, str(src), str(tgt), str(ckpt),
            assembler="watermarked", flush_idle=True,
        )
    with pytest.raises(ValueError, match="assembler"):
        start_transcript_upsert_stream(
            spark, str(src), str(tgt), str(ckpt), assembler="sorted",
        )

    q = start_transcript_upsert_stream(
        spark, str(src), str(tgt), str(ckpt), gap_minutes=30,
        assembler="watermarked", lateness="5 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert not q.isActive

    rows_b = batch_transcripts(spark, str(src), gap_minutes=30).collect()
    batch_all = sorted(tuple(r) for r in rows_b)
    streamed = set(_rows(spark, tgt))
    # the store holds EXACT batch rows (the late beta folded in order)
    assert streamed and streamed < set(batch_all)
    # select the alpha/beta/gamma session EXPLICITLY — both closed @a
    # sessions are in the store, and set iteration order is arbitrary
    a_first = next(r for r in streamed if r[0] == "@a" and "alpha" in r[6])
    assert "beta" in a_first[6] and a_first[6].index("beta") < a_first[6].index("gamma")
    # no drift: the watermarked assembler needed no repair
    assert _affected(repair_transcripts(spark, str(src), str(tgt),
                                        gap_minutes=30)) == []
    assert set(_rows(spark, tgt)) == streamed  # and it changed nothing
    # in-place export: converge the store to the FULL batch derivation
    repair_transcripts(spark, str(src), str(tgt), gap_minutes=30,
                       include_open=True)
    assert _rows(spark, tgt) == batch_all


def test_chat_to_curated_corpus_pipeline_watermarked(spark, tmp_path):
    """The continuous training-data story on the WATERMARKED path — the
    configuration a production deployment with out-of-order delivery
    would pick: raw chat JSON (one turn delivered late, cross-batch) →
    watermark-re-sorted transcript stream → parquet → curation stream
    (quality gate → scrub → dedup vs the persisted index). The closed
    transcripts are byte-identical to the batch derivation despite the
    out-of-order arrival; a replayed conversation assembles into a
    byte-identical transcript and is dropped by the INDEX cross-run."""
    import json as _json

    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index
    from beeper_matric_etl_tool_spark.streaming.curation import (
        start_curation_stream,
    )
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
    )
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        start_transcript_stream_watermarked,
    )

    words = (
        "river meadow stone harbor lantern copper willow ember frost "
        "garden marble cedar falcon amber tunnel violet ginger hollow "
        "saddle barley canyon drift fable grove heron island jasper"
    ).split()

    def body(sender_i: int, turn: int) -> str:
        ws = [words[(sender_i * 31 + turn * 7 + j) % len(words)] for j in range(8)]
        return " ".join(ws[:4] + ["the"] + ws[4:] + ["and"])

    def ev(eid, sender, ts_min, text):
        return _json.dumps({
            "event_id": eid, "room_id": "!r", "sender": sender,
            "event_type": "chat", "timestamp": T0_MS + ts_min * 60_000,
            "is_encrypted": False, "content": text, "relates_to": None,
        })

    src = tmp_path / "chat"
    src.mkdir()
    tdir, tckpt = str(tmp_path / "transcripts"), str(tmp_path / "tckpt")

    def drain():
        q = start_transcript_stream_watermarked(
            spark, str(src), tdir, tckpt, gap_minutes=30, max_turns=16,
            lateness="10 minutes", max_files_per_trigger=1,
        )
        q.awaitTermination(180)
        assert not q.isActive

    def turns(sender, si, start_min, skip=()):
        return [
            ev(f"{sender}-{start_min}-{t}", sender, start_min + t, body(si, t))
            for t in range(8) if t not in skip
        ]

    # run 1: ua's turn 3 is HELD BACK and delivered in a later file —
    # cross-batch out-of-order, within the 10-minute horizon
    _write_file(src, "c1.json", turns("ua", 0, 0, skip=(3,)) + turns("ub", 1, 0))
    _write_file(src, "c2.json", [ev("ua-0-3", "ua", 3, body(0, 3))])
    _write_file(src, "c3.json", [ev("clk-1", "@clk", 200, "x")])
    _write_file(src, "c4.json", [ev("clk-2", "@clk", 201, "x")])
    drain()

    # closed transcripts are byte-identical to the batch derivation —
    # the late turn folded into its true (ts, event_id) slot
    streamed = set(
        tuple(r) for r in spark.read.parquet(tdir)
        .select("sender", "session_start_ms", "session_end_ms",
                "n_events", "n_turns", "n_tokens", "transcript").collect()
    )
    batch = set(
        tuple(r) for r in batch_transcripts(spark, str(src)).collect()
    )
    assert {r[0] for r in streamed} == {"ua", "ub"}
    assert streamed < batch  # every closed row exactly matches batch
    ua_row = next(r for r in streamed if r[0] == "ua")
    assert ua_row[3] == 8  # all 8 turns, late one included

    # curation stage: seed index, stream the transcript parquet through
    seed = spark.createDataFrame(
        [(0, " ".join(words) + " the and of unrelated seed corpus text")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_dedup_index(seed, idx, portable=False)
    tschema = (
        "sender string, session_start_ms long, session_end_ms long, "
        "n_events long, n_turns long, n_tokens long, transcript string"
    )
    docs_stream = (
        spark.readStream.schema(tschema).parquet(tdir).select(
            F.xxhash64("sender", "session_start_ms").alias("doc_id"),
            F.lit("en").alias("lang"),
            F.col("transcript").alias("text"),
        )
    )
    out, audit = str(tmp_path / "corpus"), str(tmp_path / "audit")
    cq = start_curation_stream(
        docs_stream, idx, out, str(tmp_path / "cckpt"), audit_dir=audit
    )
    try:
        cq.processAllAvailable()
        kept1 = spark.read.parquet(out).collect()
        assert len(kept1) == 2  # both full sessions pass the gate + dedup
        texts1 = {r["text"] for r in kept1}

        # REPLAY: ua holds the same conversation again, later — the
        # transcript string is byte-identical (timestamps are not in the
        # rendered lines), so the INDEX drops it cross-run
        _write_file(src, "c5.json", turns("ua", 0, 300))
        _write_file(src, "c6.json", [ev("clk-3", "@clk", 600, "x")])
        _write_file(src, "c7.json", [ev("clk-4", "@clk", 601, "x")])
        drain()
        cq.processAllAvailable()
        kept2 = spark.read.parquet(out).collect()
        assert len(kept2) == 2
        assert {r["text"] for r in kept2} == texts1
        # the audit saw the replayed transcript arrive and kept nothing
        audits = sorted(
            (r["batch_id"], r["n_in"], r["n_kept"])
            for r in spark.read.parquet(audit).collect()
        )
        assert audits[-1][1] >= 1 and audits[-1][2] == 0
    finally:
        cq.stop()


def test_transcript_guard_rails(spark, tmp_path):
    """Contract guards fail loudly at construction time: max_turns < 1
    (both stateful updaters — the batch operator already raises) and
    passing BOTH keys= and its legacy alias senders= to the reconcile
    entry points (silently preferring one would repair the wrong set)."""
    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        batch_transcripts,
        repair_transcripts,
    )
    from beeper_matric_etl_tool_spark.streaming.stateful import (
        _make_transcript_updater,
        _make_wm_transcript_updater,
    )

    with pytest.raises(ValueError, match="max_turns"):
        _make_transcript_updater(60_000, max_turns=0, flush_idle=True)
    with pytest.raises(ValueError, match="max_turns"):
        _make_wm_transcript_updater(60_000, max_turns=0)
    with pytest.raises(ValueError, match="not both"):
        batch_transcripts(
            spark, str(tmp_path), keys=["@a"], senders=["@b"]
        )
    with pytest.raises(ValueError, match="not both"):
        repair_transcripts(
            spark,
            str(tmp_path),
            str(tmp_path / "tgt"),
            keys=["@a"],
            senders=["@b"],
        )
