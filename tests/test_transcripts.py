"""Conversation-transcript assembly (ext/transcripts.py) — session
semantics, turn ordering, truncation, determinism."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.transcripts import (
    assemble_transcripts,
    turn_line,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(uid, minutes, eid, etype="m.text", props="hi"):
    return (eid, T0 + dt.timedelta(minutes=minutes), uid, etype, props)


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, props string"


def test_transcript_sessions_order_and_truncation(spark):
    """One user, two sessions split by a >30-min gap; the transcript is
    the first max_turns lines in (ts, event_id) order; n_events counts
    the whole session while n_turns is capped."""
    rows = [
        _ev(1, 0, 10, props="a"),
        _ev(1, 5, 11, props="b"),
        _ev(1, 10, 12, props="c"),
        # 40-minute gap → new session
        _ev(1, 50, 13, props="d"),
        _ev(1, 55, 14, props="e"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        str(r["session_start"]): r
        for r in assemble_transcripts(df, max_turns=2).collect()
    }
    assert len(out) == 2
    s1 = out[str(T0)]
    assert s1["n_events"] == 3 and s1["n_turns"] == 2
    assert s1["transcript"] == "u1 m.text: a\nu1 m.text: b"
    assert s1["n_tokens"] == 5  # 'u1 m.text: a\nu1' splits on spaces only
    s2 = out[str(T0 + dt.timedelta(minutes=50))]
    assert s2["n_events"] == 2 and s2["n_turns"] == 2
    assert s2["transcript"] == "u1 m.text: d\nu1 m.text: e"
    # session_end = last event + gap
    assert str(s2["session_end"]) == str(T0 + dt.timedelta(minutes=85))


def test_transcript_gap_boundary_is_strict(spark):
    """An event at EXACTLY prev + gap still merges (the sessionized /
    F.session_window strict-> semantics), one microsecond past splits."""
    rows = [
        _ev(7, 0, 1),
        _ev(7, 30, 2),  # exactly 30 min later → same session
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert assemble_transcripts(df).count() == 1
    rows2 = [
        (1, T0, 8, "t", "x"),
        (2, T0 + dt.timedelta(minutes=30, microseconds=1), 8, "t", "y"),
    ]
    df2 = spark.createDataFrame(rows2, SCHEMA)
    assert assemble_transcripts(df2).count() == 2


def test_transcript_tie_breaks_on_order_col(spark):
    """Two events with the SAME timestamp order by event_id — the
    transcript string is deterministic under any partition layout."""
    rows = [
        _ev(3, 0, 22, props="second"),
        _ev(3, 0, 21, props="first"),
        _ev(3, 1, 23, props="third"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    expected = "u3 m.text: first\nu3 m.text: second\nu3 m.text: third"
    for layout in (df.coalesce(1), df.repartition(5)):
        got = assemble_transcripts(layout).collect()
        assert len(got) == 1 and got[0]["transcript"] == expected


def test_transcript_null_body_and_custom_line(spark):
    """NULL props renders as an empty body; a caller-supplied line
    column overrides the default rendering."""
    rows = [(1, T0, 4, "m.join", None)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = assemble_transcripts(df).collect()[0]
    assert got["transcript"] == "u4 m.join: "
    custom = assemble_transcripts(
        df, line=F.upper(F.col("event_type"))
    ).collect()[0]
    assert custom["transcript"] == "M.JOIN"
    # turn_line accepts explicit columns too
    tl = df.select(turn_line("user_id", "event_type", "event_type").alias("l"))
    assert tl.collect()[0]["l"] == "u4 m.join: m.join"


def test_transcript_counts_match_sessionized(spark, sf_dir):
    """On real events data the (user, session) windows agree with
    operators/windows.py:sessionized — same session count, same
    n_events multiset — while every transcript has n_turns =
    min(n_events, max_turns) and a token count consistent with its
    own string."""
    from beeper_matric_etl_tool_spark.operators import windows as xwin
    from beeper_matric_etl_tool_spark.sources.tables import table

    events = table(spark, sf_dir, "events")
    tr = assemble_transcripts(events, max_turns=3).collect()
    ses = xwin.sessionized(
        events, "ts", "30 minutes", ["user_id"],
        F.count(F.lit(1)).alias("n_events"),
    ).collect()
    assert len(tr) == len(ses)
    assert sorted((r["user_id"], r["n_events"]) for r in tr) == sorted(
        (r["user_id"], r["n_events"]) for r in ses
    )
    for r in tr:
        assert r["n_turns"] == min(r["n_events"], 3)
        assert r["n_tokens"] == len(r["transcript"].split(" "))


def test_transcript_max_turns_validated(spark):
    with pytest.raises(ValueError, match="max_turns"):
        assemble_transcripts(
            spark.createDataFrame([], SCHEMA), max_turns=0
        )


def test_transcripts_feed_curate_end_to_end(spark, sf_dir):
    """The bridge works both directions: assembled transcripts ARE
    documents — rename columns and the full curation funnel runs over
    them unchanged (quality gate → scrub → exact dedup → near dedup →
    mix → pack), with per-user-session doc ids unique by construction."""
    from pyspark.sql import Window

    from beeper_matric_etl_tool_spark.ext.pipeline import curate
    from beeper_matric_etl_tool_spark.sources.tables import table

    events = table(spark, sf_dir, "events")
    tr = assemble_transcripts(events, max_turns=8)
    w = Window.orderBy("user_id", "session_start")
    docs = tr.select(
        F.row_number().over(w).cast("long").alias("doc_id"),
        F.col("transcript").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = curate(docs, persist_intermediates=False)
    n_in = docs.count()
    stages = {
        k: out[k].count()
        for k in ("scrubbed", "exact", "near", "sampled", "packed")
    }
    # the funnel ran and is monotone non-increasing through dedup
    assert stages["scrubbed"] <= n_in
    assert stages["exact"] <= stages["scrubbed"]
    assert stages["near"] <= stages["exact"]
    assert stages["packed"] == stages["sampled"]
    # pack ids exist and are dense from 0 when anything survived
    if stages["packed"]:
        packs = out["packed"].agg(F.min("pack_id"), F.max("pack_id")).first()
        assert packs[0] == 0


def test_room_keyed_multi_speaker_transcripts(spark):
    """Conversation assembly generalizes to ROOM-keyed sessions — the
    multi-speaker chat-LM shape: sessionize per room, keep per-event
    speaker tags in the rendered lines (line= overrides the default
    key-based tag), interleaving turns from different senders in exact
    (ts, event_id) order."""
    rows = [
        # room 7: alice and bob interleave inside one session
        (1, T0, 7, 100, "m.text", "hi bob"),
        (2, T0 + dt.timedelta(minutes=1), 7, 200, "m.text", "hi alice"),
        (3, T0 + dt.timedelta(minutes=2), 7, 100, "m.text", "how are you"),
        # a 40-min gap opens a second session in the same room
        (4, T0 + dt.timedelta(minutes=42), 7, 200, "m.text", "back now"),
        # room 8: a different conversation entirely
        (5, T0, 8, 300, "m.text", "other room"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, room_id long, speaker_id long, "
        "event_type string, props string",
    )
    out = assemble_transcripts(
        df,
        line=turn_line(user_col="speaker_id"),
        user_col="room_id",
    )
    got = {
        (r["room_id"], str(r["session_start"])): r["transcript"]
        for r in out.collect()
    }
    assert len(got) == 3
    assert got[(7, str(T0))] == (
        "u100 m.text: hi bob\nu200 m.text: hi alice\nu100 m.text: how are you"
    )
    assert got[(7, str(T0 + dt.timedelta(minutes=42)))] == "u200 m.text: back now"
    assert got[(8, str(T0))] == "u300 m.text: other room"


def test_events_sessions_room_leg_is_multi_speaker(spark, sf_dir):
    """The driver-oracled kind='transcript_room' leg genuinely exercises
    the multi-speaker form: rooms fan in ~1/4 of users each, so room
    transcripts interleave DISTINCT speaker tags (the chat-LM document
    shape), and keys cover the derived room-id domain."""
    import re

    from beeper_matric_etl_tool_spark.plans.catalog_ext import events_sessions

    out = events_sessions(spark, sf_dir).filter(
        F.col("kind") == "transcript_room"
    )
    rows = out.collect()
    assert rows
    assert {r["user_id"] for r in rows} <= set(range(4))
    multi = 0
    for r in rows:
        speakers = set(re.findall(r"^u(\d+) ", r["transcript"], re.M))
        assert r["n_turns"] == len(r["transcript"].split("\n"))
        if len(speakers) > 1:
            multi += 1
    assert multi > 0  # interleaving actually happens in the testdata


def test_transcript_null_ts_rows_drop(spark):
    """NULL event times cannot sessionize — excluded, matching both the
    session_window leg and the streaming assembler's filter."""
    rows = [(1, T0, 9, "t", "a"), (2, None, 9, "t", "ghost")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = assemble_transcripts(df).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 1 and got[0]["transcript"] == "u9 t: a"
