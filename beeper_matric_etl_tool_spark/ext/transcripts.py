"""Conversation-transcript assembly — chat timelines → chat-LM training
documents (SURVEY §2.12 text tier).

Why it exists: the reference's domain is a chat timeline store (rooms,
ordered events — reference `src/` timeline/message handling); the most
direct LLM-training use of that data is ASSEMBLING it into turn-formatted
conversation documents — the step between "events in a warehouse" and
"documents a curation funnel can score, dedup, pack and export". This
module is that bridge, Spark-first: sessionize the per-user event stream
by inactivity gap (the same strict-`>` semantics as
`operators/windows.py:sessionized` and the `events_sessions` oracle),
render each event as a speaker-tagged turn line, and concatenate the
first ``max_turns`` turns per session into one deterministic transcript
string the rest of the engine treats as a document.

Determinism contract: turn order is (ts, event_id) — a total order, so
the transcript string is bit-identical across partition layouts and
engines; every derived count (n_events, n_turns, n_tokens) is an exact
long.

Scale shape: the session id comes from two windows partitioned by USER
(lag → gap flag → running sum) — parallel across users, single-task per
user, the natural unit of a chat timeline (the reference pages one
user's timeline the same way); turns beyond ``max_turns`` are dropped
BEFORE collection, so the per-session array is bounded at max_turns
structs regardless of session length; the final (user, session) groupBy
rides the SAME user hash partitioning the windows installed (same-user
rows are already co-located), so the whole operator is ONE exchange —
measured: 1 Exchange, 3 Window, partial aggregation live.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.text import token_count

#: microseconds per minute — the exact integer the gap compare runs in
_US_PER_MIN = 60_000_000


def turn_line(
    user_col: Column | str = "user_id",
    type_col: Column | str = "event_type",
    body_col: Column | str = "props",
) -> Column:
    """One event rendered as a speaker-tagged turn:
    ``u<user_id> <event_type>: <body>`` — pure string concat, NULL body
    renders empty (the SQL twin is ``'u' || user_id || ' ' ||
    event_type || ': ' || coalesce(body, '')``)."""
    u = F.col(user_col) if isinstance(user_col, str) else user_col
    t = F.col(type_col) if isinstance(type_col, str) else type_col
    b = F.col(body_col) if isinstance(body_col, str) else body_col
    return F.concat(
        F.lit("u"), u.cast("string"), F.lit(" "), t, F.lit(": "),
        F.coalesce(b, F.lit("")),
    )


def assemble_transcripts(
    events: DataFrame,
    line: Column | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    order_col: str = "event_id",
    gap_minutes: int = 30,
    max_turns: int = 64,
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, n_turns,
    n_tokens, transcript) — one row per (user, inactivity session),
    ``transcript`` = the session's first ``max_turns`` turn lines in
    (ts, order_col) order joined with newlines.

    Session semantics match `operators/windows.py:sessionized` exactly:
    a new session opens when the inter-event gap STRICTLY exceeds the
    timeout; session_end = last event + gap (F.session_window's end).
    n_events counts the WHOLE session; n_turns = min(n_events,
    max_turns); n_tokens is the engine's space-split token count of the
    transcript (`ext/text.py:token_count`) — the number the packing /
    quota stages downstream will see."""
    if max_turns < 1:
        raise ValueError(f"assemble_transcripts: max_turns={max_turns} < 1")
    ln = line if line is not None else turn_line(user_col=user_col)
    ts_us = F.unix_micros(F.col(ts_col))
    w_user = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    gap_us = int(gap_minutes) * _US_PER_MIN
    # NULL event times cannot sessionize — dropped, matching BOTH sibling
    # forms (F.session_window excludes null-window rows; the streaming
    # assembler filters timestamp.isNotNull())
    flagged = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col), F.col(ts_col), F.col(order_col), ln.alias("__line")
    ).withColumn(
        "__new_sess",
        F.when(
            ts_us - F.lag(ts_us).over(w_user) > F.lit(gap_us), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "__sess",
        F.sum("__new_sess").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_sess = Window.partitionBy(user_col, "__sess").orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    turns = numbered.withColumn("__rn", F.row_number().over(w_sess))
    # collect_list skips NULLs: only the first max_turns structs per
    # session are ever collected — the array is bounded by construction
    kept = F.when(
        F.col("__rn") <= F.lit(int(max_turns)),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("t"),
            F.col(order_col).alias("o"),
            F.col("__line").alias("l"),
        ),
    )
    grouped = turns.groupBy(user_col, "__sess").agg(
        F.min(ts_col).alias("session_start"),
        F.timestamp_micros(
            F.max(F.unix_micros(F.col(ts_col))) + F.lit(gap_us)
        ).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(F.collect_list(kept)).alias("__turns"),
    )
    transcript = F.array_join(
        F.transform(F.col("__turns"), lambda x: x["l"]), "\n"
    )
    return grouped.select(
        F.col(user_col),
        "session_start",
        "session_end",
        "n_events",
        F.size("__turns").cast("long").alias("n_turns"),
        token_count(transcript).cast("long").alias("n_tokens"),
        transcript.alias("transcript"),
    )
