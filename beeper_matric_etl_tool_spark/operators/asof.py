"""As-of (temporal) join — enrich events with the latest state known at
event time.

The reference correlates each event with its room/member state *at arrival*
(client.ts:271-283) — an implicit as-of semantics that becomes explicit the
moment state history is retained. Spark has no ASOF JOIN operator; the
scalable formulation is the union-sort trick:

  tag state rows and event rows, union them, and take per key the LAST
  state payload at-or-before each row in event-time order
  (``last(payload, ignorenulls=True)`` over an unbounded-preceding window).

One shuffle on the key, one sort within partitions — identical cost shape
to a sort-merge join, with no range-explosion. A broadcast variant (state
side collected per key) would be O(|events|·|state-per-key|); the union
form stays linear and AQE-splittable, so it is the only form offered.

Tie rule: a state row at exactly the event's timestamp IS visible to it
(state sorts before events at equal ts) — matching ASOF JOIN's `<=`.

Caveat: two STATE rows with the same (key, ts) have no defined winner
(same as SQL ASOF JOIN); give state a total order upstream if that can
occur (e.g. dedup with latest_by_key on a tie-breaking column first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    state: DataFrame,
    on: Sequence[str],
    events_ts: str,
    state_ts: str,
    payload: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """events ⟕ (latest state row with state_ts <= events_ts) per key.

    ``payload`` are the state columns carried onto each event. With
    ``how='inner'``, events with no preceding state are dropped.
    """
    if how not in ("left", "inner"):
        # an unrecognized mode (full, 'Inner', left_outer, a typo) would
        # otherwise silently behave as a left join
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    keys = list(on)
    # the payload travels as ONE struct: `last(ignorenulls)` over the struct
    # is null only when NO state row precedes the event. Per-column
    # last(ignorenulls) would be wrong twice over: a legitimately-NULL
    # column in the latest state row would resurrect an older row's value,
    # and a multi-column payload could stitch together columns from
    # DIFFERENT state rows — a row that never existed.
    ev = events.select(
        *keys,
        F.col(events_ts).alias("__ts"),
        F.lit(1).alias("__is_event"),
        F.lit(None).cast(
            state.select(F.struct(*payload).alias("s")).schema["s"].dataType
        ).alias("__st"),
        F.struct(*[c for c in events.columns if c not in keys]).alias("__ev"),
    )
    st = state.select(
        *keys,
        F.col(state_ts).alias("__ts"),
        F.lit(0).alias("__is_event"),
        F.struct(*payload).alias("__st"),
        F.lit(None).cast(ev.schema["__ev"].dataType).alias("__ev"),
    )
    unioned = ev.unionByName(st)
    # state (__is_event=0) sorts before events at equal ts -> `<=` visibility
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__is_event").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "__ts",
        "__is_event",
        "__ev",
        F.last(F.col("__st"), ignorenulls=True).over(w).alias("__latest"),
    ).filter(F.col("__is_event") == 1)
    out = carried.select(
        *keys,
        F.col("__ev.*"),
        *[F.col(f"__latest.{p}").alias(p) for p in payload],
        F.col("__latest").isNotNull().alias("__matched"),
    )
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
