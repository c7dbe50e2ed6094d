"""Dashboard statistics (SURVEY §2.5 A1/A4).

Reference: ``/api/stats`` runs three scalar subqueries in one statement
(/root/reference/src/server/api/routes.ts:216-224) and the dashboard shows
totalRooms / totalMessages / totalParticipants / encryptedRooms / lastSync
(/root/reference/src/app/components/dashboard.tsx:8-14,87,106).

Spark-first: each scalar is a partial-aggregated single-row agg (map-side
combine → one tiny shuffle each); the one-row frames are then cross-joined —
a zero-cost broadcast nested loop over single rows. Conditional counts use
``sum(when(...))`` so one scan serves many counters (A4), instead of one
scan per counter like the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scalar_summary(**scalars: DataFrame) -> DataFrame:
    """Cross-join named single-row aggregates into one summary row.

    Why crossJoin and not a null-padded union + max-fold: the broadcast
    exchanges of the non-stream frames execute as eager parallel jobs, so
    the wall-clock is max(branch) — a union-fold would instead append a
    final exchange+aggregate to the LONGEST branch's critical path
    (measured slower at bench scale, same result)."""
    dfs = list(scalars.values())
    out = dfs[0]
    for df in dfs[1:]:
        out = out.crossJoin(df)
    return out


def conditional_count(pred: Column, name: str) -> Column:
    """A4 — count rows satisfying ``pred`` without a second scan."""
    return F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
