"""Latest-by-key dedup — the K1 upsert kernel (SURVEY §2.2 K1, §2.5 A3).

Reference: ``INSERT … ON CONFLICT (event_id) DO UPDATE SET <all cols>``
(/root/reference/src/server/utils/db.utils.ts:35-47) collapses the
at-least-once event stream to exactly-once-by-key, last-write-wins. The same
kernel serves A3's "latest checkpoint token" argmax
(/root/reference/src/server/utils/db.utils.ts:274-277).

Spark-first: a window ``row_number() = 1`` per key over a total order. The
order must be *total* (tie columns included) or the result is
partition-nondeterministic — same requirement Postgres hides by arrival
order. At scale this is one hash-shuffle on the key columns; AQE handles
skewed keys (a hot room) via skew-join/partition splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "__rn",
) -> DataFrame:
    """Keep exactly one row per key — the first under ``order_by`` (pass
    descending columns for last-write-wins)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def latest_by_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    max_order_cols: Sequence[str],
) -> DataFrame:
    """Same contract as :func:`latest_by_key` but as ``max_by`` over a
    struct order — keeps the row whose ``(max_order_cols…)`` tuple is
    LARGEST per key.

    Prefer this at scale: an aggregate partial-combines map-side, so each
    input partition ships one candidate row per key instead of every row —
    the window variant must shuffle and sort the full table. (The window
    form remains for callers that need ranks, not just the argmax.)
    """
    payload = [c for c in df.columns if c not in keys]
    # backquote every interpolated name: a column like `last-updated`,
    # `a.b` or a SQL keyword would otherwise break (or silently re-parse
    # as a field access) inside the expr string
    bq = lambda c: f"`{c}`"  # noqa: E731
    out = df.groupBy(*keys).agg(
        F.expr(
            f"max_by(struct({', '.join(map(bq, payload))}), "
            f"struct({', '.join(map(bq, max_order_cols))}))"
        ).alias("__top")
    )
    return out.select(*keys, "__top.*")
