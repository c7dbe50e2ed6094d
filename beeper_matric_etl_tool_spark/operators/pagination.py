"""Keyset (cursor) pagination + top-k (SURVEY §2.6 O2/O3, §2.3 P3/P4).

Reference semantics: ``GET /:roomId/messages?limit&before`` assembles
``SELECT * FROM messages WHERE room_id=$1 [AND timestamp<$3]
ORDER BY timestamp DESC LIMIT $2`` (/root/reference/src/server/api/routes.ts:132-143),
served by the composite ``(room_id, timestamp)`` index
(/root/reference/src/server/db/schema.ts:81).

Spark-first: express the same plan declaratively. Catalyst pushes the equality
and range predicates into the Parquet scan (PushedFilters) and plans the
order+limit as ``TakeOrderedAndProject`` — a per-partition top-k followed by a
k-row merge on the driver, no global sort. That plan is scale-stable: at 100 TB
each task returns at most ``limit`` rows regardless of partition sizes.

A tie-breaker key is mandatory: ``LIMIT`` under ties is nondeterministic, and a
keyset cursor over a non-unique sort key silently skips rows. The reference
gets away with it because Postgres `timestamp` + index order is stable per
instance; we make determinism explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keyset_page(
    df: DataFrame,
    order_col: str,
    tie_col: str,
    limit: int = 50,
    before: Column | None = None,
    predicate: Column | None = None,
    before_tie: Column | None = None,
) -> DataFrame:
    """One page of a keyset-paginated scan, newest first.

    ``predicate`` is the partition filter (e.g. room_id == x); ``before`` is
    the exclusive cursor on ``order_col``. Both are optional — the dynamic
    predicate splicing mirrors routes.ts:132-143 (filters only added when the
    request carries the parameter).

    ``before_tie`` upgrades the cursor to the TUPLE form
    ``(order_col, tie_col) < (before, before_tie)``: when consecutive pages
    are cut mid-tie (several rows share the boundary ``order_col`` value),
    the scalar ``order_col < before`` cursor silently skips the boundary's
    remaining rows — the exact hazard the module docstring pins on
    non-unique sort keys. Callers paging with the previous page's LAST row
    should pass both its columns; the scalar form is kept because it is the
    reference API's literal shape (timestamp-only cursor). Both forms push
    into the scan as ordinary range predicates."""
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    if before is not None:
        if before_tie is not None:
            out = out.filter(
                (F.col(order_col) < before)
                | ((F.col(order_col) == before) & (F.col(tie_col) < before_tie))
            )
        else:
            out = out.filter(F.col(order_col) < before)
    elif before_tie is not None:
        raise ValueError("keyset_page: before_tie requires before")
    return out.orderBy(F.col(order_col).desc(), F.col(tie_col).desc()).limit(limit)
