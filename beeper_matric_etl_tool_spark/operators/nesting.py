"""Nested-aggregation joins (SURVEY §2.4 J1/J2, §2.5 A2).

The reference produces room→participants and user→rooms nesting with
*correlated* ``json_agg`` subqueries executed per outer row
(/root/reference/src/server/api/routes.ts:107-110,169-174) — an O(rooms)
loop of index probes in Postgres. We author the decorrelated form directly:
aggregate the child side once (map-side partial aggregation), then a single
equi-join against the parent — which Catalyst turns into a broadcast join
when the aggregated child side is small.

Scale note: the aggregation shuffles the child table once on the join key and
the join reuses that partitioning; no per-row subquery exists at any scale.
``collect_list`` output order is partition-dependent, so lists are always
sorted — determinism is part of the operator contract, not a test hack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nest_children(
    parent: DataFrame,
    child: DataFrame,
    on: str | list[str],
    child_col: Column,
    nested_name: str = "children",
    count_name: str | None = None,
    how: str = "left",
) -> DataFrame:
    """parent ⟕ (child grouped to a sorted array per key).

    ``child_col`` is the expression collected per child row (a column or a
    ``struct``). Unmatched parents get an empty array (json_agg of no rows is
    NULL in the reference; we normalize to [] — the API layer's `?? []`).
    """
    keys = [on] if isinstance(on, str) else list(on)
    agg_cols = [F.sort_array(F.collect_list(child_col)).alias(nested_name)]
    if count_name:
        # count the SAME expression that is collected: collect_list drops
        # nulls, so count(lit(1)) would disagree with the array it ships
        agg_cols.append(F.count(child_col).alias(count_name))
    grouped = child.groupBy(*keys).agg(*agg_cols)
    out = parent.join(grouped, on=keys, how=how)
    out = out.withColumn(
        nested_name, F.coalesce(F.col(nested_name), F.array().cast(out.schema[nested_name].dataType))
    )
    if count_name:
        out = out.withColumn(count_name, F.coalesce(F.col(count_name), F.lit(0)))
    return out
