"""Referential-integrity operators (SURVEY §2.4 J3).

Reference: ``FOREIGN KEY … REFERENCES rooms(id) ON DELETE CASCADE``
(/root/reference/src/server/db/schema.ts:51,68). Spark has no constraints;
the engine enforces them structurally: left-semi join *applies* the
constraint (cascade-delete = keep only children whose parent exists),
left-anti join *audits* it (orphan report). Both are shuffle-free when the
parent key set broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _on(child: DataFrame, parent: DataFrame, child_keys: Sequence[str], parent_keys: Sequence[str]):
    return [child[c] == parent[p] for c, p in zip(child_keys, parent_keys)]


def _parent_keys(
    parent: DataFrame, parent_keys: Sequence[str], broadcast: bool
) -> DataFrame:
    """The deduped parent key set, optionally broadcast-hinted.

    ``broadcast=True`` (default) is right for DIMENSION parents — the
    reference's FK targets (rooms, users) are dimension-sized. Pass
    ``broadcast=False`` for a fact-sized parent: a hard broadcast of an
    unbounded side is an executor-OOM hazard at scale, and the plain
    semi/anti join then co-shuffles on the key like any other big join."""
    keys = parent.select(*parent_keys).distinct()
    return F.broadcast(keys) if broadcast else keys


def enforce_fk(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
    broadcast: bool = True,
) -> DataFrame:
    """Rows of ``child`` whose parent exists (ON DELETE CASCADE applied)."""
    return child.join(
        _parent_keys(parent, parent_keys, broadcast),
        on=_on(child, parent, child_keys, parent_keys),
        how="left_semi",
    )


def orphans(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Sequence[str],
    broadcast: bool = True,
) -> DataFrame:
    """Rows of ``child`` with no parent — the integrity-violation report."""
    return child.join(
        _parent_keys(parent, parent_keys, broadcast),
        on=_on(child, parent, child_keys, parent_keys),
        how="left_anti",
    )
