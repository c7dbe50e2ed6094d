"""Skew mitigation — salted join and two-phase aggregation.

AQE's skew-join splitting (on by default in the session factory) handles
most skew at runtime by splitting oversized shuffle partitions. Salting is
the *static* form for the cases AQE can't fix: a single key so hot that
one reduce task still owns it after splitting (the '#general room with
10M messages' shape), or aggregation state too large for one task.

- **Salted join**: explode the small side S ways (one copy per salt), salt
  the big side's key pseudo-randomly but DETERMINISTICALLY (hash of the
  row's unique column, never rand() — retries must re-salt identically),
  join on (key, salt). The hot key's rows spread over S tasks at the cost
  of S× the small side — which is exactly the broadcast tradeoff, applied
  only where needed.
- **Two-phase agg**: partial aggregate on (key, salt), then final on key.
  Only worthwhile for algebraic aggregates whose partial state is wide
  (collect-like); sums/counts already partial-combine map-side for free.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small on `on`, with the hot-key shuffle spread over `buckets`
    tasks. `salt_source` is any big-side column unique-ish per row (an id);
    the salt is a deterministic hash of it, so task retries reproduce the
    same placement.

    Only inner/left/left_semi/left_anti are pure rewrites: an outer side
    on `small` would surface each unmatched small row once PER SALT COPY.
    The check is an ALLOWLIST, not a blocklist: Spark accepts many aliases
    per join type (`outer` == `full` == `fullouter`, `cross`, …) and a
    miss on any alias means silently duplicated unmatched small rows.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/semi/anti joins are "
            f"a pure rewrite — any join outer on the exploded small side "
            f"multiplies its unmatched rows once per salt copy"
        )
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(buckets)))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return salted_big.join(salted_small, on=[on, "__salt"], how=how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Callable[[str], Column]]],
    salt_source: str,
    buckets: int = 8,
) -> DataFrame:
    """Two-phase groupBy for skewed keys: phase 1 aggregates (keys, salt)
    partials, phase 2 combines per key.

    `aggs` maps output name → (phase-1 aggregate column, phase-2 combiner)
    where the combiner is a function of the partial column NAME, e.g.::

        {"n":  (F.count(F.lit(1)), F.sum),   # counts re-combine by SUM
         "mx": (F.max("x"),        F.max)}   # maxima re-combine by MAX

    The combiner is REQUIRED per aggregate: a bare Column raises — the old
    implicit always-sum recombine silently corrupted any non-summable
    partial (`F.max` partials summed across salts is not a max). Partials
    must be algebraic (count/sum/min/max re-combine with themselves except
    count→sum; avg must be carried as sum+count and divided afterwards)."""
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2 and callable(spec[1])):
            raise TypeError(
                f"salted_aggregate: aggs[{name!r}] must be a (phase1_column, "
                f"phase2_combiner) tuple — an implicit sum recombine would "
                f"silently corrupt non-summable partials like F.max"
            )
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(buckets)))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, (c, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[combine(name).alias(name) for name, (_, combine) in aggs.items()]
    )
