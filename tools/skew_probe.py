#!/usr/bin/env python
"""Skew-mitigation probe: does salting actually flatten the straggler?

Setup: the events table grown 10× (same synthesis as scale_probe.py),
keyed zipf-style — HALF of all rows carry one hot key ('#general'), the
other half spread uniformly over 1000 tail keys. The probed shape is the
canonical skew victim: a SHUFFLED equi-join of the fact against a per-key
dim (shuffle_hash-hinted — a broadcastable dim would sidestep the shuffle
and prove nothing), either alone (join_only) or feeding a per-key rollup
(join_rollup).

Three configurations per operation, each timed with WALL CLOCK and the
REDUCE-SIDE MAX TASK TIME (the straggler metric: max task across stages
with shuffle-read bytes > 0, from the Spark REST API — the map/scan
stage's cost is data-size-intrinsic and identical across configurations,
so including it would bury the comparison under a constant):

- aqe_skew     — unsalted join, AQE skew-join splitting ON with
                 probe-scaled thresholds (shuffle stats are COMPRESSED
                 bytes, and the defaults' 256 MB floor is sized for real
                 clusters). Measured: AQE matches the salt on join_only
                 (it splits the hot partition at runtime — that case
                 needs no code change) but CANNOT act on join_rollup —
                 splitting would duplicate key partitions and break the
                 downstream agg's required distribution, so the straggler
                 survives at unsalted size. That structural limit is the
                 measured motivation for the static salt.
- unsalted     — AQE skew splitting OFF: the hot key's entire row mass
                 lands in ONE reduce task. This is the 100 TB failure
                 mode being mitigated.
- salted       — AQE skew splitting OFF, operators/skew.py salted_join
                 (deterministic hash salt, `buckets` copies of the dim):
                 the hot key spreads over `buckets` tasks, and the
                 salted rollup's two-phase agg re-combines explicitly,
                 so no required distribution blocks the spread.

Fairness contracts, each learned the hard way in round 5:
- broadcast joins are disabled session-wide and BOTH legs carry the same
  shuffle_hash hint: the dim (even salt-exploded) is tiny, and letting
  the salted leg broadcast would credit broadcast's no-reduce-join win
  to the salt.
- the dim is an INDEPENDENT literal table, not a projection of the
  facts: a dim derived from the facts and persisted enters joins as an
  InMemoryTableScan whose cached plan is already hash-partitioned on the
  key — no build-side shuffle stage exists, and OptimizeSkewedJoin
  (which needs shuffle stages on BOTH sides) silently never fires, at
  any threshold, even forceOptimizeSkewedJoin=true. That finding is
  real — caching a key-partitioned dim disables AQE skew mitigation for
  every join against it — but it must not contaminate this comparison.
- the salt comparison asserts bit-identical rollup output before timing
  (salting is a pure rewrite).

The salt is a pure rewrite: all three configurations must produce the
IDENTICAL rollup, asserted before timing.

Usage: python tools/skew_probe.py [sf_dir]    (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from beeper_matric_etl_tool_spark import get_spark  # noqa: E402
from beeper_matric_etl_tool_spark.operators.skew import salted_join  # noqa: E402
from beeper_matric_etl_tool_spark.sources.tables import table  # noqa: E402

FACTOR = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
BUCKETS = int(os.environ.get("SPARK_GRAFT_PROBE_SALT_BUCKETS", "32"))
N_TAIL_KEYS = 1000


def grown(events, factor: int):
    """events × factor with disjoint ids (scale_probe.py synthesis)."""
    span = events.agg(F.max("event_id")).first()[0] + 1
    copies = [
        events.select(
            (F.col("event_id") + F.lit(i * span)).alias("event_id"),
            "user_id", "value", "props",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def zipf_keyed(events):
    """Half the rows on ONE hot key, half uniform over the tail — the
    '#general room' shape, keyed deterministically off event_id. The
    events table's props column averages ~9 bytes, which makes the hot
    partition a few compressed MB and the straggler invisible next to
    task overhead; a real room's messages are text-sized, so the probe
    widens the payload to ~128 deterministic bytes per row."""
    key = F.when(F.col("event_id") % 2 == 0, F.lit("#general")).otherwise(
        F.concat(F.lit("k"), (F.col("event_id") % N_TAIL_KEYS).cast("string"))
    )
    payload = F.concat(
        F.coalesce(F.col("props"), F.lit("")),
        *[
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(f":{i}")))
            for i in range(4)
        ],
    )
    return events.select(
        "event_id", key.alias("room_key"), F.col("value"),
        payload.alias("props"),
    )


def join_unsalted(facts, dim):
    return facts.join(dim.hint("shuffle_hash"), on="room_key")


def join_salted(facts, dim):
    # the same shuffle_hash hint as the unsalted leg: the exploded dim is
    # still tiny (~keys × buckets rows) and would otherwise BROADCAST,
    # which sidesteps the reduce-side join entirely and would credit
    # broadcast's win to the salt — the probed comparison must hold the
    # join strategy fixed and vary ONLY the key salting
    return salted_join(
        facts, dim.hint("shuffle_hash"), on="room_key",
        salt_source="event_id", buckets=BUCKETS,
    )


def _rollup(joined):
    return joined.groupBy("room_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.md5("props")) * F.col("weight")).alias("w"),
    )


def rollup_unsalted(facts, dim):
    return _rollup(join_unsalted(facts, dim))


def rollup_salted(facts, dim):
    return _rollup(join_salted(facts, dim))


def _rest(spark, path):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _completed_stages(spark):
    """{(stageId, attemptId): shuffleReadBytes} — the stage list already
    carries the shuffle-read metric, so no per-stage re-fetch is needed."""
    return {
        (s["stageId"], s["attemptId"]): s.get("shuffleReadBytes", 0)
        for s in _rest(spark, "/stages?status=COMPLETE")
    }


def timed_with_max_task(spark, df):
    """(wall_sec, reduce_max_task_sec) of one noop-forced execution (after
    one untimed warm-up). The straggler metric is the max task
    executorRunTime across the REDUCE stages only (stages with shuffle
    READ bytes > 0): key skew manifests in the post-shuffle stage, while
    the map/scan stage's cost is data-size-intrinsic and identical across
    configurations — including it would swamp the comparison with a
    constant."""
    df.write.format("noop").mode("overwrite").save()  # warm
    before = _completed_stages(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    after = _completed_stages(spark)
    max_task_ms = 0.0
    for (sid, att), shuffle_read in after.items():
        if (sid, att) in before:
            continue
        if not shuffle_read:
            continue  # map/scan stage: no shuffle input, no key skew
        try:
            summ = _rest(
                spark, f"/stages/{sid}/{att}/taskSummary?quantiles=1.0"
            )
            max_task_ms = max(max_task_ms, summ["executorRunTime"][0])
        except Exception:
            pass  # stage evicted from the UI store — skip
    return round(wall, 4), round(max_task_ms / 1000.0, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    spark = get_spark(
        app_name="skew-probe",
        extra_conf={
            "spark.ui.enabled": "true",  # REST API = the max-task-time source
            "spark.ui.retainedStages": "2000",
            # broadcast joins OFF for the whole probe: the dim (and its
            # salted explosion) is tiny and would broadcast, removing the
            # reduce-side join the probe exists to measure — every
            # configuration must pay the same shuffle-join shape
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    events = table(spark, sf_dir, "events")
    facts = zipf_keyed(grown(events, FACTOR)).persist()
    n_rows = facts.count()
    hot_rows = facts.filter(F.col("room_key") == "#general").count()

    # INDEPENDENT literal dim (a real dimension table, not a projection of
    # the facts). Deriving it from `facts` looks natural but poisons the
    # measurement twice: (a) cache-substitution quirks silently recompute
    # the corpus-sized distinct inside some probed plans, and (b) a
    # persisted key-partitioned dim enters joins as an InMemoryTableScan
    # with pinned partitioning, which structurally disables AQE skew
    # splitting (see module docstring — that finding is real and kept,
    # but it must not contaminate the salted-vs-unsalted comparison).
    keys = ["#general"] + [f"k{i}" for i in range(N_TAIL_KEYS)]
    dim = spark.createDataFrame(
        [(k, len(k) % 7 + 1) for k in keys], "room_key string, weight long"
    )

    # the salt is a pure rewrite: identical rollup required before timing
    base_rows = sorted(tuple(r) for r in rollup_unsalted(facts, dim).collect())
    salt_rows = sorted(tuple(r) for r in rollup_salted(facts, dim).collect())
    assert base_rows == salt_rows, "salted rollup diverged from unsalted"

    out = {
        "factor": FACTOR,
        "rows": n_rows,
        "hot_rows": hot_rows,
        "hot_share": round(hot_rows / n_rows, 3),
        "salt_buckets": BUCKETS,
        "probe": {},
    }
    # AQE's skew thresholds are sized for real clusters (256 MB skewed-
    # partition floor); the probe's hot partition is ~25-50 MB, so the
    # aqe_skew run scales them down proportionally — otherwise the run
    # measures "AQE declined to act", not AQE's mitigation. At 100 TB the
    # defaults are the right ones.
    aqe_probe_conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    }
    defaults = {k: spark.conf.get(k) for k in aqe_probe_conf}
    # Two probed operations:
    # - join_only: skewed join whose output feeds a partitioning-agnostic
    #   consumer. AQE CAN split the hot partition here — the production
    #   default covers this case with zero code change.
    # - join_rollup: the same join feeding a groupBy ON THE JOIN KEY.
    #   AQE declines to split (splitting would duplicate key partitions
    #   and break the agg's required distribution), so the hot task
    #   survives — THIS is the case that needs the static salt, whose
    #   two-phase agg re-combines explicitly.
    runs = (
        ("join_only", "aqe_skew", join_unsalted, "true", aqe_probe_conf),
        ("join_only", "unsalted", join_unsalted, "false", defaults),
        ("join_only", "salted", join_salted, "false", defaults),
        ("join_rollup", "aqe_skew", rollup_unsalted, "true", aqe_probe_conf),
        ("join_rollup", "unsalted", rollup_unsalted, "false", defaults),
        ("join_rollup", "salted", rollup_salted, "false", defaults),
    )
    for op, name, fn, aqe_skew, conf in runs:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        for k, v in conf.items():
            spark.conf.set(k, v)
        wall, max_task = timed_with_max_task(spark, fn(facts, dim))
        out["probe"].setdefault(op, {})[name] = {
            "wall_sec": wall, "max_task_sec": max_task,
        }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    for k, v in defaults.items():
        spark.conf.set(k, v)

    for op, res in out["probe"].items():
        if res["salted"]["max_task_sec"]:
            res["straggler_flattening"] = round(
                res["unsalted"]["max_task_sec"] / res["salted"]["max_task_sec"], 2
            )
    facts.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
