#!/usr/bin/env python
"""Skew-mitigation probe: does salting actually flatten the straggler?

Setup: the events table grown 10× (same synthesis as scale_probe.py),
keyed zipf-style — HALF of all rows carry one hot key ('#general'), the
other half spread uniformly over 1000 tail keys. The probed shape is the
canonical skew victim: a SHUFFLED equi-join of the fact against a per-key
dim (shuffle_hash-hinted — a broadcastable dim would sidestep the shuffle
and prove nothing), either alone (join_only) or feeding a per-key rollup
(join_rollup).

Three configurations per operation, each timed with WALL CLOCK and MAX
TASK TIME (the straggler metric, from the Spark REST API):

- aqe_skew     — unsalted join, AQE skew-join splitting ON with
                 probe-scaled thresholds. MEASURED RESULT on the shipped
                 Spark build: the rule never engages for this probe's
                 shape — the join-stage task count stays at
                 shuffle_partitions even with thresholds at 16k,
                 factor=1.2 and forceOptimizeSkewedJoin=true (REST
                 stage-API verified). ROOT CAUSE (isolated by swapping
                 components against a textbook spark.range case, which
                 DOES split 32→53 tasks): the probe's dim is derived
                 from the facts and PERSISTED, so its cached plan already
                 ends hash-partitioned on the join key — the build side
                 is an InMemoryTableScan, not a shuffle stage, and
                 OptimizeSkewedJoin needs shuffle stages on BOTH sides
                 to replicate build partitions against split probe
                 partitions. Production lesson: caching a key-partitioned
                 dim PINS the partitioning and disables AQE skew
                 mitigation for every subsequent join against it — a
                 common, reasonable-looking pattern. With an uncached
                 dim, AQE does act on join_only (tasks 32→28 here), but
                 still cannot act on join_rollup: splitting would break
                 the downstream agg's required key distribution. The
                 static salt flattens the straggler in every one of
                 these variants — deterministic, consumer-agnostic —
                 which is why the engine ships it as an operator.
- unsalted     — AQE skew splitting OFF: the hot key's entire row mass
                 lands in ONE reduce task; max task time ≈ wall clock.
                 This is the 100 TB failure mode being mitigated.
- salted       — AQE skew splitting OFF, operators/skew.py salted_join
                 (deterministic hash salt, `buckets` copies of the dim):
                 the hot key spreads over `buckets` tasks; max task time
                 must drop toward wall/buckets, in BOTH operations —
                 the salted rollup's two-phase agg re-combines
                 explicitly, so no required distribution blocks it.

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
    '#general room' shape, keyed deterministically off event_id."""
    key = F.when(F.col("event_id") % 2 == 0, F.lit("#general")).otherwise(
        F.concat(F.lit("k"), (F.col("event_id") % N_TAIL_KEYS).cast("string"))
    )
    return events.select(
        "event_id", key.alias("room_key"), F.col("value"),
        F.coalesce(F.col("props"), F.lit("")).alias("props"),
    )


def join_unsalted(facts, dim):
    return facts.join(dim.hint("shuffle_hash"), on="room_key")


def join_salted(facts, dim):
    return salted_join(
        facts, dim, on="room_key", salt_source="event_id", buckets=BUCKETS
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
    return {
        (s["stageId"], s["attemptId"])
        for s in _rest(spark, "/stages?status=COMPLETE")
    }


def timed_with_max_task(spark, df):
    """(wall_sec, max_task_sec) of one noop-forced execution (after one
    untimed warm-up); max task executorRunTime across the stages the timed
    run completed."""
    df.write.format("noop").mode("overwrite").save()  # warm
    before = _completed_stages(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    max_task_ms = 0.0
    for sid, att in _completed_stages(spark) - before:
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
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    events = table(spark, sf_dir, "events")
    facts = zipf_keyed(grown(events, FACTOR)).persist()
    n_rows = facts.count()
    hot_rows = facts.filter(F.col("room_key") == "#general").count()

    dim = (
        facts.select("room_key").distinct()
        .withColumn("weight", (F.length("room_key") % 7 + 1).cast("long"))
        .persist()
    )
    dim.count()

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
    dim.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
