#!/usr/bin/env python
"""Per-headline-query job/stage/task census on the bench profile.

The headline total is floor-dominated at sf0.1 (BASELINE.md "Per-query
floor"): ~43 ms/job + ~30-50 ms/stage of scheduler constant. That makes
STAGE COUNT the drift-free optimization target — wall-clock comparisons
between sessions on the shared VM swing ±30-40%, but a plan that runs 5
stages instead of 8 is better on every machine and at every scale.

Prints one line per headline query: jobs, stages, tasks, wall seconds.

Caveat: the census times and groups ONLY the final action — work a catalog
entry executes eagerly during plan CONSTRUCTION (e.g. kmeans_invariants'
Lloyd iterations and component loop) happens before the job group is set
and is not counted. All current headline queries are construction-lazy; if
an eager one is ever promoted to headline, wrap its fn() call too.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")

from beeper_matric_etl_tool_spark import get_spark, plans  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    specs = plans.specs()
    names = plans.headline_names() or list(specs)

    # warm pass (codegen/footer caches) so the census reflects steady state
    for name in names:
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    print(f"{'query':30s} {'jobs':>5} {'stages':>7} {'tasks':>6} {'sec':>7}")
    total_stages = 0
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        job_ids = [j for j in (tracker.getJobIdsForGroup(name) or [])]
        stages = 0
        tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        total_stages += stages
        print(f"{name:30s} {len(job_ids):>5} {stages:>7} {tasks:>6} {wall:>7.3f}")
    print(f"{'TOTAL':30s} {'':>5} {total_stages:>7}")
    spark.stop()


if __name__ == "__main__":
    main()
