#!/usr/bin/env python
"""Benchmark harness: times every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the `noop` sink — full computation, zero
serialization back to the driver. Methodology: one untimed warm-up
execution per query (codegen compilation, file-footer caching, JIT), then
the timed run — steady-state numbers, the regime a long-lived engine
actually serves. Set SPARK_GRAFT_BENCH_WARMUP=0 for cold timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from beeper_matric_etl_tool_spark import get_spark, plans  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="beeper-matric-etl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM / executor threads with a trivial job
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    specs = plans.specs()
    names = plans.headline_names() or list(specs)
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    timings: dict[str, float] = {}
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        if warmup:
            df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
