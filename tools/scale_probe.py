#!/usr/bin/env python
"""Scale-growth probe: how do representative operators behave when the
events table grows 10×?

The bench tier (sf0.1) cannot answer "what happens at 100×" directly, but
the GROWTH CURVE between 1× and 10× on identical hardware separates the
three cost regimes that matter for the 100 TB design point:

- flat        → per-query constant dominates (scheduler, not compute);
                the operator ships to a big cluster as-is
- sub-linear  → map-side combine / top-k pruning absorbing the growth
- super-linear → a real scale hazard (would get worse at 1000×)

Synthesis: the 10× table is the real events table unioned 10 times with
disjoint event_id ranges and day-shifted timestamps — same key
cardinality growth, same value distributions, no driver-side row
generation.

Usage: python tools/scale_probe.py [sf_dir]     (default /root/testdata/sf0.1)
Prints one JSON line: {"probe": {...}, "factor": 10, "rows": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from beeper_matric_etl_tool_spark import get_spark  # noqa: E402
from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key_agg  # noqa: E402
from beeper_matric_etl_tool_spark.operators.pagination import keyset_page  # noqa: E402
from beeper_matric_etl_tool_spark.sources.tables import table  # noqa: E402

FACTOR = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))


def grown(events, factor: int):
    """events × factor with disjoint ids and day-shifted event times."""
    span = events.agg(F.max("event_id")).first()[0] + 1
    copies = [
        events.select(
            (F.col("event_id") + F.lit(i * span)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def probe_ops(events):
    """The three regimes' representatives, as (name, dataframe) pairs."""
    topk = keyset_page(
        events, order_col="ts", tie_col="event_id", limit=50,
        predicate=F.col("user_id") == F.lit(12),
    )
    latest = latest_by_key_agg(
        events.withColumn("__ord", F.coalesce(F.unix_millis("ts"), F.lit(-(2 ** 63)))),
        keys=["user_id"], max_order_cols=["__ord", "event_id"],
    )
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )
    return {"keyset_topk": topk, "latest_by_key": latest, "hourly_rollup": hourly}


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "0")
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    events = table(spark, sf_dir, "events")
    big = grown(events, FACTOR).persist()
    n1, n10 = events.count(), big.count()

    out = {"factor": FACTOR, "rows": {"base": n1, "grown": n10}, "probe": {}}
    for name, df1 in probe_ops(events).items():
        t1 = timed(df1)
        t10 = timed(probe_ops(big)[name])
        out["probe"][name] = {
            "base_sec": t1,
            "grown_sec": t10,
            "growth_ratio": round(t10 / t1, 2) if t1 else None,
        }
    big.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
