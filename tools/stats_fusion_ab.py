#!/usr/bin/env python
"""stats_summary shape A/B (r14, VERDICT item 6): measure the REJECTED
one-scan fusion against the shipped two-scan shape instead of rejecting
it on shape grounds.

Shape A (shipped): two events aggregations — the scalar battery (count /
single-distinct users / conditional count / max ts) plus a separate
(cents, freq) histogram folded by weighted ``percentile``. Two scans,
but every stage is map-side partial-aggregated and the final fold sees
only the distinct-cents domain.

Shape B (fusion): ONE events aggregation computing the battery AND
``percentile(cents, array(...))`` over the raw column in the same agg.
One scan — but mixing a distinct aggregate with non-distinct ones takes
Catalyst's Expand path (each input row duplicated per aggregate group),
and the raw-column percentile buffers every row's value in the single
final task: the serial O(|events|) step the shipped shape exists to
avoid. The A/B quantifies what that costs at sf0.1 and at 10x (events
unioned with day-shifted copies, the scale_probe synthesis).

Both shapes are asserted ROW-IDENTICAL before timing. Interleaved,
position-balanced, median of AB_REPS (default 7). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("SPARK_GRAFT_AQE", "1")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")

from pyspark.sql import functions as F  # noqa: E402

from beeper_matric_etl_tool_spark import get_spark  # noqa: E402
from beeper_matric_etl_tool_spark.functions import scalar as fx  # noqa: E402
from beeper_matric_etl_tool_spark.operators import stats  # noqa: E402
from beeper_matric_etl_tool_spark.sources.tables import table  # noqa: E402

REPS = int(os.environ.get("AB_REPS", "7"))


def shape_a(events, customer):
    """The shipped stats_summary shape (two-scan, histogram percentile)."""
    ev = events.agg(
        F.count(F.lit(1)).cast("long").alias("total_events"),
        F.countDistinct("user_id").alias("total_users"),
        stats.conditional_count(F.col("event_type") == "purchase", "purchase_events"),
        F.unix_millis(F.max("ts")).alias("last_sync_ms"),
    )
    cents = fx.cents(F.col("value"))
    hist = (
        events.select(cents.alias("__cents"))
        .groupBy("__cents")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )
    pct = hist.agg(
        F.expr("percentile(__cents, 0.25D, __freq)").alias("q25_value_cents"),
        F.expr("percentile(__cents, 0.50D, __freq)").alias("q50_value_cents"),
        F.expr("percentile(__cents, 0.75D, __freq)").alias("q75_value_cents"),
    )
    cu = customer.agg(F.count(F.lit(1)).alias("total_customers"))
    return stats.scalar_summary(events=ev, customers=cu, percentiles=pct)


def shape_b(events, customer):
    """The fusion: one events agg, raw-column percentile + mixed distinct."""
    cents = fx.cents(F.col("value"))
    ev = events.select(
        "user_id", "event_type", "ts", cents.alias("__cents")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("total_events"),
        F.countDistinct("user_id").alias("total_users"),
        stats.conditional_count(F.col("event_type") == "purchase", "purchase_events"),
        F.unix_millis(F.max("ts")).alias("last_sync_ms"),
        F.expr("percentile(__cents, 0.25D)").alias("q25_value_cents"),
        F.expr("percentile(__cents, 0.50D)").alias("q50_value_cents"),
        F.expr("percentile(__cents, 0.75D)").alias("q75_value_cents"),
    )
    cu = customer.agg(F.count(F.lit(1)).alias("total_customers"))
    joined = ev.crossJoin(cu)
    # align to shape_a's column order (scalar_summary keyword order:
    # events, customers, percentiles)
    return joined.select(
        "total_events", "total_users", "purchase_events", "last_sync_ms",
        "total_customers",
        "q25_value_cents", "q50_value_cents", "q75_value_cents",
    )


def main() -> None:
    from bench import _prepare_bench_layout

    sf_dir = os.path.abspath(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    factor = int(os.environ.get("AB_SCALE_FACTOR", "1"))
    spark = get_spark(
        app_name="stats-fusion-ab",
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    layout = _prepare_bench_layout(spark, sf_dir)

    events = table(spark, layout, "events")
    if factor > 1:
        # the scale_probe synthesis: disjoint id ranges, day-shifted
        # timestamps per copy (decorrelated maxima/quantiles not needed —
        # both shapes see the SAME synthesized table)
        base = events
        n = base.count()
        copies = [base]
        for i in range(1, factor):
            copies.append(
                base.select(
                    (F.col("event_id") + i * n).alias("event_id"),
                    (F.col("user_id") + i * 1_000_000).alias("user_id"),
                    "event_type",
                    (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
                    "value", "props",
                )
            )
            copies[-1] = copies[-1].select(*base.columns)
        events = copies[0]
        for c in copies[1:]:
            events = events.unionByName(c)
        events = events.repartition(32).localCheckpoint(eager=True)
    customer = table(spark, layout, "customer")

    a_df = shape_a(events, customer)
    b_df = shape_b(events, customer)
    # shapes must agree before any timing means anything (percentile over
    # (v, freq) histogram == percentile over raw column, exactly)
    a_rows = [tuple(r) for r in a_df.collect()]
    b_rows = [tuple(r) for r in b_df.collect()]
    assert a_rows == b_rows, f"shape mismatch:\nA={a_rows}\nB={b_rows}"

    jvm = spark.sparkContext._jvm
    samples: dict[str, list[float]] = {"A": [], "B": []}
    for rep in range(REPS):
        order = ["A", "B"] if rep % 2 == 0 else ["B", "A"]
        for tag in order:
            df = (shape_a if tag == "A" else shape_b)(events, customer)
            jvm.System.gc()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[tag].append(time.perf_counter() - t0)
    med = {t: round(statistics.median(s), 4) for t, s in samples.items()}
    print(json.dumps({
        "probe": "stats_summary_fusion", "sf_dir": sf_dir, "factor": factor,
        "reps": REPS, "two_scan_A": med["A"], "fusion_B": med["B"],
        "B_vs_A_pct": round(100 * (med["B"] / med["A"] - 1), 1),
        "rows_equal": True,
    }))


if __name__ == "__main__":
    main()
