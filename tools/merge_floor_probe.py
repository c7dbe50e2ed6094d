#!/usr/bin/env python
"""Interleaved same-session ratio probe for `merge_changed_dim` (r13 —
the r12 verdict's one required re-measure): in BENCH_r12 its Spark
absolute IMPROVED (0.154 → 0.141 s) while the same-run DuckDB oracle
drifted 34.6 → 48.7 ms, crossing the ≥40 ms gate and making the ratio
newly gate-relevant on UNTOUCHED code. One session, same moment,
decides drift-vs-regression and classifies the residual.

Design (the r6 methodology, as in tools/ratio_ab_probe.py):
- per rep: Spark merge noop-write, its STRUCTURAL FLOOR TWIN
  (customer FULL OUTER JOIN a filtered projection of itself on
  c_custkey, trivial projection — the merge's scans and shuffle with
  none of its change-detection logic), a single-scan job (the 1-stage
  floor), then the DuckDB oracle — System.gc() between Spark timings.
- if twin ≈ merge, the ratio is the documented scheduler/stage floor
  class (BASELINE.md "Per-query floor"): DuckDB answers a ~15k-row
  dim merge inside one row group in tens of ms; a 3-stage Spark plan
  pays ~0.1-0.3 s of scheduling at ANY size — the cost a 100 TB dim
  merge amortizes and a 1.5 MB one cannot.

Prints one JSON line with medians, ratios, and the floor share.
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

from beeper_matric_etl_tool_spark import get_spark, plans  # noqa: E402
from beeper_matric_etl_tool_spark.sources.tables import table  # noqa: E402

REPS = int(os.environ.get("AB_REPS", "9"))


def main() -> None:
    from bench import _prepare_bench_layout

    sf_dir = os.path.abspath(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark(
        app_name="merge-floor-probe",
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.broadcast.compress": "false",
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    layout = _prepare_bench_layout(spark, sf_dir)

    import duckdb

    from beeper_matric_etl_tool_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.sql(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spec = plans.specs()["merge_changed_dim"]

    def merge_df():
        return spec.fn(spark, layout)

    def twin_df():
        # the merge's structural skeleton: same source scans, same
        # equi-key shuffle join width, no change-detection expressions
        cust = table(spark, layout, "customer")
        right = cust.filter(F.col("c_custkey") % 2 == 0).select(
            F.col("c_custkey"), F.col("c_acctbal").alias("r_acctbal")
        )
        return cust.join(right, on="c_custkey", how="full_outer").select(
            "c_custkey", "c_acctbal", "r_acctbal"
        )

    def scan_df():
        return table(spark, layout, "customer").select("c_custkey", "c_acctbal")

    jvm = spark.sparkContext._jvm
    jobs = {"merge": merge_df, "twin": twin_df, "scan": scan_df}

    # untimed warm pass
    for fn in jobs.values():
        fn().write.format("noop").mode("overwrite").save()
    con.sql(spec.oracle).fetchall()

    samples: dict[str, list[float]] = {}
    for rep in range(REPS):
        order = list(jobs.items())
        if rep % 2:
            order = order[::-1]  # position balance
        for tag, fn in order:
            df = fn()
            jvm.System.gc()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.setdefault(tag, []).append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.sql(spec.oracle).fetchall()
        samples.setdefault("duckdb", []).append(time.perf_counter() - t0)

    med = {k: statistics.median(v) for k, v in samples.items()}
    out = {
        "reps": REPS,
        "sf_dir": sf_dir,
        "merge_s": round(med["merge"], 4),
        "twin_s": round(med["twin"], 4),
        "scan_s": round(med["scan"], 4),
        "duckdb_s": round(med["duckdb"], 4),
        "ratio": round(med["merge"] / med["duckdb"], 2),
        "twin_share_pct": round(100 * med["twin"] / med["merge"], 1),
        "spread": {
            k: [round(min(v), 4), round(max(v), 4)]
            for k, v in samples.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
