#!/usr/bin/env python
"""Interleaved, position-balanced ratio A/B for the r11 perf-weak list
(r12; the r6 methodology — BASELINE.md "files" A/B).

Two questions, one session, same moment:

1. `pricing_summary` re-crossed the 2x same-run-oracle gate by 3% in
   BENCH_r11 (2.06x) after the orders re-chunk shipped. Is the ratio
   back under the gate, and does removing orders from the chunk plan
   (layout B = lineitem-only chunking) move it at all? pricing_summary
   never reads orders, so any A-vs-B delta is pure layout side-effect
   (listing pressure, cache residency).
2. `latest_event_per_user` moved +31% absolute in r11 while its oracle
   stayed flat, on untouched code. Same-session ratio decides
   drift-vs-regression.

Per rep the two layouts alternate order (position balance: a fixed
order inflates the second position 10-40% via cache/JIT carryover — the
r5 lesson), System.gc() between pairs, DuckDB timed in the same rep.
`text_stats` rides along as a non-lineitem control. Prints one JSON
line with per-query medians and ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("SPARK_GRAFT_AQE", "1")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")

from beeper_matric_etl_tool_spark import get_spark, plans  # noqa: E402

QUERIES = (
    "pricing_summary",
    "latest_event_per_user",
    "merge_changed_dim",  # r13: the r12 verdict's one unclassified ratio
    "text_stats",
)
REPS = int(os.environ.get("AB_REPS", "7"))

# r14 (VERDICT item 2): AB_QUERIES=all runs EVERY headline query through the
# same interleaved, position-balanced loop — the on-record per-query
# normalized ratio table the r13 judge asked for, so drift-flagged headliners
# (rooms_with_participants 0.54x, knn_search 0.79x in PERF_r13) are settled
# by same-session ratios instead of cross-moment wall-clocks. A comma list
# selects specific queries.
_qsel = os.environ.get("AB_QUERIES", "")
if _qsel == "all":
    from beeper_matric_etl_tool_spark import plans as _plans

    QUERIES = tuple(_plans.headline_names())
elif _qsel:
    QUERIES = tuple(q.strip() for q in _qsel.split(",") if q.strip())


def _layout_lineitem_only(spark, sf_dir: str) -> str:
    """Layout B: the pre-r11 chunk plan — lineitem split by the size
    rule, every other table (orders included) symlinked single-file."""
    from bench import TARGET_CHUNK_BYTES

    base = os.path.join(tempfile.gettempdir(), "spark-graft-ab-lineitem-only")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    for f in os.listdir(sf_dir):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, f)
        if f == "lineitem.parquet":
            n = max(2, min(32, os.path.getsize(src) // TARGET_CHUNK_BYTES))
            spark.read.parquet(src).repartition(int(n)).write.mode(
                "overwrite"
            ).parquet(os.path.join(base, f))
        else:
            os.symlink(src, os.path.join(base, f))
    return base


def main() -> None:
    from bench import _prepare_bench_layout

    sf_dir = os.path.abspath(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark(
        app_name="ratio-ab-probe",
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

    layout_a = _prepare_bench_layout(spark, sf_dir)  # shipped rule (orders chunked)
    layout_b = _layout_lineitem_only(spark, sf_dir)  # orders unchunked

    import duckdb

    from beeper_matric_etl_tool_spark.sources.tables import TABLES

    con = duckdb.connect()
    con.sql(f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    specs = plans.specs()
    jvm = spark.sparkContext._jvm

    # untimed warm pass over both layouts + oracle
    for name in QUERIES:
        for layout in (layout_a, layout_b):
            specs[name].fn(spark, layout).write.format("noop").mode(
                "overwrite"
            ).save()
        con.sql(specs[name].oracle).fetchall()

    samples: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS):
        for name in QUERIES:
            order = (
                [("A", layout_a), ("B", layout_b)]
                if rep % 2 == 0
                else [("B", layout_b), ("A", layout_a)]
            )
            for tag, layout in order:
                df = specs[name].fn(spark, layout)
                jvm.System.gc()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples.setdefault((name, tag), []).append(
                    time.perf_counter() - t0
                )
            t0 = time.perf_counter()
            con.sql(specs[name].oracle).fetchall()
            samples.setdefault((name, "D"), []).append(
                time.perf_counter() - t0
            )

    out: dict = {"reps": REPS, "sf_dir": sf_dir, "queries": {}}
    for name in QUERIES:
        med = {
            tag: round(statistics.median(samples[(name, tag)]), 4)
            for tag in ("A", "B", "D")
        }
        out["queries"][name] = {
            "spark_orders_chunked": med["A"],
            "spark_orders_unchunked": med["B"],
            "duckdb": med["D"],
            "ratio_A": round(med["A"] / med["D"], 2) if med["D"] else None,
            "ratio_B": round(med["B"] / med["D"], 2) if med["D"] else None,
            "B_vs_A_pct": round(100 * (med["B"] / med["A"] - 1), 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
