"""Interleaved same-session A/B of the merge sink's PER-BATCH cost —
old (r12) three-action shape vs new (r13) one-stats-job shape.

The foreachBatch writers are plain (DataFrame, batch_id) callables, so
this probe drives them directly on identical static micro-batches
against identical pre-seeded targets — no stream machinery, no listing
noise, pure sink cost. Position-balanced: alternating old/new order per
rep. Reports wall + job/stage counts per variant.

Usage: python tools/stream_batch_ab.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from beeper_matric_etl_tool_spark import get_spark, sinks  # noqa: E402
from beeper_matric_etl_tool_spark.sources.tables import table  # noqa: E402
from beeper_matric_etl_tool_spark.streaming import ingest  # noqa: E402


def old_merge_batch_writer(
    target_dir: str,
    keys: list[str],
    order_col: str = "timestamp",
    watermark_delay_ms: int | None = None,
    event_time_col: str = "timestamp",
):
    """The r12 shape: isEmpty + agg(max) + distinct-collect as separate
    actions (reconstructed from commit 312accd for the A/B)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.withColumn(
            "__batch_id", F.lit(batch_id).cast("long")
        ).persist()
        try:
            if batch.isEmpty():
                return
            batch_high = None
            if watermark_delay_ms is not None:
                batch_high = batch.agg(F.max(event_time_col)).first()[0]
                stored = ingest._read_watermark(spark, target_dir)
                if stored is not None:
                    cutoff = stored - watermark_delay_ms
                    batch = batch.filter(
                        F.col(event_time_col).isNull()
                        | (F.col(event_time_col) >= cutoff)
                    )

            def merge(existing, b):
                from beeper_matric_etl_tool_spark.operators.dedup import (
                    latest_by_key_agg,
                )

                src = b
                if existing is not None:
                    src = existing.unionByName(b.select(*existing.columns))
                src = src.withColumn(
                    "__ord", F.coalesce(F.col(order_col).cast("long"), F.lit(-1))
                )
                return latest_by_key_agg(
                    src, keys=keys, max_order_cols=["__ord", "__batch_id"]
                ).drop("__ord")

            day_bucket = F.coalesce(
                F.floor(F.col(event_time_col) / F.lit(86_400_000)), F.lit(-1)
            ).cast("int")
            sinks.partitioned_upsert(
                spark, target_dir, batch, merge,
                bucket_expr=day_bucket, persist=False,
            )
            if batch_high is not None:
                stored = ingest._read_watermark(spark, target_dir)
                if stored is None or batch_high > stored:
                    ingest._write_watermark(spark, target_dir, batch_high)
        finally:
            batch.unpersist()

    return write


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="stream-batch-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    events = table(spark, sf, "events")
    parsed = events.select(
        F.col("event_id").cast("string").alias("__merge_key"),
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.col("event_type"),
    )
    page = (
        parsed.orderBy(F.col("timestamp").desc())
        .limit(1000)
        .localCheckpoint(eager=True)  # static batch — identical rows per rep
    )

    work = tempfile.mkdtemp(prefix="sink-ab-")
    tgts = {}
    for variant in ("old", "new"):
        tgt = os.path.join(work, variant)
        tgts[variant] = tgt
        # seed the target with the full history once (same for both)
        seed = ingest.merge_batch_writer(
            tgt, keys=["__merge_key"], watermark_delay_ms=3_600_000
        )
        seed(parsed, 0)

    writers = {
        "old": old_merge_batch_writer(
            tgts["old"], keys=["__merge_key"], watermark_delay_ms=3_600_000
        ),
        "new": ingest.merge_batch_writer(
            tgts["new"], keys=["__merge_key"], watermark_delay_ms=3_600_000
        ),
    }

    walls = {"old": [], "new": []}
    jobs = {"old": 0, "new": 0}
    stages = {"old": 0, "new": 0}
    for rep in range(reps):
        order = ("old", "new") if rep % 2 == 0 else ("new", "old")
        for variant in order:
            grp = f"{variant}-{rep}"
            sc.setJobGroup(grp, grp)
            t0 = time.perf_counter()
            writers[variant](page, rep + 1)
            walls[variant].append(time.perf_counter() - t0)
            sc.setJobGroup("", "")
            for j in tracker.getJobIdsForGroup(grp) or []:
                info = tracker.getJobInfo(j)
                if info is None:
                    continue
                jobs[variant] += 1
                stages[variant] += len(info.stageIds)

    import statistics

    for variant in ("old", "new"):
        w = walls[variant]
        print(
            f"{variant}: median {statistics.median(w):.3f}s "
            f"(min {min(w):.3f} max {max(w):.3f}) "
            f"jobs/batch {jobs[variant] / reps:.1f} "
            f"stages/batch {stages[variant] / reps:.1f}"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
