"""Vacuum-style compaction of append-mode parquet targets: file counts
shrink to the requested number, data survives byte-for-byte in value
terms, and bucketed merge targets are proven to NOT need it (their
dynamic overwrite self-compacts to one file per touched bucket)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark import sinks


def _flat_parquet_count(path: str) -> int:
    return sum(
        1 for f in os.listdir(path)
        if f.endswith(".parquet") and os.path.isfile(os.path.join(path, f))
    )


def test_compact_append_target(spark, tmp_path):
    path = str(tmp_path / "log")
    for i in range(12):
        sinks.append_log(
            spark.createDataFrame([(f"s{i}",)], "status string"), path
        )
    before = _flat_parquet_count(path)
    assert before >= 12  # append-mode pile-up is real
    removed = sinks.compact_target(spark, path, target_files=2)
    assert removed == before
    assert _flat_parquet_count(path) == 2  # target file count honored exactly
    rows = sorted(r.status for r in spark.read.parquet(path).collect())
    assert rows == sorted(f"s{i}" for i in range(12))
    # crash-safe swap left no temp/old siblings behind
    parent = os.path.dirname(path)
    assert [d for d in os.listdir(parent) if ".compact-" in d] == []
    # below threshold now → untouched, returns 0
    assert sinks.compact_target(spark, path) == 0


def test_merge_targets_self_compact(spark, tmp_path):
    """The premise check: bucket-partitioned upsert targets hold ONE file
    per bucket no matter how many merges ran — compaction has nothing to
    do there and the flat-dir scan correctly skips hive layouts."""
    from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key

    def merge(existing, batch):
        allrows = batch if existing is None else existing.unionByName(batch)
        return latest_by_key(allrows, keys=["k"], order_by=[F.col("seq").desc()])

    target = str(tmp_path / "tgt")
    seed = spark.range(0, 64).select(
        F.col("id").alias("k"), F.lit(1).alias("seq"), F.lit("v1").alias("payload")
    )
    sinks.partitioned_upsert(spark, target, seed, merge, keys=["k"], n_buckets=4)
    for seq in (2, 3, 4):
        batch = spark.createDataFrame([(5, seq, f"v{seq}")], "k long, seq int, payload string")
        sinks.partitioned_upsert(spark, target, batch, merge, keys=["k"], n_buckets=4)
    per_bucket = {}
    for root, dirs, files in os.walk(target):
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        n = sum(f.endswith(".parquet") for f in files)
        if n:
            per_bucket[os.path.basename(root)] = n
    assert per_bucket and all(n == 1 for n in per_bucket.values())
    assert sinks.compact_target(spark, target) == 0  # nothing flat to compact


def test_filesystem_contract_refuses_object_store_paths(spark):
    """The sink family's POSIX machinery (os.walk listing, two-rename
    compaction swap, watermark side file) REFUSES scheme-prefixed URIs —
    sinks.py "Filesystem contract". The dangerous silent alternative:
    has_parquet returning False for an EXISTING s3:// target would make
    the merge path treat it as a first write and overwrite it."""
    import pytest

    from beeper_matric_etl_tool_spark.streaming import ingest

    for fn in (
        lambda p: sinks.has_parquet(p),
        lambda p: sinks.compact_target(spark, p),
        lambda p: ingest._read_watermark(spark, p),
        lambda p: ingest._write_watermark(spark, p, 123),
    ):
        for uri in ("s3://bucket/table", "gs://bucket/t", "hdfs://nn/t"):
            with pytest.raises(ValueError, match="POSIX-local"):
                fn(uri)
    # plain local paths keep working (absent dir is a normal False/None)
    assert sinks.has_parquet("/tmp/definitely-not-a-table-xyz") is False


def test_compact_crash_between_renames_recovers_by_documented_path(spark, tmp_path):
    """compact_target's crash window: after `rename(target, old)` and
    before `rename(tmp, target)` the target is missing but
    <target>.compact-old holds the complete original. The docstring's
    remediation — rename it back — must fully restore the table; pinned
    here by constructing that exact on-disk state."""
    path = str(tmp_path / "log")
    for i in range(4):
        sinks.append_log(
            spark.createDataFrame([(f"s{i}",)], "status string"), path
        )
    expect = sorted(r.status for r in spark.read.parquet(path).collect())

    # the between-renames crash state
    os.rename(path, path + ".compact-old")
    assert not os.path.exists(path)

    # documented recovery
    os.rename(path + ".compact-old", path)
    assert sorted(r.status for r in spark.read.parquet(path).collect()) == expect
    # and the next compaction attempt runs normally from the recovered state
    assert sinks.compact_target(spark, path, min_files_to_compact=2, target_files=1) >= 1
    assert sorted(r.status for r in spark.read.parquet(path).collect()) == expect
