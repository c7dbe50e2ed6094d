"""Write-side operators — the load half of ETL (SURVEY §2.2 K4–K8, §2.11 X1).

The reference's physical write path: 100-row batched multi-VALUES inserts
(db.utils.ts:154-202), append-only logs (db.utils.ts:204-238), a keyed
UPDATE that errors when 0 rows match (db.utils.ts:240-269), and b-tree
indexes serving the read paths (schema.ts:80-88).

Spark-first equivalents:
- batching is partition granularity: `df.write` already writes one file per
  partition in parallel; `batched_append` just controls the fan-out.
- indexes become *layout*: `partitionBy` (partition pruning ≈ index seek on
  the leading column) + `sortWithinPartitions` (row-group min/max skipping ≈
  the composite second column). X1's `(room_id, timestamp)` index maps to
  partition-by-room + sort-by-timestamp — the layout `messages_topk_page`
  wants at 100 TB.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.operators.merge import merge_upsert


def write_indexed(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """X1 — persist with index-like layout: hive partitions on the equality
    key(s), sorted row groups on the range key(s)."""
    out = df
    if partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    if sort_within:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_within])
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def batched_append(df: DataFrame, path: str, rows_per_batch: int = 100) -> None:
    """K4 — bounded write batches. The reference chops multi-row inserts at
    100 rows/statement; here the analog is capping rows per output task so
    no single task/file becomes a straggler. Uses a cheap count to size the
    fan-out (at scale you'd size from input metrics instead)."""
    n = df.count()
    partitions = max(1, (n + rows_per_batch - 1) // rows_per_batch)
    df.repartition(partitions).write.mode("append").parquet(path)


def append_log(df: DataFrame, path: str) -> None:
    """K5/K6/K7 — append-only status/credential/checkpoint-audit logs."""
    df.withColumn("created_at", F.current_timestamp()).write.mode("append").parquet(path)


def write_bucketed(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] = (),
) -> None:
    """X1/X2 at join scale — bucketing: pre-shuffle the table ONCE at write
    time on the join key. Two tables bucketed the same way equi-join with
    NO exchange at read time (SortMergeJoin over co-located buckets) — the
    100 TB answer to 'this join shuffles every run'. Requires a saved table
    (bucket metadata lives in the catalog, not the parquet files)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def upsert_config(
    spark: SparkSession,
    path: str,
    settings: dict[str, object],
) -> DataFrame:
    """K9 — the dynamic-column config upsert (routes.ts:268-271, intent per
    SURVEY §8 B5: the reference's literal SQL parameterizes identifiers and
    can never run). Config is a single-row wide table whose columns ARE the
    setting keys; an upsert merges new keys into the schema (schema
    evolution) and overwrites changed values."""
    incoming = spark.createDataFrame([tuple(settings.values())], list(settings.keys()))
    if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
        existing = spark.read.parquet(path)
        merged_row = {}
        old = existing.first()
        if old is not None:
            merged_row.update(old.asDict())
        merged_row.update(settings)
        incoming = spark.createDataFrame([tuple(merged_row.values())], list(merged_row.keys()))
    incoming.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def keyed_update(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
) -> int:
    """K8 — `UPDATE … WHERE key = ?`, raising if no row matched
    (db.utils.ts:262-266 'No credentials found to update').

    Returns the number of rows actually changed (the reference's rowCount).
    Read-merge-rewrite at test scale; MERGE INTO on a real table format.
    """
    existing = spark.read.parquet(path)
    matched = existing.join(updates.select(*keys), on=list(keys), how="left_semi").count()
    if matched == 0:
        raise ValueError(f"keyed_update: no rows matched keys in {path}")
    # align incoming to the full schema: unmatched columns keep existing vals
    merged = merge_upsert(
        existing,
        updates.join(existing.drop(*[c for c in updates.columns if c not in keys]),
                     on=list(keys), how="inner").select(*existing.columns),
        keys=keys,
        action_col="action",
    )
    changed = merged.filter(F.col("action") == "update").count()
    merged.drop("action").localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    return changed
