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

Filesystem contract: the DataFrame reads/writes in this module go through
Spark and work on any Hadoop-FS scheme, but three pieces of machinery use
POSIX `os`/`shutil` primitives directly and are LOCAL-FILESYSTEM-ONLY:
`has_parquet` (os.walk listing), `compact_target` (the two-rename crash-
safe swap — object stores have no atomic rename), and streaming/ingest's
`_watermark` JSON side file (os.replace swap). Each of them guards its
path with `_require_local_path` and REFUSES a scheme-prefixed URI — a
silent wrong answer here is dangerous (`has_parquet` returning False for
an existing s3:// target would make the merge path treat it as a first
write and overwrite it). Porting route: the Hadoop FileSystem API
(`spark._jvm.org.apache.hadoop.fs` — rename() on HDFS, PUT-overwrite
semantics on object stores) or a table format with a commit protocol
(Delta/Iceberg), which replaces the rename swap and the side file
outright.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.operators.merge import merge_upsert

#: default fan-out of hash-bucketed upsert targets. At 100 TB you size this
#: so one bucket ≈ a few GB (thousands of buckets); locally 16 keeps file
#: counts sane while still proving partition-pruned I/O.
DEFAULT_UPSERT_BUCKETS = 16

BUCKET_COL = "__kb"


def key_bucket(keys: Sequence[str], n_buckets: int) -> Column:
    """Deterministic partition bucket for an upsert key: pmod(xxhash64(keys)).
    Any row with the same key lands in the same bucket forever — which is
    exactly what makes per-bucket merging equivalent to a global merge."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def _require_local_path(path: str, op: str) -> None:
    """Enforce the module's "Filesystem contract" (see module docstring):
    the rename/walk/side-file machinery is POSIX-local only, and a
    scheme-prefixed URI must fail loudly instead of silently misbehaving
    (e.g. `has_parquet` would report an existing s3:// target as absent,
    turning a merge into a first-write overwrite)."""
    if "://" in path:
        raise ValueError(
            f"{op}: path {path!r} has a URI scheme — this operator's "
            f"filesystem machinery is POSIX-local only (sinks.py "
            f"'Filesystem contract'); mount the store locally, or port "
            f"the call to the Hadoop FileSystem API / a table format "
            f"with a commit protocol"
        )


def has_parquet(path: str) -> bool:
    """True when ``path`` holds any parquet data file (flat or hive
    layout). Local filesystem only (module "Filesystem contract")."""
    _require_local_path(path, "has_parquet")
    if not os.path.isdir(path):
        return False
    for root, dirs, files in os.walk(path):
        # skip metadata dirs (_watermark/, _spark_metadata/, dot-dirs) but
        # NOT hive partition dirs — those are KEY=VALUE (e.g. __kb=3)
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def partitioned_upsert(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    merge: Callable[[DataFrame | None, DataFrame], DataFrame],
    keys: Sequence[str] | None = None,
    bucket_expr: Column | None = None,
    n_buckets: int = DEFAULT_UPSERT_BUCKETS,
    persist: bool = True,
    touched_vals: Sequence | None = None,
) -> None:
    """MERGE INTO for a parquet directory with TOUCHED-PARTITION-ONLY I/O —
    the scale-correct replacement for read-whole-table/rewrite-whole-table
    (the reference's in-place ``ON CONFLICT``, db.utils.ts:30-152, without
    O(|table|) cost per batch).

    1. stamp each batch row with its partition bucket — a hash of the merge
       key by default, or any deterministic ``bucket_expr`` (event-time day,
       window start, …) as long as a key can only ever live in one bucket;
    2. collect the batch's DISTINCT bucket values (metadata-sized, bounded
       by ``n_buckets`` — never the rows);
    3. read ONLY those partitions of the target (hive partition pruning);
    4. ``merge(existing_slice | None, batch)`` produces the revised rows;
    5. dynamic partition overwrite replaces ONLY the partitions present in
       the output. Untouched partitions are never read and their files are
       byte-identical afterwards (pinned by test).

    Per-batch cost scales with |batch| + |touched partitions|, not
    |target| — the difference between O(n) and O(n²/batch) over a stream's
    lifetime.

    ``touched_vals`` is the r13 one-stats-job fast path: a caller that
    already knows the batch's distinct bucket values (because it computed
    them in the same aggregation job as its other per-batch stats — see
    streaming/ingest.merge_batch_writer) passes them here, the batch then
    MUST already carry ``BUCKET_COL``, and this function runs no
    touched-bucket job of its own. An empty ``touched_vals`` (or an empty
    batch discovered by the collect) returns immediately: a zero-row
    dynamic overwrite writes no partition, so the merge/checkpoint/write
    jobs it would otherwise run are pure scheduler cost.
    """
    if touched_vals is not None:
        if BUCKET_COL not in batch.columns:
            raise ValueError(
                "partitioned_upsert: touched_vals given but batch lacks "
                f"{BUCKET_COL!r} — stamp the bucket column in the same "
                "pass that computed touched_vals"
            )
        touched_vals = list(touched_vals)
        if not touched_vals:
            return
    else:
        bucket = (
            bucket_expr if bucket_expr is not None else key_bucket(list(keys), n_buckets)
        )
        batch = batch.withColumn(BUCKET_COL, bucket)
    if persist:
        # the batch is consumed twice (touched-bucket collect + merge);
        # callers that already cache upstream pass persist=False — the
        # second pass then re-derives from THEIR cache instead of paying a
        # second materialization here
        batch = batch.persist()
    try:
        if touched_vals is None:
            touched_vals = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
            if not touched_vals:
                return
        existing = None
        if has_parquet(target_dir):
            existing = spark.read.parquet(target_dir).filter(
                F.col(BUCKET_COL).isin(touched_vals)
            )
        merged = merge(existing, batch)
        # bucket-align the write: without this every task writes a file per
        # bucket it holds (tasks × buckets small files); with it, one file
        # per touched bucket
        out = merged.repartition(max(len(touched_vals), 1), F.col(BUCKET_COL))
        if existing is not None:
            # materialize before the overwrite deletes the very files the
            # merge reads; a first write reads nothing from the target, so
            # it skips this extra pass
            out = out.localCheckpoint(eager=True)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(target_dir)
        )
    finally:
        if persist:
            batch.unpersist()


def compact_target(
    spark: SparkSession,
    target_dir: str,
    target_files: int = 1,
    min_files_to_compact: int = 8,
) -> int:
    """Small-file compaction (vacuum) for APPEND-mode parquet targets.

    The append sinks (`batched_append`, `append_log`, checkpoint/status
    logs) add files every call and never rewrite, so a long-lived stream
    accumulates files linearly in batch count — the classic small-files
    problem that murders scan listing + per-file open cost at scale. When
    the flat file count exceeds ``min_files_to_compact``, the whole
    target rewrites to ``target_files`` files (round-robin repartition —
    the count is honored exactly) and returns the file count removed;
    otherwise 0 and the target is untouched.

    The bucket-partitioned MERGE targets do NOT need this: their dynamic
    overwrite already replaces each touched bucket with a single file per
    merge (pinned by the byte-identical-untouched-buckets test). The
    reference never needs it either — Postgres heap pages self-compact
    via vacuum; any append-mode parquet stream does. Not concurrency-safe
    against in-flight appends — schedule between batches, like vacuum.

    Crash safety: the compacted copy is FULLY written to a temp sibling
    directory before the original is touched, then swapped in by two
    renames. The original files exist on disk until the swap, so a crash
    (or executor loss) at any point leaves either the untouched original
    or a complete replacement — never a half-written target. (An in-place
    overwrite would delete the only copy before commit; checkpointed
    blocks live in executor storage and do not survive the JVM.) If a
    crash lands between the two renames, ``<target>.compact-old`` holds
    the full original — rename it back to recover (recovery path pinned
    by test).

    Local filesystem only — the swap NEEDS atomic rename, which object
    stores don't have (module "Filesystem contract"; scheme-prefixed
    URIs are refused).
    """
    _require_local_path(target_dir, "compact_target")
    if not has_parquet(target_dir):
        return 0
    flat_files = [
        f for f in os.listdir(target_dir)
        if f.endswith(".parquet") and os.path.isfile(os.path.join(target_dir, f))
    ]
    if len(flat_files) <= min_files_to_compact:
        return 0
    tmp_dir = target_dir.rstrip("/") + ".compact-tmp"
    old_dir = target_dir.rstrip("/") + ".compact-old"
    shutil.rmtree(tmp_dir, ignore_errors=True)  # stale debris from a crash
    shutil.rmtree(old_dir, ignore_errors=True)
    existing = spark.read.parquet(target_dir)
    existing.repartition(max(target_files, 1)).write.mode("overwrite").parquet(tmp_dir)
    os.rename(target_dir, old_dir)
    os.rename(tmp_dir, target_dir)
    shutil.rmtree(old_dir)
    return len(flat_files)


def write_indexed(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """X1 — persist with index-like layout: hive partitions on the equality
    key(s), sorted row groups on the range key(s). ``sort_within`` accepts
    column names or Column expressions (computed sort keys).

    The local sort PREPENDS the partition columns: FileFormatWriter
    requires each task's rows ordered by the partition columns and
    injects its own NON-stable sort when the child ordering does not
    start with them — which would silently destroy ``sort_within``
    (observed: epoch-shuffle export came back in scan order). Leading
    with the partition columns satisfies the writer's requirement, so
    OUR ordering is the one on disk; within each hive directory the
    rows are still exactly ``sort_within``-ordered."""
    out = df
    if partition_by:
        out = out.repartition(*[F.col(c) for c in partition_by])
    if sort_within:
        keys = [F.col(c) for c in partition_by] + [
            F.col(c) if isinstance(c, str) else c for c in sort_within
        ]
        out = out.sortWithinPartitions(*keys)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_filtered_view(
    df: DataFrame,
    path: str,
    predicate: Column,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
) -> DataFrame:
    """X3 — the partial-index analog as a filtered MATERIALIZED VIEW: the
    reference's ``CREATE INDEX … ON messages(is_encrypted) WHERE
    is_encrypted = true`` (schema.ts:84) serves the rare-slice lookup
    without touching the dominant rows; on Spark the same contract is a
    materialized slice — filter once at write time, lay it out with the
    usual index layout (:func:`write_indexed`: hive partitions ≈ the
    indexed column, sorted row groups ≈ the composite key), and point the
    slice-readers at the view path. At 100 TB the filter runs as one
    embarrassingly parallel scan with the predicate pushed to parquet;
    refreshing is a full rewrite of the SLICE only (partial indexes are
    rebuilt by the DB on write — a table-format deployment would instead
    keep it fresh with an incremental MERGE).

    Returns the view DataFrame re-read from disk (what slice-readers see),
    NORMALIZED to the source frame's column order and types: a raw hive
    read-back would reorder partition columns last and re-infer their
    types (bigint → int), so a refresh could silently flip the view's
    schema. An empty slice is returned as an empty frame with that same
    schema — a partitioned parquet write of zero rows emits no
    schema-bearing part files, so the read-back would otherwise die with
    'Unable to infer schema' exactly when the rare-slice predicate
    matches nothing. Both branches therefore agree exactly, across
    refreshes, whatever the slice size.
    """
    sliced = df.filter(predicate)
    write_indexed(sliced, path, partition_by=partition_by, sort_within=sort_within)
    if not has_parquet(path):
        return sliced.limit(0)
    back = df.sparkSession.read.parquet(path)
    return back.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in sliced.schema.fields]
    )


def batched_append(df: DataFrame, path: str, rows_per_batch: int = 100) -> None:
    """K4 — bounded write batches. The reference chops multi-row inserts at
    100 rows/statement; here the analog is capping rows per output task so
    no single task/file becomes a straggler. Uses a cheap count to size the
    fan-out (at scale you'd size from input metrics instead). The input is
    persisted across the two actions — without it an expensive upstream
    plan executes twice (once for the sizing count, once for the write)."""
    df = df.persist()
    try:
        n = df.count()
        partitions = max(1, (n + rows_per_batch - 1) // rows_per_batch)
        df.repartition(partitions).write.mode("append").parquet(path)
    finally:
        df.unpersist()


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
    n_buckets: int = DEFAULT_UPSERT_BUCKETS,
) -> int:
    """K8 — `UPDATE … WHERE key = ?`, raising if no row matched
    (db.utils.ts:262-266 'No credentials found to update').

    Returns the number of rows actually changed (the reference's rowCount).
    When the target is hash-bucket partitioned (written via
    :func:`partitioned_upsert` / bucketed ``write_indexed``), only the
    buckets containing the update keys are read and rewritten — untouched
    partitions are never opened. A flat target falls back to full
    read-merge-rewrite (MERGE INTO on a real table format).
    """
    existing = spark.read.parquet(path)
    bucketed = BUCKET_COL in existing.columns
    if bucketed:
        updates = updates.withColumn(BUCKET_COL, key_bucket(list(keys), n_buckets))
        touched = [r[0] for r in updates.select(BUCKET_COL).distinct().collect()]
        existing = existing.filter(F.col(BUCKET_COL).isin(touched))
        updates = updates.drop(BUCKET_COL)
        # layout guard: the caller's n_buckets must match the layout the
        # table was WRITTEN with — a mismatch hashes update keys into the
        # wrong partitions and silently leaves the real rows stale. Two
        # complementary checks, both metadata-cheap:
        # (1) the hive partition directory names record the actual bucket
        #     domain — any stored bucket ≥ n_buckets proves the caller's
        #     modulus is too small (catches 8-vs-16, where a residue check
        #     is blind: pmod(h,8) == pmod(pmod(h,16),8) for buckets < 8);
        # (2) recomputing the bucket of the pruned rows catches a too-LARGE
        #     modulus (some slice row lands at b+16 under pmod 32).
        stored_buckets = [
            int(d.split("=", 1)[1])
            for root, dirs, _ in os.walk(path)
            for d in dirs
            if d.startswith(f"{BUCKET_COL}=")
        ]
        if stored_buckets and max(stored_buckets) >= n_buckets:
            raise ValueError(
                f"keyed_update: n_buckets={n_buckets} does not match the "
                f"bucket layout {path} was written with (stored bucket "
                f"{max(stored_buckets)} exists) — update keys would prune "
                f"to the wrong partitions and miss their rows"
            )
        bad = existing.filter(
            key_bucket(list(keys), n_buckets) != F.col(BUCKET_COL)
        ).limit(1).count()
        if bad:
            raise ValueError(
                f"keyed_update: n_buckets={n_buckets} does not match the "
                f"bucket layout {path} was written with — update keys would "
                f"prune to the wrong partitions and miss their rows"
            )
    matched = existing.join(updates.select(*keys), on=list(keys), how="left_semi").count()
    if matched == 0:
        raise ValueError(
            f"keyed_update: no rows matched keys in {path}"
            + (" (or n_buckets disagrees with the table's bucket layout)"
               if bucketed else "")
        )
    # align incoming to the full schema: unmatched columns keep existing vals
    merged = merge_upsert(
        existing,
        updates.join(existing.drop(*[c for c in updates.columns if c not in keys]),
                     on=list(keys), how="inner").select(*existing.columns),
        keys=keys,
        action_col="action",
    )
    changed = merged.filter(F.col("action") == "update").count()
    out = merged.drop("action").localCheckpoint(eager=True)
    if bucketed:
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
    else:
        out.write.mode("overwrite").parquet(path)
    return changed
