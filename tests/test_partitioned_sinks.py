"""The scale contract of the merge sinks: a micro-batch may only do I/O
proportional to ITS keys, never to the target table. Pinned physically —
after a merge touching one bucket, every file in every other bucket must be
byte-identical (same paths, same bytes), proving untouched partitions were
neither read-rewritten nor reshuffled.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark import sinks
from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key


def _file_digests(root: str) -> dict[str, str]:
    out = {}
    for dirpath, dirs, files in os.walk(root):
        # keep hive partition dirs (KEY=VALUE), skip metadata dirs
        dirs[:] = [d for d in dirs if "=" in d or not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def _lww_merge(keys):
    def merge(existing, batch):
        allrows = batch if existing is None else existing.unionByName(batch)
        return latest_by_key(allrows, keys=keys, order_by=[F.col("seq").desc()])

    return merge


def test_partitioned_upsert_leaves_untouched_buckets_byte_identical(spark, tmp_path):
    target = str(tmp_path / "tgt")
    seed = spark.range(0, 200).select(
        F.col("id").alias("k"), F.lit(1).alias("seq"), F.lit("v1").alias("payload")
    )
    sinks.partitioned_upsert(spark, target, seed, _lww_merge(["k"]), keys=["k"], n_buckets=8)
    before = _file_digests(target)
    assert len({p.split(os.sep)[0] for p in before}) == 8  # all 8 buckets exist

    # one-key batch → exactly one bucket may change
    batch = spark.createDataFrame([(5, 2, "v2")], "k long, seq int, payload string")
    sinks.partitioned_upsert(spark, target, batch, _lww_merge(["k"]), keys=["k"], n_buckets=8)
    after = _file_digests(target)

    bucket_val = (
        spark.createDataFrame([(5,)], "k long").select(sinks.key_bucket(["k"], 8)).first()[0]
    )
    touched_dir = f"{sinks.BUCKET_COL}={bucket_val}"

    untouched_before = {p: h for p, h in before.items() if not p.startswith(touched_dir)}
    untouched_after = {p: h for p, h in after.items() if not p.startswith(touched_dir)}
    assert untouched_before == untouched_after  # same files, same bytes
    assert {p: h for p, h in before.items() if p.startswith(touched_dir)} != {
        p: h for p, h in after.items() if p.startswith(touched_dir)
    }

    # and the merge is still a correct global last-write-wins
    rows = {r.k: (r.seq, r.payload) for r in spark.read.parquet(target).collect()}
    assert len(rows) == 200
    assert rows[5] == (2, "v2")
    assert rows[6] == (1, "v1")


def test_keyed_update_prunes_buckets_on_partitioned_target(spark, tmp_path):
    target = str(tmp_path / "creds")
    seed = spark.range(0, 100).select(
        F.col("id").alias("user_id"), F.lit(10.0).alias("balance")
    )
    sinks.partitioned_upsert(
        spark, target, seed, lambda ex, b: b if ex is None else ex.unionByName(b),
        keys=["user_id"], n_buckets=8,
    )
    before = _file_digests(target)

    updates = spark.createDataFrame([(7, 99.0)], "user_id long, balance double")
    changed = sinks.keyed_update(spark, target, updates, keys=["user_id"], n_buckets=8)
    assert changed == 1

    after = _file_digests(target)
    bucket_val = (
        spark.createDataFrame([(7,)], "user_id long")
        .select(sinks.key_bucket(["user_id"], 8))
        .first()[0]
    )
    touched_dir = f"{sinks.BUCKET_COL}={bucket_val}"
    assert {p: h for p, h in before.items() if not p.startswith(touched_dir)} == {
        p: h for p, h in after.items() if not p.startswith(touched_dir)
    }
    rows = {r.user_id: r.balance for r in spark.read.parquet(target).collect()}
    assert rows[7] == 99.0 and rows[8] == 10.0 and len(rows) == 100


def test_keyed_update_raises_on_zero_match(spark, tmp_path):
    import pytest

    target = str(tmp_path / "creds2")
    seed = spark.range(0, 10).select(F.col("id").alias("user_id"), F.lit(1.0).alias("b"))
    sinks.partitioned_upsert(
        spark, target, seed, lambda ex, b: b if ex is None else ex.unionByName(b),
        keys=["user_id"], n_buckets=4,
    )
    missing = spark.createDataFrame([(555, 2.0)], "user_id long, b double")
    with pytest.raises(ValueError, match="no rows matched"):
        sinks.keyed_update(spark, target, missing, keys=["user_id"], n_buckets=4)


def test_write_filtered_view_materializes_slice_with_index_layout(spark, tmp_path):
    """X3 partial-index analog: the filtered view holds ONLY the predicate
    slice, laid out with hive partitions + sorted row groups, and a
    slice-reader's scan never touches the dominant rows."""
    events = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7 == 0).alias("is_encrypted"),
        (F.col("id") % 4).alias("room_id"),
        (F.lit(1000) - F.col("id")).alias("ts"),
    )
    path = str(tmp_path / "encrypted_view")
    view = sinks.write_filtered_view(
        events,
        path,
        predicate=F.col("is_encrypted"),
        partition_by=["room_id"],
        sort_within=["ts"],
    )
    # slice only, bit-exact membership
    assert view.count() == events.filter("is_encrypted").count()
    assert view.filter(~F.col("is_encrypted")).count() == 0
    got = sorted(r["event_id"] for r in view.collect())
    want = sorted(r["event_id"] for r in events.filter("is_encrypted").collect())
    assert got == want
    # index layout: hive partition dirs on the equality key
    assert any(d.startswith("room_id=") for d in os.listdir(path))
    # a per-partition read prunes to that partition's files only
    pruned = spark.read.parquet(path).filter(F.col("room_id") == 2)
    files = pruned.select(F.input_file_name()).distinct().collect()
    assert all("room_id=2" in r[0] for r in files)


def test_write_filtered_view_empty_slice_returns_empty_frame(spark, tmp_path):
    """A predicate matching nothing must yield an empty schema-correct view,
    not an 'Unable to infer schema' crash from the schema-less partitioned
    write."""
    events = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit(False).alias("is_encrypted"),
        (F.col("id") % 2).alias("room_id"),
    )
    view = sinks.write_filtered_view(
        events,
        str(tmp_path / "empty_view"),
        predicate=F.col("is_encrypted"),
        partition_by=["room_id"],
    )
    assert view.count() == 0
    assert set(view.columns) == {"event_id", "is_encrypted", "room_id"}
