"""Continuous corpus curation — the streaming form of the `curate()`
funnel (SURVEY §2.12 composed-pipeline tier).

The steady-state 100 TB ingest shape: documents arrive continuously; each
micro-batch runs the SAME driver-oracled batch kernels — C4-style text
normalization (curate()'s default stage 0, so byte-variant copies hash
together across batches exactly as they do in batch mode) → quality gate →
PII scrub → within-batch exact + MinHash near-dup → incremental dedup
against the persisted index of everything already kept
(`ext/dedup_index.py`, no reference-text rescan) — and the survivors are
(a) appended to the curated corpus and (b) appended to the dedup index,
so the NEXT batch deduplicates against them. Composition, not new
semantics: the batch half is `ext/pipeline.py:curate(reference_index=…)`
verbatim, which is what keeps streaming and batch decisions bit-identical
(the property the curate() determinism contract promises).

Exactly-once note: all three writes per micro-batch — corpus, index,
audit — are STAGED by batch id: each is a dynamic partition overwrite of
its own ``ingest_batch``/``batch_id`` hive partition, and the funnel
probes the index with that batch EXCLUDED
(`curate(reference_exclude_batch=batch_id)` →
`dedup_against_index(exclude_batch=…)`), so a replayed batch sees exactly
the index state its first attempt saw. Replay therefore re-derives
bit-identical survivors (curate()'s determinism contract) and overwrites
its own partitions with identical rows — corpus, index, and audit row
counts are unchanged however many times Spark re-runs the batch (pinned
in tests). A crash BETWEEN the three writes still leaves a transient
mixed state, but the replay repairs it instead of compounding it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.dedup_index import (
    append_dedup_index,
    read_meta,
)
from beeper_matric_etl_tool_spark.ext.pipeline import curate


def _guard_output_layout(path: str, partition_col: str, caller: str) -> None:
    """Reject an output directory populated by the pre-staging FLAT-append
    writer: the exactly-once design dynamic-overwrites ``partition_col=<id>``
    hive partitions, and pointing it at a directory of flat part-files
    would MIX the two layouts — readers would see every flat row twice
    conceptually (once outside any partition, once staged) and compaction
    tooling would mis-walk it. A fresh/missing directory and a directory
    of matching hive partitions both pass; anything else fails loudly at
    writer construction, mirroring the index's `read_meta` layout gate
    (upgrading from the flat layout means re-staging, exactly like the
    index rebuild requirement)."""
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, caller)
    if not os.path.isdir(path):
        return
    for name in os.listdir(path):
        if name.startswith(("_", ".")):
            continue  # markers (_SUCCESS), checksums — layout-neutral
        full = os.path.join(path, name)
        if os.path.isdir(full) and name.startswith(f"{partition_col}="):
            continue
        raise ValueError(
            f"{caller}: {path!r} contains {name!r}, which is not a "
            f"{partition_col}=<id> hive partition — the directory was "
            f"written by a flat-append layout (or is not a curation "
            f"output at all). The staged exactly-once writer would mix "
            f"layouts and corrupt reads; point it at a fresh directory "
            f"(re-staging the corpus, mirroring the index rebuild rule)"
        )


def curation_batch_writer(
    index_path: str,
    out_dir: str,
    audit_dir: str | None = None,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    **curate_kwargs,
):
    """foreachBatch writer running the batch funnel per micro-batch.
    Survivor frames are localCheckpoint-ed once so the three consumers
    (corpus append, index append, audit count) share one execution of
    the funnel instead of three. Empty batches are a no-op (no empty
    parquet files, no zero-row audit spam). Extra ``curate_kwargs``
    (span_k, max_nll_ppm, …) pass through to the funnel."""

    # fail fast at WRITER CONSTRUCTION: the index derives its frames from
    # the column names frozen in its own _META.json, so a writer/index
    # column mismatch would otherwise surface only as a mid-stream
    # analysis error inside foreachBatch — after a corpus append already
    # ran. (read_meta also raises here when index_path is not an index.)
    meta = read_meta(index_path)
    # same construction-time discipline for the corpus/audit directories:
    # the staged writer must never target a flat-append-layout directory
    _guard_output_layout(out_dir, "ingest_batch", "curation_batch_writer")
    if audit_dir is not None:
        _guard_output_layout(audit_dir, "batch_id", "curation_batch_writer")
    if (meta["id_col"], meta["text_col"]) != (id_col, text_col):
        raise ValueError(
            f"curation_batch_writer: id_col/text_col "
            f"({id_col!r}, {text_col!r}) do not match the dedup index's "
            f"frozen config ({meta['id_col']!r}, {meta['text_col']!r}) at "
            f"{index_path!r} — the index derives append frames from its "
            f"own meta, so a mismatch would break mid-stream after the "
            f"corpus append; rebuild the index or match its columns"
        )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stages = curate(
            batch_df,
            persist_intermediates=False,
            # r14: per-stage lineage cuts — the funnel's COMPOSITION
            # (eager Catalyst analysis of re-embedded stage subtrees) is
            # a fixed driver cost paid per MICRO-BATCH here; the cuts
            # remove it. The fault-tolerance trade is mild in a stream:
            # a lost executor fails the batch and the engine retries the
            # whole micro-batch from the checkpoint (foreachBatch's
            # normal failure unit), unlike a long batch pipeline where
            # the default's recompute-from-lineage matters.
            checkpoint_stages=True,
            reference_index=index_path,
            # replay safety: probe the index with THIS batch's partition
            # hidden, so a re-run after a partial commit re-derives the
            # first attempt's decisions (module docstring)
            reference_exclude_batch=int(batch_id),
            minhash_threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            lang_col=lang_col,
            **curate_kwargs,
        )
        survivors = stages["incremental"].localCheckpoint(eager=True)
        n_in = batch_df.count()
        n_kept = survivors.count()
        out_cols = [id_col, text_col] + ([lang_col] if lang_col else [])
        if n_kept:
            # staged corpus write: dynamic overwrite of this batch's own
            # hive partition — a replay replaces, never duplicates
            (
                survivors.select(*out_cols)
                .withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(out_dir)
            )
            append_dedup_index(
                survivors.select(id_col, text_col),
                index_path,
                batch_id=int(batch_id),
            )
        if audit_dir is not None:
            spark = batch_df.sparkSession
            (
                spark.createDataFrame(
                    [(int(batch_id), int(n_in), int(n_kept))],
                    "batch_id long, n_in long, n_kept long",
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(audit_dir)
            )

    return write


def _guard_checkpoint_binding(index_path: str, checkpoint_dir: str) -> None:
    """Pin the (index, checkpoint) binding in a `_STREAM.json` side-file
    next to the index's `_META.json`. Batch ids are CHECKPOINT-scoped:
    a fresh checkpoint restarts them at 0, so pointing a new checkpoint
    at an already-staged index/corpus would dynamic-OVERWRITE the old
    stream's batch-0, batch-1, … partitions — silent data loss, where
    the old append mode merely duplicated. Fail fast instead; an
    operator who genuinely wants a fresh stream over the same index
    deletes the side-file (and accepts that the new stream's batch ids
    will shadow the old partitions) or compacts first."""
    import json as _json

    marker = os.path.join(index_path, "_STREAM.json")
    ckpt = os.path.abspath(checkpoint_dir)
    if os.path.exists(marker):
        with open(marker) as fh:
            bound = _json.load(fh).get("checkpoint_dir")
        if bound != ckpt:
            raise ValueError(
                f"start_curation_stream: index {index_path!r} is bound to "
                f"checkpoint {bound!r} but this stream uses {ckpt!r} — "
                f"batch ids are checkpoint-scoped, so a fresh checkpoint "
                f"would dynamic-overwrite the prior stream's staged "
                f"partitions (batch 0, 1, …) in the index, corpus and "
                f"audit. Resume with the original checkpoint, rebuild the "
                f"index, or delete {marker!r} after compacting if you "
                f"really mean to start over"
            )
    else:
        # the bound dir may not exist yet (a read-only screen binds its
        # hits_dir before the first batch creates it)
        os.makedirs(index_path, exist_ok=True)
        with open(marker, "w") as fh:
            _json.dump({"checkpoint_dir": ckpt}, fh)


def start_curation_stream(
    docs_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    audit_dir: str | None = None,
    trigger_interval: str | None = None,
    **writer_kwargs,
):
    """Wire a streaming documents frame (any source shape carrying
    (doc_id, lang, text) — file dir, rate-derived, Kafka-parsed) through
    :func:`curation_batch_writer`. Returns the StreamingQuery; the
    checkpoint makes the stream resumable at micro-batch granularity.
    A re-delivered batch re-runs the funnel with its OWN index partition
    excluded (the module docstring's exactly-once design), re-derives
    its first attempt's survivors bit-identically, and overwrites its
    own staged partitions — replay replaces rather than duplicates.
    The (index, checkpoint) binding is pinned by a `_STREAM.json`
    side-file so a fresh checkpoint cannot silently overwrite a prior
    stream's staged partitions (batch ids restart at 0 per
    checkpoint)."""
    # construct the writer FIRST: its read_meta/layout gates validate the
    # index and output directories, so the binding marker below is only
    # ever written into a directory that really is an index — pointing a
    # stream at a wrong path fails loudly here without stranding a stale
    # _STREAM.json that would block a later legitimate stream
    batch_writer = curation_batch_writer(
        index_path, out_dir, audit_dir, **writer_kwargs
    )
    _guard_checkpoint_binding(index_path, checkpoint_dir)
    writer = docs_stream.writeStream.foreachBatch(batch_writer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
