"""Continuous CONTAINMENT screening — the streaming form of the
persisted containment index (SURVEY §2.12 multimodal tier, r12; the
lake-shaped version of "is this new clip cut from anything we hold").

Per micro-batch of (doc_id, payload) media: decode each payload EXACTLY
ONCE into its unit signatures (the index's frozen unit rule), vote them
against the persisted track units (`ext/containment_index.py` — no
track payload in any plan), write the hits as a staged audit, and —
``append_novel=True`` — append the batch's NOVEL docs (no containment
hit) to the index off the SAME unit frames (zero extra decodes), so the
next batch is screened against them. Composition of the driver-oracled
batch core (`frame_signature_containment`) with staged parquet writes —
no new semantics, which is what keeps streaming and batch verdicts
identical.

Exactly-once: hits and index appends are staged by batch id (dynamic
partition overwrite of their own partition) and the probe excludes THIS
batch's partition, so a replayed batch sees the state its first attempt
saw, re-derives identical votes, and overwrites its own rows. The
(index, checkpoint) binding gate is shared with the curation streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from beeper_matric_etl_tool_spark.ext.containment_index import (
    _unit_signatures,
    append_containment_index_signatures,
    containment_signatures_against_index,
    read_meta,
)
from beeper_matric_etl_tool_spark.streaming.curation import (
    _guard_checkpoint_binding,
    _guard_output_layout,
)


def containment_probe_batch_writer(
    index_path: str,
    hits_dir: str,
    min_matches: int = 3,
    max_hamming: int | None = None,
    bands: int | None = None,
    append_novel: bool = False,
    read_only: bool = False,
):
    """foreachBatch writer screening each micro-batch against the
    containment index. Hits land in ``hits_dir`` as (clip_id, track_id,
    offset, n_matched, max_unit_hamming) staged by ``ingest_batch`` —
    the audit a takedown / provenance pipeline consumes. Fails at
    CONSTRUCTION on a non-index path or a flat-layout hits directory.

    ``append_novel=True`` turns the screen into the lake's growth path:
    docs with NO hit append their unit signatures to the index (staged,
    decode-free — the same frames the probe just used), so re-cut
    content arriving later is attributed to them. Docs that DID hit are
    not appended (the lake keeps one copy of the source material's
    units; the hit audit carries the lineage).

    ``read_only=True`` (r13) is the pure-probe mode — the natural
    decontamination deployment: the stream NEVER writes the index, so
    (1) ``append_novel`` is rejected at construction, and (2) the probe
    does NOT exclude this stream's batch id — batch ids are
    checkpoint-scoped, so excluding batch N here would hide an
    UNRELATED writer stream's partition N from the screen. Hits stay
    exactly-once to this stream's own ``hits_dir`` (staged overwrite);
    with a frozen index replays are fully deterministic, and against an
    index under concurrent growth a replayed batch screens against the
    index as of the replay — strictly more hits, same offsets."""
    meta = read_meta(index_path)
    _guard_output_layout(hits_dir, "ingest_batch", "containment_probe_batch_writer")
    if read_only and append_novel:
        raise ValueError(
            "containment_probe_batch_writer: read_only=True cannot "
            "append_novel — a read-only screen never writes the index"
        )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # stream lineage cut
        # ONE decode per payload for the whole micro-batch: these unit
        # frames feed the probe AND (for novel docs) the index append
        unit_sigs = _unit_signatures(batch_df, meta).localCheckpoint(eager=True)
        hits = containment_signatures_against_index(
            unit_sigs,
            spark,
            index_path,
            min_matches=min_matches,
            max_hamming=max_hamming,
            bands=bands,
            # replay safety: probe with THIS batch's partition hidden —
            # unless read-only, where this stream owns no partition and
            # batch N may belong to a different (writer) stream
            exclude_batch=None if read_only else int(batch_id),
        ).localCheckpoint(eager=True)
        # an all-novel batch writes no hit partition (an empty dynamic
        # overwrite would leave an unreadable footerless directory);
        # replays are safe either way — the same batch re-derives the
        # same (possibly empty) hit set deterministically
        if hits.count():
            (
                hits.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(hits_dir)
            )
        if append_novel:
            novel = unit_sigs.join(
                hits.select(F.col("clip_id").alias("doc_id")).distinct(),
                on="doc_id",
                how="left_anti",
            )
            append_containment_index_signatures(
                novel, index_path, batch_id=int(batch_id)
            )

    return write


def start_containment_probe_stream(
    media_stream: DataFrame,
    index_path: str,
    hits_dir: str,
    checkpoint_dir: str,
    trigger_interval: str | None = None,
    **writer_kwargs,
):
    """Wire a streaming media frame ((doc_id, payload binary) from any
    source) through :func:`containment_probe_batch_writer`. Returns the
    StreamingQuery. Replay and binding semantics are the curation
    streams': a fresh checkpoint against an already-staged index fails
    at the `_STREAM.json` binding gate.

    ``read_only=True`` binds the CHECKPOINT to this stream's
    ``hits_dir`` instead of to the index — the index takes no
    `_STREAM.json`, so ANY number of read-only screens (and one writer
    stream) can share it concurrently; what still needs protection from
    checkpoint-scoped batch-id collisions is each screen's own staged
    hits directory."""
    batch_writer = containment_probe_batch_writer(
        index_path, hits_dir, **writer_kwargs
    )
    if writer_kwargs.get("read_only"):
        _guard_checkpoint_binding(hits_dir, checkpoint_dir)
    else:
        _guard_checkpoint_binding(index_path, checkpoint_dir)
    writer = media_stream.writeStream.foreachBatch(batch_writer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
