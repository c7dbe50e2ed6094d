"""Continuous PASSAGE screening — the streaming form of the persisted
passage-attribution index (r12; the text twin of
`streaming/containment.py`).

Per micro-batch of (doc_id, text) documents: fingerprint each passage
once (hop 1, the index's frozen k), vote against the stored corpus
windows (`ext/passage_index.py` — no corpus text in any plan), write
the attributions as a staged audit, and — ``append_novel=True`` — add
the batch's UNATTRIBUTED docs' windows to the index (staged), so later
passages cut from them are attributed. The decontamination-pipeline
shape: screen incoming training documents against an eval-set index
(hits = contamination, with the source named), or grow a lake index
batch by batch.

Exactly-once: hits and index appends stage by batch id (dynamic
partition overwrite) and the probe excludes THIS batch's partition —
a replayed batch re-derives identical votes (everything is
deterministic column algebra) and overwrites its own rows. Binding and
layout gates are the curation streams'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from beeper_matric_etl_tool_spark.ext.passage_index import (
    append_passage_index_windows,
    attribute_windows_against_index,
    read_meta,
)
from beeper_matric_etl_tool_spark.ext.text import token_window_fingerprints
from beeper_matric_etl_tool_spark.streaming.curation import (
    _guard_checkpoint_binding,
    _guard_output_layout,
)


def attribution_batch_writer(
    index_path: str,
    hits_dir: str,
    min_matches: int = 2,
    append_novel: bool = False,
    read_only: bool = False,
):
    """foreachBatch writer screening each micro-batch against the
    passage index. Hits land in ``hits_dir`` as (probe_id, <id_col>,
    offset, n_matched) staged by ``ingest_batch``. Fails at
    CONSTRUCTION on a non-index path or a flat-layout hits directory.
    ``append_novel=True`` appends docs with NO attribution to the index
    (staged — replay-safe vote counts); attributed docs are not
    appended (the audit carries their lineage).

    ``read_only=True`` (r13) is the pure-probe mode — the
    decontamination deployment (screen N ingest feeds against ONE
    frozen eval-set index): ``append_novel`` is rejected at
    construction, and the probe does NOT exclude this stream's batch id
    (batch ids are checkpoint-scoped — excluding batch N here would
    hide an unrelated writer stream's partition N from the screen).
    Hits stay exactly-once to this stream's own ``hits_dir``; with a
    frozen index replays are fully deterministic."""
    meta = read_meta(index_path)
    _guard_output_layout(hits_dir, "ingest_batch", "attribution_batch_writer")
    if read_only and append_novel:
        raise ValueError(
            "attribution_batch_writer: read_only=True cannot "
            "append_novel — a read-only screen never writes the index"
        )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # stream lineage cut
        # ONE tokenize per doc for the whole micro-batch (r13 — the
        # containment screen's one-decode discipline on the text plane):
        # this hop-1 window frame feeds the probe AND, for novel docs,
        # the index append (thinned to the index's corpus_hop there)
        pw = token_window_fingerprints(
            batch_df,
            meta["k"],
            1,
            meta["id_col"],
            meta["text_col"],
            "probe_id",
            normalize=meta.get("normalize", True),
        ).localCheckpoint(eager=True)
        hits = attribute_windows_against_index(
            pw,
            spark,
            index_path,
            min_matches=min_matches,
            # replay safety: probe with THIS batch's partition hidden —
            # unless read-only, where this stream owns no partition and
            # batch N may belong to a different (writer) stream
            exclude_batch=None if read_only else int(batch_id),
        ).localCheckpoint(eager=True)
        # all-novel batches write no hit partition (an empty dynamic
        # overwrite would leave an unreadable footerless directory)
        if hits.count():
            (
                hits.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(hits_dir)
            )
        if append_novel:
            novel = pw.join(
                hits.select("probe_id").distinct(),
                on="probe_id",
                how="left_anti",
            )
            append_passage_index_windows(
                novel.select(
                    F.col("probe_id").alias("doc_id"),
                    F.col("probe_id_p").alias("pos"),
                    F.col("__fp").alias("fp"),
                ),
                index_path,
                batch_id=int(batch_id),
            )

    return write


def start_attribution_stream(
    docs_stream: DataFrame,
    index_path: str,
    hits_dir: str,
    checkpoint_dir: str,
    trigger_interval: str | None = None,
    **writer_kwargs,
):
    """Wire a streaming document frame ((id, text) from any source)
    through :func:`attribution_batch_writer`. Returns the
    StreamingQuery. Replay and binding semantics are the curation
    streams': a fresh checkpoint against an already-staged index fails
    at the `_STREAM.json` binding gate.

    ``read_only=True`` binds the CHECKPOINT to this stream's
    ``hits_dir`` instead of to the index — the index takes no
    `_STREAM.json`, so ANY number of read-only screens (and one writer
    stream) can share it concurrently; what still needs protection from
    checkpoint-scoped batch-id collisions is each screen's own staged
    hits directory."""
    batch_writer = attribution_batch_writer(
        index_path, hits_dir, **writer_kwargs
    )
    if writer_kwargs.get("read_only"):
        _guard_checkpoint_binding(hits_dir, checkpoint_dir)
    else:
        _guard_checkpoint_binding(index_path, checkpoint_dir)
    writer = docs_stream.writeStream.foreachBatch(batch_writer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
