"""Continuous MEDIA curation — the streaming form of `curate_media`
composed with the persisted media-signature index (SURVEY §2.12
multimodal tier; the media twin of streaming/curation.py).

The steady-state media-lake ingest shape: payloads arrive continuously;
each micro-batch runs the SAME driver-oracled batch kernels —
`curate_media` (magic dispatch → one decode per payload → floor gates →
within-batch per-modality near-dup, every row decided) — then probes the
batch's keeps against the persisted signature index of everything
already kept (`ext/media_index.py`, no reference media decode), and the
survivors are (a) appended to the curated media corpus and (b) appended
to the index, so the NEXT batch deduplicates against them. Composition,
not new semantics: both halves are the batch operators verbatim, which
is what keeps streaming and batch decisions identical.

Exactly-once: the three writes per micro-batch — corpus, index, audit —
are STAGED by batch id (dynamic partition overwrite of their own
``ingest_batch``/``batch_id`` hive partition), and the index probe runs
with THIS batch's partition excluded, so a replayed batch sees exactly
the state its first attempt saw, re-derives identical decisions (every
kernel in the chain is deterministic), and overwrites its own partitions
with identical rows. The (index, checkpoint) binding marker and the
output-layout gates are shared with the text stream
(`streaming/curation.py`) — batch ids are checkpoint-scoped there for
the same reason they are here.

Decode economics per micro-batch: EXACTLY ONE decode per payload. The
funnel (`curate_media_with_signatures`) decodes each payload once into
per-leg signature checkpoints and returns the frames; the index probe
(`media_dedup_signatures_against_index`) and the index append
(`append_media_index_signatures`) both run at the SIGNATURE level off
those same frames — no payload is ever re-decoded, spy-pinned in tests
(decode is the media lake's dominant cost by this repo's own design doc;
the corpus is only ever touched through its persisted signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from beeper_matric_etl_tool_spark.ext.media_index import (
    append_media_index_signatures,
    media_dedup_signatures_against_index,
    read_meta,
)
from beeper_matric_etl_tool_spark.ext.multimodal import (
    curate_media_with_signatures,
    default_media_hamming,
)
from beeper_matric_etl_tool_spark.streaming.curation import (
    _guard_checkpoint_binding,
    _guard_output_layout,
)


def media_curation_batch_writer(
    index_path: str,
    out_dir: str,
    audit_dir: str | None = None,
    decisions_dir: str | None = None,
    max_hamming: int | None = None,
    bands: int | None = None,
    id_col: str = "doc_id",
    cross_modal: bool = False,
    **curate_kwargs,
):
    """foreachBatch writer running the media funnel per micro-batch.
    Extra ``curate_kwargs`` (min_width, min_audio_frames, …) pass through
    to `curate_media_with_signatures`. Fails at CONSTRUCTION on a
    non-index path, an
    id-column mismatch with the index's frozen meta, or a flat-layout
    output directory (the text writer's discipline). ``max_hamming=None``
    resolves via `multimodal.default_media_hamming` at the INDEX's frozen
    width — the threshold scales with the signature width — and
    ``bands=None`` via the index's stored ``bands_hint`` (the
    corpus-sized build rule), so an estimate-sized index drives the
    funnel's banding too.

    ``cross_modal=True`` runs the RE-ENCODED-STILL gate at both scopes:
    within the batch (the funnel's stage 4b — videos whose sampled
    frames match a floor-surviving batch image) AND against the lake
    (surviving videos' fused frame hashes probed into the index's IMAGE
    signature plane, still zero extra decodes — the frames ride the
    funnel's signature relation). Both drop as ``drop:near_dup_cross``;
    the index-scope drop carries the matched image as its witness.

    ``decisions_dir`` (optional) persists the PER-DOC audit trail —
    every input doc's funnel decision, with index drops overriding their
    keep to ``drop:near_dup_index`` (same-modality) or
    ``drop:near_dup_cross`` (frame-vs-image) and carrying the witness
    (ref_id, hamming); the vocabulary across streamed batches is
    `multimodal.MEDIA_STREAM_DECISIONS` (the batch funnel's tuple plus
    the index-drop decision) — staged by ``ingest_batch`` like the
    corpus, so replays replace their own rows. This is the curate_media
    audit discipline carried through the stream: nothing ingested is
    ever silently dropped, and the lineage (cluster ids, witnesses)
    survives for a downstream mixer or a compliance query.
    MIGRATION NOTE: decisions partitions written before the error_class
    (r10) or n_bytes (r12) columns existed lack them — reading a
    directory that spans an upgrade needs
    ``spark.read.option("mergeSchema", "true")`` (otherwise parquet's
    sampled-file schema makes the column's presence depend on which
    partition gets sampled)."""
    meta = read_meta(index_path)
    for frozen in ("sig_bits", "image_method"):
        if frozen in curate_kwargs:
            raise ValueError(
                f"media_curation_batch_writer: {frozen} is driven by the media "
                "index's frozen _META.json (a funnel/probe mismatch would make "
                "the within-batch pass band or hash differently than the "
                "cross-batch probe) — rebuild the index with the desired "
                "config instead"
            )
    if bands is None:
        bands = int(meta.get("bands_hint", 16))
    if max_hamming is None:
        # a pinned-radius index resolves the SAME radius it was sized
        # for — explicit None check, not truthiness: a pinned radius of
        # 0 (exact-dup-only index) must drive the funnel at 0, not at
        # the width-coupled default
        h = meta.get("max_hamming_hint")
        max_hamming = (
            int(h) if h is not None
            else default_media_hamming(meta["n_bits"], bands)
        )
    _guard_output_layout(out_dir, "ingest_batch", "media_curation_batch_writer")
    if audit_dir is not None:
        _guard_output_layout(audit_dir, "batch_id", "media_curation_batch_writer")
    if decisions_dir is not None:
        _guard_output_layout(
            decisions_dir, "ingest_batch", "media_curation_batch_writer"
        )
    if meta["id_col"] != id_col:
        raise ValueError(
            f"media_curation_batch_writer: id_col {id_col!r} does not match "
            f"the media index's frozen config ({meta['id_col']!r}) at "
            f"{index_path!r} — the index derives append signatures from its "
            f"own meta; rebuild the index or match its column"
        )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # file-stream lineage cut
        # ONE decode per payload for the WHOLE micro-batch: the funnel
        # decodes each payload once into per-leg signature checkpoints
        # and hands the frames back; the index probe and the index
        # append both run at the signature level off those frames
        # (spy-pinned in tests — no payload ever re-decodes here)
        decisions, sigs = curate_media_with_signatures(
            batch_df,
            id_col=id_col,
            image_max_hamming=max_hamming,
            audio_max_hamming=max_hamming,
            video_max_hamming=max_hamming,
            bands=bands,
            # the index's frozen signature config drives the funnel too —
            # a width mismatch would band the within-batch pass
            # differently than the cross-batch probe, and a hash-method
            # mismatch would make within-batch image decisions on dhash
            # signatures while the probe compares the index's method
            sig_bits=meta["n_bits"],
            image_method=meta["image_method"],
            cross_modal=cross_modal,
            **curate_kwargs,
        )
        # r14: the decisions assembly (sig-checkpoint joins + cluster
        # frames) and the index probe each had THREE consumers (filter/
        # anti-join, audit count, decisions-write join) — without a
        # lineage cut every consumer re-executed them; the probe alone
        # re-ran twice per batch. Lazy checkpoints: both materialize
        # inside the survivor checkpoint's job below, BEFORE this batch's
        # partition is appended to the index (the replay-exclusion read
        # must see pre-append state — every consumer runs pre-append).
        decisions = decisions.localCheckpoint(eager=False)
        keeps = decisions.filter(F.col("decision") == "keep").select("doc_id")
        kept_sigs = sigs.join(keeps, on="doc_id")
        ref_dropped = media_dedup_signatures_against_index(
            kept_sigs,
            spark,
            index_path,
            max_hamming=max_hamming,
            bands=bands,
            # replay safety: probe with THIS batch's partition hidden
            exclude_batch=int(batch_id),
        ).localCheckpoint(eager=False)
        survivor_sigs = kept_sigs.join(
            ref_dropped.select("doc_id"), on="doc_id", how="left_anti"
        ).localCheckpoint(eager=True)
        cross_dropped = None
        if cross_modal:
            # index-scope re-encoded-still gate: surviving videos' fused
            # frame hashes (already on the signature relation — zero
            # extra decodes) probed into the index's IMAGE plane; runs
            # AFTER the same-modality probe so within-modality index
            # drops keep precedence (a frame probe never sees them).
            # Synthetic frame id contract: |doc_id| < 2^63/side — an
            # overflow is an ANSI job error, never a mis-attribution
            # (same contract as the funnel's stage 4b)
            side = int(int(meta["n_bits"]) ** 0.5)
            frame_probe = (
                survivor_sigs.filter(
                    (F.col("modality") == "video")
                    & F.col("frame_bits").isNotNull()
                )
                .select(
                    "doc_id", F.posexplode("frame_bits").alias("fidx", "bits")
                )
                .select(
                    (F.col("doc_id") * side + F.col("fidx")).alias("doc_id"),
                    F.lit("image").alias("modality"),
                    "bits",
                )
            )
            frame_hits = media_dedup_signatures_against_index(
                frame_probe,
                spark,
                index_path,
                max_hamming=max_hamming,
                bands=bands,
                exclude_batch=int(batch_id),
            )
            cross_dropped = (
                # FLOOR division (pmod-adjusted): SQL DIV truncates
                # toward zero — a negative video id's frames would
                # otherwise attribute to the wrong document
                frame_hits.groupBy(
                    F.expr(
                        f"(doc_id - pmod(doc_id, {side})) DIV {side}"
                    ).alias("doc_id")
                )
                .agg(F.min(F.struct("hamming", "ref_id")).alias("__w"))
                .select(
                    "doc_id",
                    F.col("__w.ref_id").alias("ref_id"),
                    F.col("__w.hamming").alias("hamming"),
                )
                .localCheckpoint(eager=True)
            )
            survivor_sigs = survivor_sigs.join(
                cross_dropped.select("doc_id"), on="doc_id", how="left_anti"
            )
        survivors = batch_df.join(
            survivor_sigs.select(F.col("doc_id").alias(id_col)), on=id_col
        )
        n_in = batch_df.count()
        n_kept = survivor_sigs.count()
        n_drop_index = ref_dropped.count() + (
            cross_dropped.count() if cross_dropped is not None else 0
        )

        if decisions_dir is not None:
            # per-doc audit: funnel decisions, with index drops
            # overriding their funnel 'keep' and carrying the witness
            idx_d = ref_dropped.select(
                F.col("doc_id"),
                F.lit("drop:near_dup_index").alias("__idx_decision"),
                F.col("ref_id"),
                F.col("hamming"),
            )
            if cross_dropped is not None:
                idx_d = idx_d.unionByName(
                    cross_dropped.select(
                        F.col("doc_id"),
                        F.lit("drop:near_dup_cross").alias("__idx_decision"),
                        F.col("ref_id"),
                        F.col("hamming"),
                    )
                )
            (
                decisions.join(idx_d, on="doc_id", how="left")
                .select(
                    "doc_id",
                    "modality",
                    F.coalesce(F.col("__idx_decision"), F.col("decision")).alias(
                        "decision"
                    ),
                    "cluster_id",
                    "error_class",
                    "ref_id",
                    "hamming",
                    # r12 mass columns: the data card's byte/pixel/frame
                    # axes compose with the persisted audit directly
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                )
                .withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(decisions_dir)
            )
        if n_kept:
            (
                survivors.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(out_dir)
            )
            # decode-free append: the funnel's frames, already at the
            # index's frozen width/method by construction
            append_media_index_signatures(
                survivor_sigs, index_path, batch_id=int(batch_id)
            )
        if audit_dir is not None:
            (
                spark.createDataFrame(
                    [(int(batch_id), int(n_in), int(n_kept), int(n_drop_index))],
                    "batch_id long, n_in long, n_kept long, n_drop_index long",
                )
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(audit_dir)
            )

    return write


def start_media_curation_stream(
    media_stream: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    audit_dir: str | None = None,
    trigger_interval: str | None = None,
    **writer_kwargs,
):
    """Wire a streaming media frame (any source shape carrying
    (doc_id, payload binary) — parquet file dir, Kafka value bytes)
    through :func:`media_curation_batch_writer`. Returns the
    StreamingQuery. Replay and binding semantics are the text stream's:
    a re-delivered batch re-derives its first attempt's decisions with
    its own index partition excluded and overwrites its own staged
    partitions; a fresh checkpoint against an already-staged index fails
    at the `_STREAM.json` binding gate."""
    batch_writer = media_curation_batch_writer(
        index_path, out_dir, audit_dir, **writer_kwargs
    )
    _guard_checkpoint_binding(index_path, checkpoint_dir)
    writer = media_stream.writeStream.foreachBatch(batch_writer).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
