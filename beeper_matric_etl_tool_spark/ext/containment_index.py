"""Persisted CONTAINMENT index — unit-granularity signatures with the
build/probe/append lifecycle, so "is this new clip cut from anything in
the LAKE" is a decode-free probe (SURVEY §2.12 multimodal tier, r12;
the r11 verdict's top item).

`video_containment_pairs` / `audio_containment_pairs` re-decode BOTH
sides per query — right for a one-shot batch comparison, wrong at
steady state where the track corpus is the lake: the question a lake
operator actually asks arrives one clip at a time, and yesterday's
tracks are already decoded. This module applies `ext/media_index.py`'s
whole-object lifecycle at (doc, unit) granularity:

  build:   ONE decode pass over the track corpus → `unit_signatures/`
           parquet (doc_id, idx, start, bits[n_bits]) — ~1 KB per unit,
           units ∝ media length (frames/stride for video, windows or
           landmarks for audio), never pixels/PCM — plus `_META.json`
           freezing the unit-generation config (kind, width, and the
           per-kind sampling rule), because units generated under a
           different stride/hop/spacing CANNOT vote consistently with
           the stored ones.
  probe:   `containment_against_index` decodes ONLY the probe clips,
           reads the stored unit signatures (no track payload in any
           probe plan — plan-pinned in tests) and runs the SAME
           driver-oracled core the batch entries use
           (`media_subseq.frame_signature_containment`), so index-path
           and batch-path verdicts can never drift. Callers that
           already derived clip units use
           `containment_signatures_against_index` — zero decodes.
  append:  accepted tracks extend `unit_signatures/` — one decode via
           `append_containment_index`, or zero via
           `append_containment_index_signatures` (in-plan width
           assertion); the next probe sees them without a rebuild.

Layout and staging are the shared ingest-batch discipline (build −1,
unstaged −2, staged appends their own batch id as a dynamic partition
overwrite; `exclude_batch` hides one partition, partition-pruned) — a
replayed streaming batch probes exactly the state its first attempt
saw. Compaction reuses `dedup_index.compact_batched_tables` with the
same `preserve_last` replay shield.

Scale shape at 100 TB: the probe plan's only Python stage is the probe
clips' decode; the index side is a columnar scan of (id, unit, n_bits
small ints); candidates ride the pigeonhole banding over (doc, unit)
STRUCT ids and the vote shuffles candidate pairs only. The stored
volume is the stride/hop/landmark rule's choice — `scaled_stride_for`
is the computed video default (one signature per second), so the
170 MB-per-2h-video foot-gun requires asking for ``stride=1``
explicitly.

Filesystem contract: `_META.json` via plain `os`/`open` — the sinks
family's POSIX-local assumption (`sinks._require_local_path`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.media_index import (
    BATCH_COL,
    BOOTSTRAP_BATCH,
    UNSTAGED_BATCH,
    _write,
)
from beeper_matric_etl_tool_spark.ext.multimodal import (
    DEFAULT_SIG_BITS,
    default_media_hamming,
)

_META_FILE = "_META.json"

#: the stored unit-signature relation's contract columns
UNIT_COLUMNS = ("doc_id", "idx", "start", "bits")


def _bands_hint_for(n_bits: int, max_hamming: int | None) -> int:
    """Smallest divisor of the width whose recall cap (bands−1) clears
    the radius — the media index's build rule, shared so a non-256
    width never freezes an unusable banding. Raises (the family's
    raise-not-clamp policy, `dedup.scaled_bands_for`) when the radius
    would force 1-bit bands (bands = n_bits): every probe would then
    candidate-join against essentially the whole index — a quadratic
    blow-up that must be an explicit choice ("widen the signature"),
    never a silent build default (r13 ADVICE fix)."""
    h = max_hamming if max_hamming is not None else max(12, (15 * n_bits) // 256)
    b = next(
        (b for b in range(h + 1, n_bits) if n_bits % b == 0),
        None,
    )
    if b is None:
        largest_ok = max(
            (d - 1 for d in range(2, n_bits) if n_bits % d == 0), default=0
        )
        raise ValueError(
            f"containment index: max_hamming={h} at n_bits={n_bits} would "
            f"force {n_bits} 1-bit bands — every band value collides and "
            f"probes degrade to a quadratic candidate join. Largest radius "
            f"this width can band is {largest_ok}; widen the signature "
            f"(n_bits) to keep this radius"
        )
    return b


def _resolved_strides(units: DataFrame) -> list[int]:
    """Distinct per-payload strides observable in a unit relation —
    ``start`` of unit ``idx == 1`` (units are start = idx·stride).
    Small by construction (one value per distinct fps in the corpus)."""
    rows = (
        units.filter(F.col("idx") == 1)
        .select(F.col("start").cast("long").alias("s"))
        .distinct()
        .collect()
    )
    return sorted(int(r["s"]) for r in rows)


def _unit_signatures(with_payload: DataFrame, meta: dict) -> DataFrame:
    """Derive unit signatures under a frozen config — ONE shared
    derivation for build, append and the probe's clip side, so the
    three can never drift. Dead-letter rows are excluded (an index
    stores only comparable units; `curate_media` is where undecodables
    get their audit)."""
    from beeper_matric_etl_tool_spark.ext.media_subseq import (
        audio_landmark_fingerprints,
        audio_window_fingerprints,
        video_frame_signatures,
    )

    kind = meta["kind"]
    if kind == "video":
        sigs = video_frame_signatures(
            with_payload,
            id_col=meta["id_col"],
            n_bits=meta["n_bits"],
            method=meta["method"],
            stride=meta["stride"],
        )
    elif kind == "video_landmark":
        from beeper_matric_etl_tool_spark.ext.media_subseq import (
            video_landmark_signatures,
        )

        sigs = video_landmark_signatures(
            with_payload,
            meta["landmark_spacing"],
            id_col=meta["id_col"],
            n_bits=meta["n_bits"],
            method=meta["method"],
        )
    elif kind == "audio":
        sigs = audio_window_fingerprints(
            with_payload,
            meta["window_frames"],
            meta["hop_frames"],
            id_col=meta["id_col"],
            n_bits=meta["n_bits"],
        )
    elif kind == "audio_landmark":
        sigs = audio_landmark_fingerprints(
            with_payload,
            meta["window_frames"],
            meta["landmark_spacing"],
            id_col=meta["id_col"],
            n_bits=meta["n_bits"],
        )
    else:
        raise ValueError(f"containment index: unknown kind {kind!r}")
    return sigs.filter(F.col("error").isNull()).select(*UNIT_COLUMNS)


def build_containment_index(
    tracks: DataFrame,
    path: str,
    kind: str,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
    method: str = "dhash",
    stride: int | str = "auto",
    window_frames: int | None = None,
    hop_frames: int | None = None,
    landmark_spacing: int | None = None,
    max_hamming: int | None = None,
) -> None:
    """Build and persist the unit-signature index from the track corpus
    (one decode pass). ``kind`` picks the unit rule, frozen for the
    index's lifetime:

    - ``'video'``: one image-plane hash (``method``) per ``stride``-th
      frame; ``stride='auto'`` (default) = `scaled_stride_for` — one
      signature per second, computed per payload from the container's
      frame duration. Offsets at probe time are in sampled units
      (source frames at stride 1); detection needs stride | offset.
    - ``'video_landmark'``: one image-plane hash per SCENE-CHANGE
      anchor (``landmark_spacing`` required) — detects cuts at ANY
      frame offset with exact source-frame offsets, at roughly
      one-unit-per-scene volume (the stride contract's divisibility
      requirement disappears; static/tied-energy content yields no
      anchors — the documented landmark caveat).
    - ``'audio'``: hop-strided window fingerprints (``window_frames``
      required; ``hop_frames`` defaults to the window). Detects
      hop-aligned cuts only — the documented alignment contract.
    - ``'audio_landmark'``: energy-landmark-anchored windows
      (``window_frames`` and ``landmark_spacing`` required) — detects
      cuts at ANY sample offset; probe offsets are exact sample
      positions (the vote runs on ``start``).

    ``max_hamming`` pins an absolute probe radius (stored as
    ``max_hamming_hint``, resolved by every probe); the banding hint is
    the smallest width divisor clearing the radius. Reference:
    `ext/media_index.py:build_media_index` (the lifecycle this mirrors;
    the reference system's one-payload-column data model —
    reference src/server/db/schema.ts:61 — is what makes re-cut media
    the normal lake case)."""
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "build_containment_index")
    if kind not in ("video", "video_landmark", "audio", "audio_landmark"):
        raise ValueError(
            f"build_containment_index: kind must be 'video', "
            f"'video_landmark', 'audio' or 'audio_landmark' ({kind!r})"
        )
    meta: dict = {
        "kind": kind,
        "n_bits": int(n_bits),
        "id_col": id_col,
        "layout": "ingest-batch-partitioned",
        "bands_hint": _bands_hint_for(n_bits, max_hamming),
    }
    if kind in ("video", "video_landmark"):
        if method not in ("dhash", "ahash"):
            raise ValueError(
                f"build_containment_index: unknown method {method!r}"
            )
        meta["method"] = method
        if kind == "video":
            meta["stride"] = stride if stride == "auto" else int(stride)
        else:
            if landmark_spacing is None:
                raise ValueError(
                    "build_containment_index: kind='video_landmark' needs "
                    "landmark_spacing"
                )
            meta["landmark_spacing"] = int(landmark_spacing)
    else:
        if window_frames is None:
            raise ValueError(
                "build_containment_index: audio kinds need window_frames"
            )
        meta["window_frames"] = int(window_frames)
        if kind == "audio":
            meta["hop_frames"] = (
                int(hop_frames) if hop_frames is not None else None
            )
        else:
            if landmark_spacing is None:
                raise ValueError(
                    "build_containment_index: kind='audio_landmark' needs "
                    "landmark_spacing"
                )
            meta["landmark_spacing"] = int(landmark_spacing)
    if max_hamming is not None:
        meta["max_hamming_hint"] = int(max_hamming)
    sigs = _unit_signatures(tracks, meta)
    _write(
        sigs, os.path.join(path, "unit_signatures"), "overwrite", BOOTSTRAP_BATCH
    )
    if meta.get("stride") == "auto":
        # freeze the RESOLVED stride distribution alongside the 'auto'
        # rule (r13 ADVICE fix): 'auto' resolves per payload from the
        # container's frame duration, so a probe clip re-encoded at a
        # different fps silently derives a different stride and never
        # votes — recording what the BUILD resolved lets the decode
        # probe detect exactly that drift and warn (one-unit tracks are
        # unobservable on this axis; stride = start of unit idx 1)
        meta["resolved_strides"] = _resolved_strides(
            tracks.sparkSession.read.parquet(
                os.path.join(path, "unit_signatures")
            )
        )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _META_FILE), "w") as fh:
        json.dump(meta, fh)


def read_meta(path: str) -> dict:
    """Read the index's frozen unit config (filesystem + layout gates,
    the shared index-family discipline)."""
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "read_meta(containment_index)")
    meta_path = os.path.join(path, _META_FILE)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"containment index at {path!r} has no {_META_FILE} — not an "
            f"index built by build_containment_index"
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("layout") != "ingest-batch-partitioned" or "kind" not in meta:
        raise ValueError(
            f"containment index at {path!r} is not an ingest-batch-"
            f"partitioned containment index — rebuild with "
            f"build_containment_index"
        )
    return meta


def append_containment_index(
    tracks: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """Append ACCEPTED tracks under the index's frozen config (one
    decode pass). Staging semantics are the shared discipline:
    ``batch_id=None`` appends unstaged (partition −2; replays duplicate
    unit rows — harmless for verdicts, the vote counts DISTINCT
    candidate unit pairs per (doc, unit) struct id, but wasteful); a
    staged ``batch_id >= 0`` dynamic-overwrites its own partition —
    replay-safe."""
    meta = read_meta(path)
    append_containment_index_signatures(
        _unit_signatures(tracks, meta), path, batch_id=batch_id
    )
    if meta.get("stride") == "auto" and "resolved_strides" in meta:
        # keep the frozen stride distribution current (r13 ADVICE fix):
        # appended tracks may carry a frame duration the build never
        # saw — future probes at that fps are then legitimate. Reads
        # ONLY the partition this append touched (for unstaged appends
        # that partition accumulates prior unstaged strides — merging a
        # superset of what this call added is still correct: every
        # stride in it exists in the index).
        part = UNSTAGED_BATCH if batch_id is None else int(batch_id)
        part_dir = os.path.join(
            path, "unit_signatures", f"{BATCH_COL}={part}"
        )
        merged = sorted(
            set(meta["resolved_strides"])
            | set(_resolved_strides(tracks.sparkSession.read.parquet(part_dir)))
        )
        if merged != meta["resolved_strides"]:
            meta["resolved_strides"] = merged
            with open(os.path.join(path, _META_FILE), "w") as fh:
                json.dump(meta, fh)


def append_containment_index_signatures(
    sigs: DataFrame, path: str, batch_id: int | None = None
) -> None:
    """The decode-free append: extend ``unit_signatures/`` with
    ALREADY-DERIVED unit frames (the `UNIT_SIG_SCHEMA` shape, error
    rows removed). CONTRACT: the frames must come from the index's
    frozen unit rule — a mismatched stride/hop/spacing would vote
    inconsistently with the stored units, silently; the stored width IS
    asserted in the write plan (a mismatched row fails the job, not the
    lake), the sampling rule cannot be checked from the rows and stays
    the caller's obligation (derive via `_unit_signatures`/the meta)."""
    meta = read_meta(path)
    n_bits = int(meta["n_bits"])
    checked = sigs.select(*UNIT_COLUMNS).withColumn(
        "bits",
        F.when(F.size("bits") == n_bits, F.col("bits")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"append_containment_index_signatures: signature "
                        f"width mismatch — index {path!r} is frozen at "
                        f"{n_bits} bits, got "
                    ),
                    F.size("bits").cast("string"),
                )
            )
        ),
    )
    if batch_id is None:
        mode, part = "append", UNSTAGED_BATCH
    else:
        if batch_id < 0:
            raise ValueError(
                f"append_containment_index_signatures: batch_id={batch_id} "
                f"is reserved (-1 build, -2 unstaged) — staged batch ids "
                f"must be >= 0"
            )
        mode, part = "overwrite", batch_id
    _write(checked, os.path.join(path, "unit_signatures"), mode, part)


def compact_containment_index(
    spark: SparkSession, path: str, preserve_last: bool = True
) -> dict[str, int]:
    """Fold accumulated per-batch unit partitions into the bootstrap
    partition — the shared small-file fix (`compact_batched_tables`),
    same `preserve_last` replay shield and crash-healing swap."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        compact_batched_tables,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "compact_containment_index")
    read_meta(path)  # asserts this IS a containment index first
    return compact_batched_tables(spark, path, ("unit_signatures",), preserve_last)


def delete_from_containment_index(
    spark: SparkSession, path: str, ids
) -> dict[str, int]:
    """Remove tracks' unit signatures from the persisted containment
    index — the takedown cascade (DMCA/GDPR), touched partitions only,
    shared core `dedup_index.delete_from_batched_tables`. After
    deletion a clip cut from the removed track no longer attributes to
    it (and still attributes to every remaining track it matches)."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        delete_from_batched_tables,
    )
    from beeper_matric_etl_tool_spark.sinks import _require_local_path

    _require_local_path(path, "delete_from_containment_index")
    read_meta(path)  # asserts this IS a containment index first
    return delete_from_batched_tables(
        spark, path, ("unit_signatures",), "doc_id", ids
    )


def drop_containment_index_batches(
    spark: SparkSession, path: str, batch_ids
) -> dict[str, int]:
    """Roll back whole ingest batches (a poisoned micro-batch) from the
    unit table — `dedup_index.drop_index_batches` semantics."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        drop_index_batches,
    )

    read_meta(path)
    return drop_index_batches(spark, path, ("unit_signatures",), batch_ids)


def containment_index_report(spark: SparkSession, path: str) -> dict:
    """Ops data card over the unit table (`dedup_index.index_report`)."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import index_report

    read_meta(path)
    return index_report(spark, path, ("unit_signatures",))


def containment_signatures_against_index(
    clip_sigs: DataFrame,
    spark: SparkSession,
    path: str,
    min_matches: int = 3,
    max_hamming: int | None = None,
    bands: int | None = None,
    exclude_batch: int | None = None,
) -> DataFrame:
    """The decode-free probe core: vote the probe clips'
    ALREADY-DERIVED unit frames (`UNIT_SIG_SCHEMA` shape, error rows
    removed) against the persisted track units — (clip_id, track_id,
    offset, n_matched, max_unit_hamming), the batch core's contract
    verbatim (`frame_signature_containment` IS the engine — the
    driver-oracled one). The track side is a parquet scan of unit
    signatures; NO track payload exists in the plan. ``offset`` is in
    the index's unit axis: sampled units for 'video'/'audio', exact
    SOURCE positions for the landmark kinds — sample frames for
    'audio_landmark', source frame NUMBERS for 'video_landmark' (both
    vote on ``start``; no stride multiplier applies to either). ``exclude_batch`` hides one ingest_batch partition
    (partition-pruned) — the streaming replay discipline.
    ``max_hamming=None`` resolves the pinned build radius if present
    (explicit None check — radius 0 is a legitimate exact-only pin),
    else width-scaled; ``bands=None`` the stored hint."""
    from beeper_matric_etl_tool_spark.ext.media_subseq import (
        frame_signature_containment,
    )

    meta = read_meta(path)
    if bands is None:
        bands = int(meta.get("bands_hint", 16))
    if max_hamming is None:
        h = meta.get("max_hamming_hint")
        max_hamming = (
            int(h) if h is not None
            else default_media_hamming(meta["n_bits"], bands)
        )
    ref = spark.read.parquet(os.path.join(path, "unit_signatures"))
    if exclude_batch is not None:
        ref = ref.filter(F.col(BATCH_COL) != F.lit(int(exclude_batch)))
    # landmark kinds vote on SOURCE positions (exact cut offsets);
    # strided/hopped kinds on the equally-spaced unit axis
    unit_col = (
        "start"
        if meta["kind"] in ("audio_landmark", "video_landmark")
        else "idx"
    )
    return frame_signature_containment(
        clip_sigs.select(*UNIT_COLUMNS),
        ref.select(*UNIT_COLUMNS),
        max_hamming=max_hamming,
        min_matches=min_matches,
        bands=bands,
        n_bits=meta["n_bits"],
        unit_col=unit_col,
    )


def containment_against_index(
    clips: DataFrame,
    spark: SparkSession,
    path: str,
    min_matches: int = 3,
    max_hamming: int | None = None,
    bands: int | None = None,
    exclude_batch: int | None = None,
) -> DataFrame:
    """"Is this clip cut from anything in the LAKE" — decode the probe
    clips ONCE under the index's frozen unit rule (eager checkpoint,
    consumed by the banding and the vote), read the stored track units,
    run the shared containment core. Clips that dead-letter simply
    yield no units (no votes — run `curate_media` first for the drop
    audit). See :func:`containment_signatures_against_index` for the
    contract details; this entry is that core plus one clip decode."""
    meta = read_meta(path)
    clip_sigs = (
        _unit_signatures(clips, meta)
        .localCheckpoint(eager=True)
    )
    if meta.get("stride") == "auto" and "resolved_strides" in meta:
        # auto-stride drift detection (r13 ADVICE fix): 'auto' resolves
        # per payload, so a clip re-encoded at a frame duration the
        # indexed tracks never used derives a stride the index has no
        # units for — its misses would otherwise be undetectable. Cheap
        # here: clip_sigs is already checkpointed, the distinct is over
        # a handful of values.
        built = set(meta["resolved_strides"])
        probe = set(_resolved_strides(clip_sigs))
        if probe - built:
            import warnings

            warnings.warn(
                f"containment_against_index: probe clips resolved "
                f"stride(s) {sorted(probe - built)} that the index at "
                f"{path!r} was never built with (build strides: "
                f"{sorted(built)}) — 'auto' derives the stride from the "
                f"container's frame duration, so these clips (e.g. a "
                f"re-encode at a different fps) cannot vote against the "
                f"stored units; rebuild with an explicit stride or "
                f"re-encode the probes to an indexed frame duration",
                stacklevel=2,
            )
    return containment_signatures_against_index(
        clip_sigs,
        spark,
        path,
        min_matches=min_matches,
        max_hamming=max_hamming,
        bands=bands,
        exclude_batch=exclude_batch,
    )
