"""Media SUBSEQUENCE containment — "is this clip cut from any of those
tracks/videos" (SURVEY §2.12 multimodal tier, round 11).

The whole-object signatures (`video_hash_bits`, `audio_fingerprint_bits`)
answer "are these two objects near-duplicates"; they CANNOT answer
containment — a 10-minute video holding an indexed 10-second clip hashes
nothing like the clip (the temporal centers land elsewhere entirely).
This module works at SUBSEQUENCE granularity:

  video: one IMAGE-plane hash per (strided) frame
         (:func:`video_frame_signatures` — the fused stage's frame hash,
         but over EVERY stride-th frame instead of the hash's sparse
         temporal centers; ``stride='auto'`` = :func:`scaled_stride_for`,
         the computed one-per-second lake default), so a clip's frames
         can be located inside a longer video frame-by-frame — or one
         hash per SCENE-CHANGE anchor (:func:`video_landmark_signatures`,
         r12), which detects cuts at ANY frame offset.
  audio: one acoustic fingerprint per hop-strided window
         (:func:`audio_window_fingerprints` — `_afp_of` over each
         window's raw int64 samples), the same idea along PCM time — or
         per ENERGY-LANDMARK-anchored window
         (:func:`audio_landmark_fingerprints`, r12), which detects cuts
         at any sample offset.

The persisted form of all four unit rules — build the track corpus's
units once, probe clips decode-free against the lake — lives in
`ext/containment_index.py`; the streaming screen in
`streaming/containment.py`.

Containment itself is one shared relational core
(:func:`frame_signature_containment`): banded cross candidates between
the clip's unit signatures and the tracks' unit signatures (the
pigeonhole machinery verbatim — ids are (doc, idx) STRUCTS, so no
synthetic-id arithmetic and no overflow), exact hamming verify, then a
TEMPORAL-CONSISTENCY group: matches vote for (clip, track, offset =
track_idx − clip_idx), and an offset supported by ≥ ``min_matches``
units is a containment hit. Constant-offset counting (not
consecutive-run detection) on purpose: a per-frame edit inside the clip
removes that frame's vote but cannot break the run, so detection
degrades linearly with edit density instead of collapsing at the first
touched frame.

Exactness contract, stated honestly: a clip cut at a UNIT boundary
(frame-aligned for video at stride 1; hop-aligned for audio) reproduces
the track's unit signatures bit-for-bit — matches at hamming 0, offset
exact. A mis-aligned audio cut shifts every window's samples, and the
integer-exact fingerprint has no sub-hop shift invariance — detection
then rides ``max_hamming`` tolerance and may miss; pick ``hop_frames``
≤ the alignment granularity your ingest guarantees (codec frames,
packet boundaries) rather than hoping. Video at stride > 1 detects
offsets that are multiples of nothing in particular — each clip frame
still matches its exact counterpart whenever both sides sample the same
source frames (stride divides the true offset); stride trades signature
volume for offset coverage, and the default 1 covers every offset.

Scale shape: decode stays one Arrow-batched pass per payload (the only
pixel/PCM stage); the signature relation is one row of n_bits small
ints per unit — frames/stride rows per video, samples/hop per track —
so a 2-hour 24 fps video at stride 24 is ~7k rows of ~1 KB, never
pixels; candidates come from the linear banded equi-join (modality-free
here: callers pass one plane at a time) and the consistency group
shuffles candidate pairs only. Dead-letter rows (undecodable payloads)
carry ``error`` and are excluded from matching — run the curation
funnel first if you need the drop audit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beeper_matric_etl_tool_spark.ext.multimodal import (
    DEFAULT_SIG_BITS,
    _afp_of,
    _ahash_of,
    _decoder_fn,
    _dhash_of,
    _side_of,
    default_media_hamming,
)

#: per-unit signature schema shared by both planes: ``idx`` is the frame
#: index (video) or window index (audio); ``start`` the source position
#: (frame number / first sample frame) for audit attribution
UNIT_SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("start", T.LongType()),
        T.StructField("bits", T.ArrayType(T.IntegerType())),
        T.StructField("error", T.StringType()),
    ]
)


def scaled_stride_for(fps: float) -> int:
    """The COMPUTED video containment stride — one signature per second
    of content (``max(1, round(fps))``), the lake-wide default a 100 TB
    deployment wants derived, not remembered (r12; the r11 scale note).

    Volume math, worked: a 2 h 24 fps video is 172,800 frames. At
    ``stride=1`` that is 172,800 unit rows of ~1 KB each (256 small
    ints) ≈ 170 MB of signatures PER VIDEO — linear and honest, but a
    foot-gun as a lake default. At ``scaled_stride_for(24) = 24`` it is
    7,200 rows ≈ 7 MB, and a clip cut at a second boundary still lands
    every unit match (stride must divide the true frame offset — the
    module docstring's stride contract; sub-second cut offsets trade
    away with the volume). Callers wanting every-offset coverage pass
    ``stride=1`` explicitly — the expensive choice is now the explicit
    one."""
    if fps <= 0:
        raise ValueError(f"scaled_stride_for: fps must be positive ({fps})")
    return max(1, int(round(fps)))


def video_frame_signatures(
    with_payload: DataFrame,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
    method: str = "dhash",
    stride: int | str = 1,
) -> DataFrame:
    """(doc_id, idx, start, bits, error) — one IMAGE-plane hash per
    ``stride``-th frame of each AVI payload, Arrow-batched
    ``mapInPandas`` (one decode per payload, the fused-stage discipline).
    ``idx`` counts sampled units (0, 1, …), ``start`` is the source frame
    number (= idx·stride). Undecodable payloads emit ONE dead-letter row
    with ``error`` set. This is the containment tier's unit generator —
    unlike `video_hash_bits(frame_hash_method=...)` it hashes EVERY
    stride-th frame, not the whole-object hash's sparse temporal
    centers, so a clip can be located at any frame offset.

    ``stride='auto'`` (r12) computes the stride PER PAYLOAD from the
    container's own frame duration via :func:`scaled_stride_for` — one
    signature per second of content, the computed lake default. A clip
    cut from a track shares the track's fps, so both sides derive the
    SAME stride and the stride contract (stride divides the true
    offset) means second-aligned cuts are covered; ``start`` stays the
    true source frame number, so offsets in source frames remain
    exact. A payload with no usable frame duration falls back to
    stride 1 (full coverage, honest cost)."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"video_frame_signatures: unknown method {method!r}")
    if stride == "auto":
        stride = None  # per-payload, resolved inside the batch fn
    elif isinstance(stride, str):
        raise ValueError(f"video_frame_signatures: unknown stride {stride!r}")
    elif stride < 1:
        raise ValueError(f"video_frame_signatures: stride must be >= 1 ({stride})")
    side = _side_of(n_bits)
    hasher = _dhash_of if method == "dhash" else _ahash_of
    dec = _decoder_fn("video")  # registry snapshot, shipped in-closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, bits, errs = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                # per-doc rows accumulate LOCALLY and extend the batch
                # lists only after the full pass succeeds — a doc is
                # all-units or one dead-letter row, never both (an
                # exception mid-loop must not leave partial unit rows
                # that a downstream error-isNull filter would keep)
                try:
                    if p is None:
                        raise NotImplementedError("null payload")
                    p = bytes(p)
                    frames, usec = dec(p)
                    if stride is None:  # 'auto': one signature per second
                        st = (
                            scaled_stride_for(1_000_000 / usec)
                            if usec and usec > 0
                            else 1
                        )
                    else:
                        st = stride
                    d_idx, d_start, d_bits = [], [], []
                    for k, fi in enumerate(range(0, frames.shape[0], st)):
                        d_idx.append(k)
                        d_start.append(fi)
                        d_bits.append(hasher(frames[fi], side))
                except (NotImplementedError, ValueError, IndexError) as exc:
                    ids.append(doc_id)
                    idxs.append(None)
                    starts.append(None)
                    bits.append(None)
                    errs.append(f"frame_sig_error: {exc}")
                else:
                    ids.extend([doc_id] * len(d_idx))
                    idxs.extend(d_idx)
                    starts.extend(d_start)
                    bits.extend(d_bits)
                    errs.extend([None] * len(d_idx))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "idx": pd.Series(idxs, dtype="Int32"),
                    "start": pd.Series(starts, dtype="Int64"),
                    "bits": bits,
                    "error": errs,
                }
            )

    return with_payload.mapInPandas(batches, schema=UNIT_SIG_SCHEMA)


def video_landmark_signatures(
    with_payload: DataFrame,
    min_spacing: int,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
    method: str = "dhash",
) -> DataFrame:
    """(doc_id, idx, start, bits, error) — one IMAGE-plane hash per
    SCENE-CHANGE-anchored frame: anchors where the inter-frame change
    energy Σ|frame[t+1] − frame[t]| is the first max of its
    ±``min_spacing``-frame neighborhood (`_first_max_positions` — the
    audio landmark detector along the time axis), hashing the first
    frame AFTER each peak (the new scene's first frame).

    This closes the stride contract's divisibility requirement (r12):
    strided units only cover cut offsets the stride divides — the
    computed `scaled_stride_for` default trades sub-second offsets
    away. Scene anchors move WITH the content, so a clip cut at ANY
    frame offset preserves every interior anchor; both sides hash the
    bit-identical source frame and the vote key ``track.start −
    clip.start`` (probe with ``unit_col='start'``) is the exact cut
    offset in source frames. Volume ≈ one unit per scene (≤ one per
    2·min_spacing+1 frames at saturation) — typically far below even
    the auto stride, with none of its offset blindness.

    The landmark honesty carries over: anchors within min_spacing of a
    cut boundary may differ (they just don't vote); clips shorter than
    ~2·min_spacing may yield no anchors (honest miss); content with
    EXACTLY-tied change energies (static scenes, the synthetic
    gradient's constant per-frame offsets) yields few or no anchors —
    fall back to strided units for such corpora."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"video_landmark_signatures: unknown method {method!r}")
    if min_spacing < 1:
        raise ValueError(
            f"video_landmark_signatures: min_spacing must be >= 1 "
            f"({min_spacing})"
        )
    side = _side_of(n_bits)
    hasher = _dhash_of if method == "dhash" else _ahash_of
    dec = _decoder_fn("video")  # registry snapshot, shipped in-closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, bits, errs = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    if p is None:
                        raise NotImplementedError("null payload")
                    p = bytes(p)
                    frames, _usec = dec(p)
                    d = (
                        np.abs(
                            frames[1:].astype(np.int64)
                            - frames[:-1].astype(np.int64)
                        ).sum(axis=(1, 2, 3))
                        if frames.shape[0] >= 2
                        else np.empty(0, dtype=np.int64)
                    )
                    d_idx, d_start, d_bits = [], [], []
                    for k, q in enumerate(_first_max_positions(d, min_spacing)):
                        anchor = int(q) + 1  # first frame of the new scene
                        d_idx.append(k)
                        d_start.append(anchor)
                        d_bits.append(hasher(frames[anchor], side))
                except (NotImplementedError, ValueError, IndexError) as exc:
                    ids.append(doc_id)
                    idxs.append(None)
                    starts.append(None)
                    bits.append(None)
                    errs.append(f"frame_sig_error: {exc}")
                else:
                    ids.extend([doc_id] * len(d_idx))
                    idxs.extend(d_idx)
                    starts.extend(d_start)
                    bits.extend(d_bits)
                    errs.extend([None] * len(d_idx))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "idx": pd.Series(idxs, dtype="Int32"),
                    "start": pd.Series(starts, dtype="Int64"),
                    "bits": bits,
                    "error": errs,
                }
            )

    return with_payload.mapInPandas(batches, schema=UNIT_SIG_SCHEMA)


def audio_window_fingerprints(
    with_payload: DataFrame,
    window_frames: int,
    hop_frames: int | None = None,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
) -> DataFrame:
    """(doc_id, idx, start, bits, error) — one acoustic fingerprint per
    hop-strided window of each WAV payload (`_afp_of` over the window's
    raw int64 mono samples; integer-exact, the whole-clip fingerprint's
    discipline). ``hop_frames`` defaults to ``window_frames``
    (non-overlapping); smaller hops raise offset resolution at linear
    signature-volume cost. Windows need ``window_frames ≥ n_bits/2 + 2``
    so every energy/flux bin is non-empty (enforced). Clips shorter than
    one window dead-letter; trailing partial windows are NOT emitted (a
    partial window's bins would hash nothing like the full window the
    track holds at that position)."""
    if n_bits % 2:
        raise ValueError(f"audio_window_fingerprints: n_bits={n_bits} must be even")
    bins = n_bits // 2 + 1
    if window_frames < bins + 1:
        raise ValueError(
            f"audio_window_fingerprints: window_frames={window_frames} is "
            f"below the fingerprint's floor of {bins + 1} samples "
            f"({bins} bins need every bin non-empty)"
        )
    hop = window_frames if hop_frames is None else hop_frames
    if hop < 1:
        raise ValueError(f"audio_window_fingerprints: hop_frames must be >= 1 ({hop})")
    dec = _decoder_fn("audio")  # registry snapshot, shipped in-closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, bits, errs = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                # all-units-or-dead-letter, like video_frame_signatures:
                # per-doc rows land in local lists and only a fully
                # succeeded pass extends the batch lists
                try:
                    if p is None:
                        raise NotImplementedError("null payload")
                    p = bytes(p)
                    frames, _rate, _ch, _fs = dec(p)
                    mono = frames.astype(np.int64).sum(axis=1)
                    n = len(mono)
                    if n < window_frames:
                        raise NotImplementedError(
                            f"audio shorter than one window ({n} frames)"
                        )
                    d_idx, d_start, d_bits = [], [], []
                    for k, s in enumerate(range(0, n - window_frames + 1, hop)):
                        d_idx.append(k)
                        d_start.append(s)
                        d_bits.append(_afp_of(mono[s : s + window_frames], bins))
                except (NotImplementedError, ValueError, IndexError) as exc:
                    ids.append(doc_id)
                    idxs.append(None)
                    starts.append(None)
                    bits.append(None)
                    errs.append(f"window_fp_error: {exc}")
                else:
                    ids.extend([doc_id] * len(d_idx))
                    idxs.extend(d_idx)
                    starts.extend(d_start)
                    bits.extend(d_bits)
                    errs.extend([None] * len(d_idx))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "idx": pd.Series(idxs, dtype="Int32"),
                    "start": pd.Series(starts, dtype="Int64"),
                    "bits": bits,
                    "error": errs,
                }
            )

    return with_payload.mapInPandas(batches, schema=UNIT_SIG_SCHEMA)


def _first_max_positions(d: "np.ndarray", min_spacing: int) -> "np.ndarray":
    """Positions q where ``d[q]`` is the FIRST maximum of its
    ±``min_spacing`` neighborhood (ties resolve to the earliest index —
    deterministic). The detector is LOCAL: a position's landmark-ness
    depends only on its ±min_spacing neighborhood, so every landmark at
    least min_spacing inside a cut survives the cut at the same CONTENT
    position — the anchor property that makes landmark units
    alignment-free. O(n·min_spacing) vectorized compare (numpy sliding
    windows) over a series already in memory. Shared by the audio
    (|sample diff|) and video (inter-frame change energy) anchors."""
    n = len(d)
    L = min_spacing
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # pad with -1 (strictly below any energy >= 0) so edge windows are
    # well-formed; the center of window q sits at index L
    padded = np.concatenate(
        [np.full(L, -1, dtype=np.int64), d, np.full(L, -1, dtype=np.int64)]
    )
    win = np.lib.stride_tricks.sliding_window_view(padded, 2 * L + 1)
    return np.nonzero(win.argmax(axis=1) == L)[0]


def _landmark_positions(
    mono: "np.ndarray", min_spacing: int, window_frames: int
) -> list[int]:
    """Audio landmark anchors: positions q where |mono[q+1] − mono[q]|
    is the first max of its ±min_spacing neighborhood and a full window
    [q, q+W) fits. Edge landmarks (neighborhood truncated by a cut) may
    appear or vanish; they just don't vote."""
    d = np.abs(np.diff(mono)).astype(np.int64)
    return [
        int(q)
        for q in _first_max_positions(d, min_spacing)
        if q + window_frames <= len(mono)
    ]


def audio_landmark_fingerprints(
    with_payload: DataFrame,
    window_frames: int,
    min_spacing: int,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
) -> DataFrame:
    """(doc_id, idx, start, bits, error) — one acoustic fingerprint per
    ENERGY-LANDMARK-anchored window: windows start where the signal's
    sample-to-sample change peaks locally (:func:`_landmark_positions`),
    not at fixed hop multiples. This is the sub-hop alignment answer
    (r12, the r11 verdict's item 2): hop-strided windows only match a
    cut that is hop-aligned, because the integer-exact fingerprint has
    NO sub-hop shift invariance — measured, a 16-sample shift already
    scores at the noise floor. Landmarks move WITH the content: a cut at
    ANY sample offset preserves every interior landmark, both sides
    fingerprint the bit-identical window [q, q+W) at the same content
    position, and matches land at hamming 0 with the vote key
    ``track.start − clip.start`` equal to the exact cut offset in
    sample frames (probe with ``frame_signature_containment(...,
    unit_col='start')``).

    ``min_spacing`` bounds the unit volume (≥ one landmark per
    2·min_spacing+1 samples only at saturation; real signals are much
    sparser) and sets the edge blindness: landmarks closer than
    min_spacing to a cut boundary may differ between clip and track.
    Clips need interior landmarks to vote — a clip shorter than
    ~(2·min_spacing + window_frames) may yield none (honest miss, not
    an error). Window floor and dead-letter semantics are
    :func:`audio_window_fingerprints`'s.

    HONESTY on periodic content: the first-max tie rule means
    EXACTLY-repeating peak magnitudes suppress each other (each window
    sees an equal earlier peak) — a pure tone or a closed-form sawtooth
    yields few or no landmarks, the same way audio landmarking
    classically fails on tones. Content without distinctive transients
    has no anchors to find; fall back to hop mode (and hop-aligned
    ingest) for such corpora."""
    if n_bits % 2:
        raise ValueError(f"audio_landmark_fingerprints: n_bits={n_bits} must be even")
    bins = n_bits // 2 + 1
    if window_frames < bins + 1:
        raise ValueError(
            f"audio_landmark_fingerprints: window_frames={window_frames} is "
            f"below the fingerprint's floor of {bins + 1} samples "
            f"({bins} bins need every bin non-empty)"
        )
    if min_spacing < 1:
        raise ValueError(
            f"audio_landmark_fingerprints: min_spacing must be >= 1 "
            f"({min_spacing})"
        )
    dec = _decoder_fn("audio")  # registry snapshot, shipped in-closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, bits, errs = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    if p is None:
                        raise NotImplementedError("null payload")
                    p = bytes(p)
                    frames, _rate, _ch, _fs = dec(p)
                    mono = frames.astype(np.int64).sum(axis=1)
                    if len(mono) < window_frames:
                        raise NotImplementedError(
                            f"audio shorter than one window ({len(mono)} frames)"
                        )
                    d_idx, d_start, d_bits = [], [], []
                    for k, q in enumerate(
                        _landmark_positions(mono, min_spacing, window_frames)
                    ):
                        d_idx.append(k)
                        d_start.append(q)
                        d_bits.append(_afp_of(mono[q : q + window_frames], bins))
                except (NotImplementedError, ValueError, IndexError) as exc:
                    ids.append(doc_id)
                    idxs.append(None)
                    starts.append(None)
                    bits.append(None)
                    errs.append(f"landmark_fp_error: {exc}")
                else:
                    ids.extend([doc_id] * len(d_idx))
                    idxs.extend(d_idx)
                    starts.extend(d_start)
                    bits.extend(d_bits)
                    errs.extend([None] * len(d_idx))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "idx": pd.Series(idxs, dtype="Int32"),
                    "start": pd.Series(starts, dtype="Int64"),
                    "bits": bits,
                    "error": errs,
                }
            )

    return with_payload.mapInPandas(batches, schema=UNIT_SIG_SCHEMA)


def frame_signature_containment(
    clip_sigs: DataFrame,
    track_sigs: DataFrame,
    max_hamming: int | None = None,
    min_matches: int = 3,
    bands: int = 16,
    n_bits: int = DEFAULT_SIG_BITS,
    unit_col: str = "idx",
) -> DataFrame:
    """The containment core over two UNIT-signature relations (doc_id,
    idx, bits — `video_frame_signatures` / `audio_window_fingerprints`
    shape, error-free rows): (clip_id, track_id, offset, n_matched,
    max_unit_hamming), one row per (clip, track, offset) supported by
    ≥ ``min_matches`` unit matches within ``max_hamming`` each.

    Candidates ride the shared pigeonhole banding
    (`simhash_cross_candidates` — ids are (doc, idx) structs, so clips
    and tracks of any length compose without synthetic-id arithmetic);
    the consistency vote is one group-by over verified candidate pairs
    (offset = track unit − clip unit, constant across a true
    containment, robust to per-unit edits — see the module docstring
    for the alignment contract). ``unit_col`` picks the vote's unit
    axis: ``'idx'`` (default) votes in sampled-unit steps — right for
    the stride/hop generators whose units are equally spaced;
    ``'start'`` votes on SOURCE positions (frame / sample numbers) —
    required for `audio_landmark_fingerprints`, whose units are
    content-anchored and irregularly spaced (the offset is then the
    exact cut position in source units). The candidate dedup contract
    holds either way: `simhash_cross_candidates` dedups pairs per
    (doc, unit) struct id, so one vote per matched unit pair per
    offset. ``max_hamming=None`` resolves width-scaled via
    `default_media_hamming`. Self-pairs (a clip probed against a track
    relation containing the clip itself under the same id) are the
    caller's concern — disjoint id spaces are the expected shape."""
    from beeper_matric_etl_tool_spark.ext.dedup import simhash_cross_candidates

    if max_hamming is None:
        max_hamming = default_media_hamming(n_bits, bands)
    if min_matches < 1:
        raise ValueError(
            f"frame_signature_containment: min_matches must be >= 1 "
            f"({min_matches})"
        )
    if unit_col not in ("idx", "start"):
        raise ValueError(
            f"frame_signature_containment: unit_col must be 'idx' or "
            f"'start' ({unit_col!r})"
        )
    c = clip_sigs.select(
        F.struct(
            F.col("doc_id").alias("doc"), F.col(unit_col).alias("i")
        ).alias("doc_id"),
        "bits",
    )
    t = track_sigs.select(
        F.struct(
            F.col("doc_id").alias("doc"), F.col(unit_col).alias("i")
        ).alias("doc_id"),
        "bits",
    )
    pairs = simhash_cross_candidates(
        c, t, max_hamming=max_hamming, bands=bands, n_bits=n_bits, cache=False
    )
    return (
        pairs.select(
            F.col("doc_id.doc").alias("clip_id"),
            F.col("doc_id.i").alias("clip_idx"),
            F.col("ref_id.doc").alias("track_id"),
            F.col("ref_id.i").alias("track_idx"),
            "hamming",
        )
        .groupBy(
            "clip_id",
            "track_id",
            (F.col("track_idx") - F.col("clip_idx")).alias("offset"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.max("hamming").alias("max_unit_hamming"),
        )
        .filter(F.col("n_matched") >= min_matches)
    )


def video_containment_pairs(
    clips: DataFrame,
    tracks: DataFrame,
    max_hamming: int | None = None,
    min_matches: int = 3,
    bands: int = 16,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
    method: str = "dhash",
    stride: int | str = 1,
    landmark_spacing: int | None = None,
) -> DataFrame:
    """"Which of these videos contain this clip" — (clip_id, track_id,
    offset, n_matched, max_unit_hamming).

    Default (strided) mode: offset in SAMPLED-UNIT steps (source frames
    when ``stride=1``; multiply by ``stride`` for source frames
    otherwise, valid when stride divides the true offset — module
    docstring; ``stride='auto'`` = `scaled_stride_for`, one signature
    per second). A frame-aligned, stride-divisible cut matches at
    hamming 0 across every untouched frame.

    ``landmark_spacing`` set (r12) switches both sides to SCENE-CHANGE
    anchors (`video_landmark_signatures`): cuts at ANY frame offset are
    detected and ``offset`` is the exact cut position in SOURCE frames
    (the vote runs on ``start``); ``stride`` is ignored. Both sides
    decode exactly once either way (eager checkpoint of the unit
    signatures)."""
    if landmark_spacing is not None:
        gen = lambda df: video_landmark_signatures(  # noqa: E731
            df, landmark_spacing, id_col=id_col, n_bits=n_bits, method=method
        )
        unit_col = "start"
    else:
        gen = lambda df: video_frame_signatures(  # noqa: E731
            df, id_col=id_col, n_bits=n_bits, method=method, stride=stride
        )
        unit_col = "idx"
    c = gen(clips).filter(F.col("error").isNull()).localCheckpoint(eager=True)
    t = gen(tracks).filter(F.col("error").isNull()).localCheckpoint(eager=True)
    return frame_signature_containment(
        c, t, max_hamming=max_hamming, min_matches=min_matches,
        bands=bands, n_bits=n_bits, unit_col=unit_col,
    )


def audio_containment_pairs(
    clips: DataFrame,
    tracks: DataFrame,
    window_frames: int,
    hop_frames: int | None = None,
    max_hamming: int | None = None,
    min_matches: int = 3,
    bands: int = 16,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
    landmark_spacing: int | None = None,
) -> DataFrame:
    """"Which of these tracks was this clip sampled from" — the audio
    twin of :func:`video_containment_pairs`.

    Default (hop) mode: fixed hop-strided windows, offsets in HOP units
    (multiply by ``hop_frames`` for sample frames). Exact when the cut
    is hop-aligned (bit-identical windows, hamming 0); a MIS-aligned
    cut is missed — the integer-exact fingerprint has no sub-hop shift
    invariance (module docstring; measured: a 16-sample shift scores at
    the noise floor).

    ``landmark_spacing`` set (r12) switches both sides to
    ENERGY-LANDMARK-anchored windows (`audio_landmark_fingerprints`):
    windows start at content-determined positions that survive a cut at
    ANY sample offset, so mis-aligned cuts are detected exactly —
    matches at hamming 0, and ``offset`` is the cut position in SAMPLE
    FRAMES (the vote runs on ``start``, not ``idx``). ``hop_frames``
    is ignored in landmark mode."""
    if landmark_spacing is not None:
        gen = lambda df: audio_landmark_fingerprints(  # noqa: E731
            df, window_frames, landmark_spacing, id_col=id_col, n_bits=n_bits
        )
        unit_col = "start"
    else:
        gen = lambda df: audio_window_fingerprints(  # noqa: E731
            df, window_frames, hop_frames, id_col=id_col, n_bits=n_bits
        )
        unit_col = "idx"
    c = gen(clips).filter(F.col("error").isNull()).localCheckpoint(eager=True)
    t = gen(tracks).filter(F.col("error").isNull()).localCheckpoint(eager=True)
    return frame_signature_containment(
        c, t, max_hamming=max_hamming, min_matches=min_matches,
        bands=bands, n_bits=n_bits, unit_col=unit_col,
    )
