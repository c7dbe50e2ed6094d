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
         temporal centers), so a clip's frames can be located inside a
         longer video frame-by-frame.
  audio: one acoustic fingerprint per hop-strided window
         (:func:`audio_window_fingerprints` — `_afp_of` over each
         window's raw int64 samples), the same idea along PCM time.

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
    _avi_frames,
    _dhash_of,
    _side_of,
    _wav_samples,
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


def video_frame_signatures(
    with_payload: DataFrame,
    id_col: str = "doc_id",
    n_bits: int = DEFAULT_SIG_BITS,
    method: str = "dhash",
    stride: int = 1,
) -> DataFrame:
    """(doc_id, idx, start, bits, error) — one IMAGE-plane hash per
    ``stride``-th frame of each AVI payload, Arrow-batched
    ``mapInPandas`` (one decode per payload, the fused-stage discipline).
    ``idx`` counts sampled units (0, 1, …), ``start`` is the source frame
    number (= idx·stride). Undecodable payloads emit ONE dead-letter row
    with ``error`` set. This is the containment tier's unit generator —
    unlike `video_hash_bits(frame_hash_method=...)` it hashes EVERY
    stride-th frame, not the whole-object hash's sparse temporal
    centers, so a clip can be located at any frame offset."""
    if method not in ("dhash", "ahash"):
        raise ValueError(f"video_frame_signatures: unknown method {method!r}")
    if stride < 1:
        raise ValueError(f"video_frame_signatures: stride must be >= 1 ({stride})")
    side = _side_of(n_bits)
    hasher = _dhash_of if method == "dhash" else _ahash_of

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
                    if not (p[:4] == b"RIFF" and len(p) >= 24):
                        raise NotImplementedError("not an AVI payload")
                    frames, _usec = _avi_frames(p)
                    d_idx, d_start, d_bits = [], [], []
                    for k, fi in enumerate(range(0, frames.shape[0], stride)):
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
                    if not (p[:4] == b"RIFF" and len(p) >= 44):
                        raise NotImplementedError("not a WAV payload")
                    frames, _rate, _ch = _wav_samples(p)
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


def frame_signature_containment(
    clip_sigs: DataFrame,
    track_sigs: DataFrame,
    max_hamming: int | None = None,
    min_matches: int = 3,
    bands: int = 16,
    n_bits: int = DEFAULT_SIG_BITS,
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
    (offset = track idx − clip idx, constant across a true containment,
    robust to per-unit edits — see the module docstring for the
    alignment contract). ``max_hamming=None`` resolves width-scaled via
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
    c = clip_sigs.select(
        F.struct(
            F.col("doc_id").alias("doc"), F.col("idx").alias("i")
        ).alias("doc_id"),
        "bits",
    )
    t = track_sigs.select(
        F.struct(
            F.col("doc_id").alias("doc"), F.col("idx").alias("i")
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
    stride: int = 1,
) -> DataFrame:
    """"Which of these videos contain this clip" — (clip_id, track_id,
    offset, n_matched, max_unit_hamming), offset in SAMPLED-UNIT steps
    (source frames when ``stride=1``; multiply by ``stride`` for source
    frames otherwise, valid when stride divides the true offset — module
    docstring). Both sides decode exactly once (eager checkpoint of the
    unit signatures — each feeds the banding and nothing else re-decodes);
    a frame-aligned cut matches at hamming 0 across every untouched
    frame."""
    c = (
        video_frame_signatures(
            clips, id_col=id_col, n_bits=n_bits, method=method, stride=stride
        )
        .filter(F.col("error").isNull())
        .localCheckpoint(eager=True)
    )
    t = (
        video_frame_signatures(
            tracks, id_col=id_col, n_bits=n_bits, method=method, stride=stride
        )
        .filter(F.col("error").isNull())
        .localCheckpoint(eager=True)
    )
    return frame_signature_containment(
        c, t, max_hamming=max_hamming, min_matches=min_matches,
        bands=bands, n_bits=n_bits,
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
) -> DataFrame:
    """"Which of these tracks was this clip sampled from" — the audio
    twin of :func:`video_containment_pairs`, offsets in HOP units
    (multiply by ``hop_frames`` for sample frames). Exact when the cut
    is hop-aligned (bit-identical windows, hamming 0); see the module
    docstring for the mis-alignment honesty."""
    c = (
        audio_window_fingerprints(
            clips, window_frames, hop_frames, id_col=id_col, n_bits=n_bits
        )
        .filter(F.col("error").isNull())
        .localCheckpoint(eager=True)
    )
    t = (
        audio_window_fingerprints(
            tracks, window_frames, hop_frames, id_col=id_col, n_bits=n_bits
        )
        .filter(F.col("error").isNull())
        .localCheckpoint(eager=True)
    )
    return frame_signature_containment(
        c, t, max_hamming=max_hamming, min_matches=min_matches,
        bands=bands, n_bits=n_bits,
    )
