"""Media subsequence containment (ext/media_subseq.py): clip-inside-track
detection for video (per-frame image hashes) and audio (per-window
acoustic fingerprints) — the granularity whole-object signatures cannot
answer. Pins: exact unit-aligned cuts match at hamming 0 with the exact
offset; the consistency vote needs min_matches at ONE offset; stride
composes; the alignment honesty (mis-aligned audio cuts are not
exact-detected); dead letters are excluded without crashing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext import multimodal as xmm
from beeper_matric_etl_tool_spark.ext.media_subseq import (
    audio_containment_pairs,
    audio_window_fingerprints,
    frame_signature_containment,
    video_containment_pairs,
    video_frame_signatures,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )


def _wav_of(samples: np.ndarray, rate: int = 8000) -> bytes:
    sig = samples.astype("<i2").tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    data = b"data" + len(sig).to_bytes(4, "little") + sig
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_video_containment_exact_and_stride(spark):
    track = xmm.make_gradient_avi(40, 16, 60, seed=3)
    other = xmm.make_gradient_avi(40, 16, 60, seed=4)
    src_frames, _ = xmm._avi_frames(track)
    clip = xmm._encode_avi(src_frames[20:32])  # frames [20, 32)

    clips = _frame(spark, [(1, clip)])
    tracks = _frame(spark, [(100, track), (101, other)])

    # at a permissive vote threshold the TRUE containment dominates:
    # every clip frame votes for offset 20 at hamming 0. Coincidental
    # exact frame-hash collisions DO occur on this synthetic gradient
    # (a handful of frames hash identically at a second offset — the
    # grid hash is coarse by design) — they surface as low-vote offsets,
    # which is precisely the noise min_matches exists to gate
    rows = video_containment_pairs(
        clips, tracks, max_hamming=0, min_matches=3
    ).collect()
    true = [r for r in rows
            if (r.clip_id, r.track_id, r.offset) == (1, 100, 20)]
    assert len(true) == 1
    assert (true[0].n_matched, true[0].max_unit_hamming) == (12, 0)
    assert all(r.n_matched < 12 for r in rows if r.offset != 20)

    # raising the vote threshold silences the coincidence offsets and
    # leaves exactly the containment
    rows5 = video_containment_pairs(
        clips, tracks, max_hamming=0, min_matches=5
    ).collect()
    assert [
        (r.clip_id, r.track_id, r.offset, r.n_matched, r.max_unit_hamming)
        for r in rows5
    ] == [(1, 100, 20, 12, 0)]

    # stride=2: both sides sample even source frames; the true offset 20
    # is stride-divisible, so detection survives at halved volume
    rows2 = video_containment_pairs(
        clips, tracks, max_hamming=0, min_matches=5, stride=2
    ).collect()
    assert [
        (r.clip_id, r.track_id, r.offset, r.n_matched) for r in rows2
    ] == [(1, 100, 10, 6)]

    # min_matches gates the vote: demanding more units than the clip has
    # yields nothing
    assert (
        video_containment_pairs(
            clips, tracks, max_hamming=0, min_matches=13
        ).count()
        == 0
    )


def test_video_frame_signatures_units_and_dead_letter(spark):
    track = xmm.make_gradient_avi(40, 16, 24, seed=5)
    sigs = video_frame_signatures(
        _frame(spark, [(7, track), (8, b"not an avi")]), n_bits=64
    )
    ok = sigs.filter(F.col("error").isNull()).collect()
    assert len(ok) == 24 and all(len(r.bits) == 64 for r in ok)
    assert [(r.idx, r.start) for r in sorted(ok, key=lambda r: r.idx)][:3] == [
        (0, 0), (1, 1), (2, 2)
    ]
    # the per-frame hash IS the image plane's hash of that frame
    px0 = xmm._avi_frames(track)[0][0]
    assert list(ok[0].bits) == xmm._dhash_of(px0, 8)
    (dl,) = sigs.filter(F.col("error").isNotNull()).collect()
    assert dl.doc_id == 8 and dl.bits is None
    # containment over a relation holding the dead letter just skips it
    assert (
        video_containment_pairs(
            _frame(spark, [(1, b"junk")]), _frame(spark, [(100, track)])
        ).count()
        == 0
    )


def test_audio_containment_alignment_contract(spark):
    track_bytes = xmm.make_saw_wav(40_000, seed=2)
    other_bytes = xmm.make_saw_wav(40_000, seed=5)
    samples, _, _ = xmm._wav_samples(track_bytes)
    mono = samples[:, 0]

    aligned = _wav_of(mono[8192 : 8192 + 6144])   # cut at hop 4 (2048*4)
    misaligned = _wav_of(mono[8000 : 8000 + 6144])

    clips = _frame(spark, [(1, aligned), (2, misaligned)])
    tracks = _frame(spark, [(100, track_bytes), (101, other_bytes)])
    rows = audio_containment_pairs(
        clips, tracks, window_frames=2048, max_hamming=0, min_matches=3
    ).collect()
    # the hop-aligned cut is found exactly — offset 4 in hop units,
    # all 3 windows at hamming 0; the mis-aligned cut is NOT exact-
    # detected (no sub-hop shift invariance — the documented contract),
    # and the other track is silent
    assert [
        (r.clip_id, r.track_id, r.offset, r.n_matched, r.max_unit_hamming)
        for r in rows
    ] == [(1, 100, 4, 3, 0)]

    # window floor is enforced loudly
    with pytest.raises(ValueError, match="floor"):
        audio_window_fingerprints(clips, window_frames=64)


def test_containment_degrades_by_votes_not_runs(spark):
    """The constant-offset vote's robustness claim, executed: editing
    units INSIDE the clip removes exactly those units' votes — detection
    persists at the same offset with fewer votes instead of collapsing
    at the first touched unit (what a consecutive-run detector would
    do). Video: one frame inverted → 11/12 votes; audio: one window
    re-leveled → 2/3 votes."""
    track = xmm.make_gradient_avi(40, 16, 60, seed=3)
    frames = xmm._avi_frames(track)[0][20:32].copy()
    frames[5] = 255 - frames[5]  # edit ONE frame mid-clip
    clip = xmm._encode_avi(frames)
    rows = video_containment_pairs(
        _frame(spark, [(1, clip)]), _frame(spark, [(100, track)]),
        max_hamming=0, min_matches=5,
    ).collect()
    assert [(r.track_id, r.offset, r.n_matched) for r in rows] == [(100, 20, 11)]

    track_b = xmm.make_saw_wav(40_000, seed=2)
    mono = xmm._wav_samples(track_b)[0][:, 0]
    cut = mono[8192 : 8192 + 6144].copy().astype(np.int64)
    # DROPOUT inside the middle window: a whole-window uniform gain
    # would flip nothing (the fingerprint is gain-invariant in sign
    # structure — its documented property), and even a partial re-level
    # measured hamming 0 here (the halved bins scale together; only the
    # two boundary comparisons can flip and happened not to) — a
    # silenced run reshapes bin energies relative to each other and
    # flips the window's bits (measured 69)
    cut[2048 + 500 : 2048 + 1500] = 0
    rows_a = audio_containment_pairs(
        _frame(spark, [(1, _wav_of(cut))]),
        _frame(spark, [(100, track_b)]),
        window_frames=2048, max_hamming=0, min_matches=2,
    ).collect()
    assert [(r.track_id, r.offset, r.n_matched) for r in rows_a] == [(100, 4, 2)]


def test_containment_core_guards_and_struct_ids(spark):
    # the core refuses a meaningless vote threshold...
    sigs = spark.createDataFrame(
        [(1, 0, [0] * 64)], "doc_id long, idx int, bits array<int>"
    )
    with pytest.raises(ValueError, match="min_matches"):
        frame_signature_containment(sigs, sigs, min_matches=0, n_bits=64)
    # ...and the banding recall guard carries through verbatim
    with pytest.raises(ValueError, match="bands"):
        frame_signature_containment(
            sigs, sigs, max_hamming=16, bands=16, n_bits=64
        )


def test_audio_landmark_mode_catches_misaligned_cut(spark):
    """r12: the alignment gap closed at the batch level — the SAME cut
    the hop-mode contract pins as missed (arbitrary sample offset) is
    caught exactly by landmark mode, with offset = the cut position in
    sample frames. Pinned alongside: the landmark detector is locally
    deterministic (interior landmarks shift-invariant) and the periodic
    sawtooth yields no landmarks (the documented tone caveat)."""
    from beeper_matric_etl_tool_spark.ext.media_subseq import (
        _landmark_positions,
    )

    rs = np.random.RandomState(7)
    track = np.int64(rs.randint(-32768, 32768, 40_000))
    other = np.int64(np.random.RandomState(11).randint(-32768, 32768, 40_000))
    cut = 8001  # NOT hop-aligned for any power-of-two hop

    # detector: interior landmarks are exactly the track's, shifted
    lms_t = _landmark_positions(track, 300, 2048)
    lms_c = [q + cut for q in _landmark_positions(track[cut : cut + 6144], 300, 2048)]
    assert len(set(lms_c) & set(lms_t)) >= 2
    # the periodic saw's equal wrap peaks suppress each other
    saw_mono = xmm._wav_samples(xmm.make_saw_wav(40_000, seed=2))[0][:, 0]
    assert len(_landmark_positions(saw_mono.astype(np.int64), 300, 2048)) <= 1

    clips = _frame(spark, [(1, _wav_of(track[cut : cut + 6144]))])
    tracks = _frame(spark, [(100, _wav_of(track)), (101, _wav_of(other))])

    # hop mode misses (the r11-pinned contract)...
    assert (
        audio_containment_pairs(
            clips, tracks, window_frames=2048, max_hamming=0, min_matches=2
        ).count()
        == 0
    )
    # ...landmark mode catches, offset in exact sample frames
    rows = audio_containment_pairs(
        clips, tracks, window_frames=2048, max_hamming=0, min_matches=2,
        landmark_spacing=300,
    ).collect()
    assert len(rows) == 1
    assert (rows[0].clip_id, rows[0].track_id, rows[0].offset) == (1, 100, cut)
    assert rows[0].max_unit_hamming == 0 and rows[0].n_matched >= 2
