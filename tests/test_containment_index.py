"""Persisted containment index (ext/containment_index.py): unit-level
signatures with the build/probe/append lifecycle — decode the track
corpus ONCE at build, decode only the probe clips at probe (no track
payload in any probe plan), staged appends replay-safe — plus the
streaming screen (streaming/containment.py) and the landmark-anchored
audio mode that catches MIS-ALIGNED cuts the hop mode documents as
missed."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext import multimodal as xmm
from beeper_matric_etl_tool_spark.ext.containment_index import (
    append_containment_index,
    append_containment_index_signatures,
    build_containment_index,
    compact_containment_index,
    containment_against_index,
    containment_signatures_against_index,
    read_meta,
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


def _noise_avi(n_frames: int, w: int, h: int, seed: int) -> bytes:
    """Pseudo-random frames — temporally NON-degenerate, unlike the
    gradient generator whose per-frame additive offsets mostly cancel
    in the dHash's column differences (structural cross-offset
    coincidences at any width, seed-dependent)."""
    rs = np.random.RandomState(seed)
    return xmm._encode_avi(
        rs.randint(0, 256, (n_frames, h, w, 3)).astype(np.uint8), fps=12
    )


def _noise(n: int, seed: int) -> np.ndarray:
    """Deterministic transient-rich int16 signal — landmark-friendly
    (the closed-form sawtooth's equal wrap peaks tie each other out,
    the documented periodic-content caveat)."""
    return np.int64(np.random.RandomState(seed).randint(-32768, 32768, n))


@pytest.fixture()
def tracks_on_disk(spark, tmp_path):
    """Track corpus WRITTEN TO PARQUET and read back, so a track payload
    scan would be identifiable in probe plans."""
    path = str(tmp_path / "tracks")
    _frame(
        spark,
        [
            (100, xmm.make_gradient_avi(40, 16, 60, seed=3)),
            (101, xmm.make_gradient_avi(40, 16, 60, seed=4)),
        ],
    ).write.parquet(path)
    return spark.read.parquet(path)


def test_video_build_probe_decode_free(spark, tmp_path, tracks_on_disk):
    idx = str(tmp_path / "cidx")
    # production width: at 256 bits the synthetic gradient's coarse
    # 64-bit frame-hash coincidences (second offsets at hamming 0 —
    # see test_media_subseq's noise note) do not occur
    build_containment_index(
        tracks_on_disk, idx, kind="video", stride=1, max_hamming=0
    )
    meta = read_meta(idx)
    assert (meta["kind"], meta["n_bits"], meta["stride"]) == ("video", 256, 1)

    src_frames, _ = xmm._avi_frames(xmm.make_gradient_avi(40, 16, 60, seed=3))
    clip = xmm._encode_avi(src_frames[20:32])  # frames [20, 32) of track 100
    probes = _frame(spark, [(1, clip)])
    hits = containment_against_index(probes, spark, idx, min_matches=5)
    rows = hits.collect()
    assert [
        (r.clip_id, r.track_id, r.offset, r.n_matched, r.max_unit_hamming)
        for r in rows
    ] == [(1, 100, 20, 12, 0)]

    # plan pin (the test_media_index.py standard): the probe decoded the
    # CLIP at call time into the checkpoint; the executed plan holds no
    # Python stage and NO payload column — the track side contributes a
    # unit-signature scan only
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "payload:binary" not in plan
    assert "bits" in plan

    # the signature-level probe is decode-free end to end: feeding the
    # SAME clip units back yields identical votes with no Python stage
    from beeper_matric_etl_tool_spark.ext.containment_index import (
        _unit_signatures,
    )

    clip_sigs = _unit_signatures(probes, meta).localCheckpoint(eager=True)
    hits2 = containment_signatures_against_index(
        clip_sigs, spark, idx, min_matches=5
    )
    assert sorted(map(tuple, hits2.collect())) == sorted(map(tuple, rows))


def test_scaled_stride_and_auto(spark, tmp_path, tracks_on_disk):
    from beeper_matric_etl_tool_spark.ext.media_subseq import (
        scaled_stride_for,
        video_frame_signatures,
    )

    # the computed rule: one signature per second; 2h@24fps -> 7200 rows
    assert scaled_stride_for(24) == 24
    assert scaled_stride_for(0.5) == 1
    assert (172_800 + 23) // scaled_stride_for(24) == 7200
    with pytest.raises(ValueError, match="positive"):
        scaled_stride_for(0)

    # 'auto' resolves per payload from the container's frame duration:
    # the 12 fps test AVIs stride at 12 -> ceil(60/12) = 5 units each,
    # with start = true source frame numbers
    sigs = video_frame_signatures(tracks_on_disk, n_bits=64, stride="auto")
    per_doc = (
        sigs.filter(F.col("error").isNull())
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("start").alias("mx"))
        .collect()
    )
    assert {(r.doc_id, r.n, r.mx) for r in per_doc} == {
        (100, 5, 48),
        (101, 5, 48),
    }

    # an auto-stride INDEX detects a second-aligned cut (stride divides
    # the offset) at the stride-unit offset
    idx = str(tmp_path / "cidx_auto")
    build_containment_index(
        tracks_on_disk, idx, kind="video", n_bits=64, max_hamming=0
    )
    assert read_meta(idx)["stride"] == "auto"
    src_frames, _ = xmm._avi_frames(xmm.make_gradient_avi(40, 16, 60, seed=3))
    clip = xmm._encode_avi(src_frames[24:60], fps=12)  # cut at 2 s exactly
    rows = containment_against_index(
        _frame(spark, [(1, clip)]), spark, idx, min_matches=3
    ).collect()
    assert [(r.track_id, r.offset, r.n_matched) for r in rows] == [(100, 2, 3)]


def test_staged_append_replay_exclusion_compact(spark, tmp_path, tracks_on_disk):
    import os

    idx = str(tmp_path / "cidx")
    build_containment_index(
        tracks_on_disk, idx, kind="video", stride=1, max_hamming=0
    )
    new_track = _noise_avi(60, 40, 16, seed=7)
    append_containment_index(_frame(spark, [(200, new_track)]), idx, batch_id=7)

    src_frames, _ = xmm._avi_frames(new_track)
    clip = xmm._encode_avi(src_frames[10:22])
    probes = _frame(spark, [(1, clip)])
    rows = containment_against_index(probes, spark, idx, min_matches=5).collect()
    assert [(r.track_id, r.offset) for r in rows] == [(200, 10)]
    # the replay discipline: excluding batch 7 hides its tracks
    assert (
        containment_against_index(
            probes, spark, idx, min_matches=5, exclude_batch=7
        ).count()
        == 0
    )

    # replaying the staged append REPLACES batch 7 instead of duplicating
    units = spark.read.parquet(os.path.join(idx, "unit_signatures"))
    n_before = units.count()
    append_containment_index(_frame(spark, [(200, new_track)]), idx, batch_id=7)
    units = spark.read.parquet(os.path.join(idx, "unit_signatures"))
    assert units.count() == n_before
    assert units.filter(F.col("ingest_batch") == 7).count() == 60

    # compaction folds batches (preserve_last shields the newest staged
    # partition); verdicts unchanged
    append_containment_index(
        _frame(spark, [(300, _noise_avi(60, 40, 16, seed=8))]),
        idx,
        batch_id=9,
    )
    counts = compact_containment_index(spark, idx)
    assert counts == {"unit_signatures": n_before + 60}
    parts = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(idx, "unit_signatures"))
        if d.startswith("ingest_batch=")
    }
    assert parts == {-1, 9}  # batch 7 folded, newest staged preserved
    rows2 = containment_against_index(probes, spark, idx, min_matches=5).collect()
    assert [(r.track_id, r.offset) for r in rows2] == [(200, 10)]


def test_append_signatures_width_asserted_in_plan(spark, tmp_path, tracks_on_disk):
    from beeper_matric_etl_tool_spark.ext.media_subseq import (
        video_frame_signatures,
    )

    idx = str(tmp_path / "cidx")
    build_containment_index(
        tracks_on_disk, idx, kind="video", n_bits=64, stride=1
    )
    wrong = video_frame_signatures(
        _frame(spark, [(5, xmm.make_gradient_avi(40, 16, 24, seed=1))]),
        n_bits=256,
        stride=1,
    ).filter(F.col("error").isNull())
    with pytest.raises(Exception, match="width mismatch"):
        append_containment_index_signatures(wrong, idx, batch_id=3)


def test_landmark_index_catches_misaligned_cut(spark, tmp_path):
    """The r11 alignment gap CLOSED: a cut at an arbitrary (non-hop-
    aligned) sample offset is missed by the hop index — the documented
    contract — and CAUGHT exactly by the landmark index, with the
    offset reported as the exact cut position in sample frames."""
    t2, t5 = _noise(40_000, seed=2), _noise(40_000, seed=5)
    tracks = _frame(spark, [(100, _wav_of(t2)), (101, _wav_of(t5))])
    cut = 8001  # deliberately mis-aligned (not a multiple of any hop)
    clips = _frame(spark, [(1, _wav_of(t2[cut : cut + 6144]))])

    hop_idx = str(tmp_path / "hop")
    build_containment_index(
        tracks, hop_idx, kind="audio", window_frames=2048, max_hamming=0
    )
    assert (
        containment_against_index(clips, spark, hop_idx, min_matches=2).count()
        == 0
    )  # the hop-mode miss, pinned

    lm_idx = str(tmp_path / "lm")
    build_containment_index(
        tracks,
        lm_idx,
        kind="audio_landmark",
        window_frames=2048,
        landmark_spacing=300,
        max_hamming=0,
    )
    rows = containment_against_index(
        clips, spark, lm_idx, min_matches=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.clip_id, r.track_id, r.offset, r.max_unit_hamming) == (
        1,
        100,
        cut,
        0,
    )
    assert r.n_matched >= 2  # every shared interior landmark votes


def test_streaming_containment_screen(spark, tmp_path, tracks_on_disk):
    """The streaming screen: novel batches append decode-free; a later
    clip of a batch-1 track is attributed with the exact offset; a
    replayed batch re-derives identical rows (staged overwrite + own
    partition excluded)."""
    import os

    from beeper_matric_etl_tool_spark.streaming.containment import (
        containment_probe_batch_writer,
    )

    idx = str(tmp_path / "cidx")
    build_containment_index(
        _frame(spark, [(100, xmm.make_gradient_avi(40, 16, 60, seed=3))]),
        idx,
        kind="video",
        stride=1,
        max_hamming=0,
    )
    hits_dir = str(tmp_path / "hits")
    write = containment_probe_batch_writer(
        idx, hits_dir, min_matches=5, append_novel=True
    )

    # batch 1: a novel track -> no hit partition written (an empty
    # dynamic overwrite would be unreadable), units appended under
    # batch 1
    from beeper_matric_etl_tool_spark import sinks

    novel = _noise_avi(60, 40, 16, seed=9)
    write(_frame(spark, [(500, novel)]), 1)
    assert not sinks.has_parquet(hits_dir)
    units = spark.read.parquet(os.path.join(idx, "unit_signatures"))
    assert units.filter(F.col("ingest_batch") == 1).count() == 60

    # batch 2: a clip cut from the batch-1 track -> attributed, and NOT
    # appended (hit docs keep the lake single-sourced)
    src_frames, _ = xmm._avi_frames(novel)
    write(_frame(spark, [(600, xmm._encode_avi(src_frames[30:42]))]), 2)
    h2 = spark.read.parquet(hits_dir).filter(F.col("ingest_batch") == 2)
    assert [
        (r.clip_id, r.track_id, r.offset, r.n_matched) for r in h2.collect()
    ] == [(600, 500, 30, 12)]
    units = spark.read.parquet(os.path.join(idx, "unit_signatures"))
    assert units.filter(F.col("ingest_batch") == 2).count() == 0

    # replay batch 2: identical rows, no duplication anywhere
    write(_frame(spark, [(600, xmm._encode_avi(src_frames[30:42]))]), 2)
    h2r = spark.read.parquet(hits_dir).filter(F.col("ingest_batch") == 2)
    assert h2r.count() == 1
    assert (
        spark.read.parquet(os.path.join(idx, "unit_signatures")).count()
        == units.count()
    )


def test_build_guards(spark, tmp_path, tracks_on_disk):
    idx = str(tmp_path / "cidx")
    with pytest.raises(ValueError, match="kind"):
        build_containment_index(tracks_on_disk, idx, kind="text")
    with pytest.raises(ValueError, match="window_frames"):
        build_containment_index(tracks_on_disk, idx, kind="audio")
    with pytest.raises(ValueError, match="landmark_spacing"):
        build_containment_index(
            tracks_on_disk, idx, kind="audio_landmark", window_frames=2048
        )
    with pytest.raises(FileNotFoundError, match="no _META.json"):
        read_meta(str(tmp_path / "nowhere"))


def test_video_landmark_mode_catches_any_offset(spark, tmp_path):
    """r12: scene-change anchors close the stride contract's
    divisibility gap — a cut at a frame offset the auto stride (12)
    does NOT divide is missed by the strided index and caught exactly
    by the landmark index, with the offset in source frames."""
    track = _noise_avi(60, 40, 16, seed=21)
    other = _noise_avi(60, 40, 16, seed=22)
    frames, _ = xmm._avi_frames(track)
    cut = 23  # not divisible by the 12-fps auto stride
    clip = xmm._encode_avi(frames[cut : cut + 30], fps=12)
    tracks = _frame(spark, [(100, track), (101, other)])
    clips = _frame(spark, [(1, clip)])

    strided = str(tmp_path / "strided")
    build_containment_index(tracks, strided, kind="video", max_hamming=0)
    assert (
        containment_against_index(clips, spark, strided, min_matches=1).count()
        == 0
    )  # stride 12 samples disjoint source frames at offset 23

    lm = str(tmp_path / "lm")
    build_containment_index(
        tracks, lm, kind="video_landmark", landmark_spacing=3, max_hamming=0
    )
    rows = containment_against_index(clips, spark, lm, min_matches=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.clip_id, r.track_id, r.offset, r.max_unit_hamming) == (
        1,
        100,
        cut,
        0,
    )
    assert r.n_matched >= 2

    # the batch entry's landmark mode agrees
    batch = {
        (r.clip_id, r.track_id, r.offset)
        for r in video_containment_pairs_lm(clips, tracks).collect()
    }
    assert (1, 100, cut) in batch


def video_containment_pairs_lm(clips, tracks):
    from beeper_matric_etl_tool_spark.ext.media_subseq import (
        video_containment_pairs,
    )

    return video_containment_pairs(
        clips, tracks, max_hamming=0, min_matches=2, landmark_spacing=3
    )


def test_streaming_containment_screen_e2e(spark, tmp_path):
    """Real readStream -> foreachBatch run of the containment screen:
    batch 0's novel track appends decode-free; batch 1's clips are
    attributed to BOTH the bootstrap track and the streamed-in track at
    their exact offsets; the checkpoint-binding gate rejects a fresh
    checkpoint against the now-staged index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beeper_matric_etl_tool_spark.streaming.containment import (
        start_containment_probe_stream,
    )

    seed_track = _noise_avi(60, 40, 16, seed=31)
    idx = str(tmp_path / "cidx")
    build_containment_index(
        _frame(spark, [(100, seed_track)]), idx, kind="video", stride=1,
        max_hamming=0,
    )

    src = tmp_path / "src"
    src.mkdir()
    hits_dir = str(tmp_path / "hits")

    def emit(q, name, rows):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        pq.write_table(t, str(src / name))
        q.processAllAvailable()

    stream = spark.readStream.schema("doc_id long, payload binary").parquet(
        str(src)
    )
    q = start_containment_probe_stream(
        stream, idx, hits_dir, str(tmp_path / "ckpt"),
        min_matches=5, append_novel=True,
    )
    try:
        novel = _noise_avi(60, 40, 16, seed=32)
        emit(q, "b0.parquet", [(500, novel)])  # novel -> appended, no hits

        seed_frames, _ = xmm._avi_frames(seed_track)
        novel_frames, _ = xmm._avi_frames(novel)
        emit(
            q,
            "b1.parquet",
            [
                (600, xmm._encode_avi(seed_frames[7:19])),    # bootstrap hit
                (601, xmm._encode_avi(novel_frames[30:42])),  # streamed hit
            ],
        )
        h = {
            r.clip_id: (r.track_id, r.offset, r.n_matched)
            for r in spark.read.parquet(hits_dir).collect()
        }
        assert h == {600: (100, 7, 12), 601: (500, 30, 12)}
        # hit docs were NOT appended; the novel track was (batch 0)
        import os

        units = spark.read.parquet(os.path.join(idx, "unit_signatures"))
        assert set(
            r.doc_id for r in units.select("doc_id").distinct().collect()
        ) == {100, 500}
    finally:
        q.stop()

    # binding gate: a FRESH checkpoint against the staged index fails
    with pytest.raises(Exception, match="checkpoint"):
        start_containment_probe_stream(
            stream, idx, hits_dir, str(tmp_path / "ckpt2")
        )


def test_bands_hint_raises_on_unbandable_radius():
    """r13 ADVICE fix: a pinned radius that would force 1-bit bands
    (bands = n_bits — every band value collides, probes degrade to a
    quadratic candidate join) raises at BUILD, the family's
    raise-not-clamp policy, instead of silently freezing the blow-up."""
    from beeper_matric_etl_tool_spark.ext.containment_index import (
        _bands_hint_for,
    )

    assert _bands_hint_for(256, None) == 16   # default radius 15 -> 16 bands
    assert _bands_hint_for(256, 15) == 16
    assert _bands_hint_for(256, 127) == 128   # largest bandable radius
    with pytest.raises(ValueError, match="1-bit bands"):
        _bands_hint_for(256, 200)
    with pytest.raises(ValueError, match="1-bit bands"):
        _bands_hint_for(64, 63)


def test_auto_stride_distribution_recorded_and_drift_warns(
    spark, tmp_path, tracks_on_disk
):
    """r13 ADVICE fix: stride='auto' resolves per payload from the
    container's frame duration, so a probe re-encoded at a different
    fps derives a stride the index has no units for and silently never
    votes. The build now freezes the RESOLVED stride distribution in
    meta; the decode probe warns on drift; a decode-path append of a
    new-fps track merges its stride so future probes at that fps are
    legitimate."""
    import warnings

    idx = str(tmp_path / "cidx_strides")
    build_containment_index(
        tracks_on_disk, idx, kind="video", n_bits=64, max_hamming=0
    )
    # the 12 fps test tracks resolve stride 12, recorded at build
    assert read_meta(idx)["resolved_strides"] == [12]

    src_frames, _ = xmm._avi_frames(xmm.make_gradient_avi(40, 16, 60, seed=3))
    # probe at the indexed frame duration: silent, and it votes
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        rows = containment_against_index(
            _frame(spark, [(1, xmm._encode_avi(src_frames[24:60], fps=12))]),
            spark,
            idx,
            min_matches=3,
        ).collect()
    assert [(r.track_id, r.offset) for r in rows] == [(100, 2)]

    # the SAME cut re-encoded at 6 fps derives stride 6 -> the documented
    # undetectable miss is now a warning naming both stride sets
    clip6 = _frame(spark, [(2, xmm._encode_avi(src_frames[24:60], fps=6))])
    with pytest.warns(UserWarning, match=r"stride\(s\) \[6\].*\[12\]"):
        rows6 = containment_against_index(
            clip6, spark, idx, min_matches=3
        ).collect()
    assert rows6 == []

    # a staged decode-path append of a 6 fps track merges its resolved
    # stride into meta — the same probe is now legitimate (and silent)
    rs = np.random.RandomState(11)
    track6 = xmm._encode_avi(
        rs.randint(0, 256, (36, 16, 40, 3)).astype(np.uint8), fps=6
    )
    append_containment_index(_frame(spark, [(200, track6)]), idx, batch_id=0)
    assert read_meta(idx)["resolved_strides"] == [6, 12]
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        containment_against_index(clip6, spark, idx, min_matches=3).collect()


def test_read_only_containment_screen_coexists_with_writer(spark, tmp_path):
    """r13 read-only screen mode on the media plane: an index ALREADY
    BOUND to a writer stream's checkpoint (with staged batches) accepts
    a read-only screen — no binding conflict, because the screen binds
    its own hits_dir instead. The read-only probe sees the WHOLE index
    (bootstrap AND the writer's staged batch — its own batch id 0 is
    NOT excluded even though the writer also owns a batch 0), and the
    index gains no partitions from the screen."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from beeper_matric_etl_tool_spark.streaming.containment import (
        containment_probe_batch_writer,
        start_containment_probe_stream,
    )

    seed_track = _noise_avi(60, 40, 16, seed=51)
    staged_track = _noise_avi(60, 40, 16, seed=52)
    idx = str(tmp_path / "cidx_ro")
    build_containment_index(
        _frame(spark, [(100, seed_track)]), idx, kind="video", stride=1,
        max_hamming=0,
    )
    # a writer stream owns the index: binding marker + a staged batch 0
    import json

    with open(os.path.join(idx, "_STREAM.json"), "w") as fh:
        json.dump({"checkpoint_dir": str(tmp_path / "writer_ckpt")}, fh)
    append_containment_index(
        _frame(spark, [(200, staged_track)]), idx, batch_id=0
    )

    with pytest.raises(ValueError, match="read_only"):
        containment_probe_batch_writer(
            idx, str(tmp_path / "h"), append_novel=True, read_only=True
        )

    src = tmp_path / "ro_src"
    src.mkdir()
    hits_dir = str(tmp_path / "ro_hits")
    stream = spark.readStream.schema("doc_id long, payload binary").parquet(
        str(src)
    )
    q = start_containment_probe_stream(
        stream, idx, hits_dir, str(tmp_path / "ro_ckpt"),
        min_matches=5, read_only=True,
    )
    try:
        seed_frames, _ = xmm._avi_frames(seed_track)
        staged_frames, _ = xmm._avi_frames(staged_track)
        t = pa.table(
            {
                "doc_id": pa.array([600, 601], pa.int64()),
                "payload": pa.array(
                    [
                        xmm._encode_avi(seed_frames[7:19]),
                        xmm._encode_avi(staged_frames[30:42]),
                    ],
                    pa.binary(),
                ),
            }
        )
        pq.write_table(t, str(src / "b0.parquet"))
        q.processAllAvailable()
        h = {
            r.clip_id: (r.track_id, r.offset, r.n_matched)
            for r in spark.read.parquet(hits_dir).collect()
        }
        # this is the screen's OWN batch 0 — and the writer's staged
        # batch 0 track is still visible to it (no exclusion)
        assert h == {600: (100, 7, 12), 601: (200, 30, 12)}
    finally:
        q.stop()

    units = spark.read.parquet(os.path.join(idx, "unit_signatures"))
    assert {
        r.doc_id for r in units.select("doc_id").distinct().collect()
    } == {100, 200}
    # the writer's binding is untouched
    with open(os.path.join(idx, "_STREAM.json")) as fh:
        assert json.load(fh)["checkpoint_dir"] == str(tmp_path / "writer_ckpt")
