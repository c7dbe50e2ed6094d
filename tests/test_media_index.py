"""Persisted media-signature index (ext/media_index.py): the steady-state
media near-dup lifecycle — decode the lake ONCE at build, decode only the
new batch at probe (no reference decode in any probe plan), staged
appends replay-safe — the media twin of test_dedup_index.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext import multimodal as xmm
from beeper_matric_etl_tool_spark.ext.media_index import (
    append_media_index,
    build_media_index,
    media_dedup_against_index,
    read_meta,
)


def _media_frame(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )


REF_IMG = xmm.make_gradient_bmp(36, 32, seed=1)
REF_WAV = xmm.make_saw_wav(3300, seed=2)
REF_AVI = xmm.make_gradient_avi(40, 16, 24, seed=3)


@pytest.fixture()
def ref_on_disk(spark, tmp_path):
    """Reference media WRITTEN TO PARQUET and read back, so a reference
    payload scan would be identifiable in probe plans."""
    path = str(tmp_path / "ref_media")
    _media_frame(
        spark, [(1, REF_IMG), (2, REF_WAV), (3, REF_AVI)]
    ).write.parquet(path)
    return spark.read.parquet(path)


def test_probe_decodes_only_the_batch(spark, tmp_path, ref_on_disk):
    idx = str(tmp_path / "midx")
    build_media_index(ref_on_disk, idx)
    assert read_meta(idx)["image_method"] == "dhash"

    batch = _media_frame(
        spark,
        [
            (101, REF_IMG),  # exact dup of indexed image 1
            (102, xmm.make_saw_wav(3300, seed=2, edit=(1022, 1622))),  # near dup of 2
            (103, xmm.make_gradient_avi(40, 16, 24, seed=7)),  # fresh video
            (104, b"not media at all, just text bytes"),  # undecodable
        ],
    )
    survivors, dropped = media_dedup_against_index(batch, spark, idx)

    drops = {r.doc_id: r for r in dropped.collect()}
    assert set(drops) == {101, 102}
    assert drops[101].modality == "image" and drops[101].ref_id == 1
    assert drops[101].hamming == 0
    assert drops[102].modality == "audio" and drops[102].ref_id == 2
    assert 0 < drops[102].hamming <= 12
    # fresh video survives; the undecodable row survives the PROBE (it
    # has no signature to compare — dropping it is curate_media's job)
    assert {r.doc_id for r in survivors.collect()} == {103, 104}

    # plan pin: NO decode stage and NO payload scan downstream of the
    # probe — the batch decoded exactly once (at probe call, into the
    # checkpoint) and the index side contributes a signature-only scan
    for df in (survivors, dropped):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan
        assert "payload:binary" not in plan  # no parquet payload read
    dplan = dropped._jdf.queryExecution().executedPlan().toString()
    assert "bits:array<int>" in dplan  # ...the signatures are read instead


def test_append_staged_replay_and_exclusion(spark, tmp_path, ref_on_disk):
    idx = str(tmp_path / "midx")
    build_media_index(ref_on_disk, idx, sig_bits=64)

    accepted = _media_frame(spark, [(50, xmm.make_gradient_bmp(36, 32, seed=4))])
    append_media_index(accepted, idx, batch_id=7)

    # a near-dup of the APPENDED image is caught only via batch 7...
    batch2 = _media_frame(
        spark, [(201, xmm.make_gradient_bmp(36, 32, seed=4, invert_col=18))]
    )
    _, dropped = media_dedup_against_index(batch2, spark, idx, max_hamming=15)
    d = dropped.collect()
    assert len(d) == 1 and d[0].ref_id == 50 and 0 < d[0].hamming <= 15
    # ...and excluding batch 7 (the replay discipline) hides it
    s_ex, d_ex = media_dedup_against_index(
        batch2, spark, idx, max_hamming=15, exclude_batch=7
    )
    assert d_ex.count() == 0 and s_ex.count() == 1

    # replaying the staged append REPLACES batch 7 instead of duplicating
    append_media_index(accepted, idx, batch_id=7)
    import os

    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert sigs.filter(F.col("ingest_batch") == 7).count() == 1
    assert sigs.count() == 4  # 3 bootstrap + 1 staged

    # modality is part of the banding key: an AUDIO clip can never match
    # an indexed image even at max_hamming = bands-1
    probe_far = _media_frame(spark, [(301, xmm.make_saw_wav(3300, seed=4))])
    _, d_far = media_dedup_against_index(
        probe_far, spark, idx, max_hamming=15, bands=16
    )
    assert d_far.filter(F.col("modality") != "audio").count() == 0


def test_corpus_estimate_sized_index(spark, tmp_path, ref_on_disk):
    """The corpus-sized build rule wired end-to-end: build with an
    object-count estimate and the width AND probe-time bands derive from
    `scaled_media_banding_for` — frozen in meta, defaulted by every
    probe entry, nothing hand-picked. Passing both an estimate and an
    explicit width raises (one source of truth for a frozen param)."""
    idx = str(tmp_path / "midx")
    with pytest.raises(ValueError, match="not both"):
        build_media_index(ref_on_disk, idx, sig_bits=64, corpus_estimate=5000)
    # pinned radius: 5000 docs at max_hamming=15 -> width >= 17 -> (324, 18),
    # and the pinned radius is stored so probes resolve the SAME value
    build_media_index(ref_on_disk, idx, corpus_estimate=5000, max_hamming=15)
    meta = read_meta(idx)
    assert (meta["n_bits"], meta["bands_hint"]) == (324, 18)
    assert meta["corpus_estimate"] == 5000
    assert meta["max_hamming_hint"] == 15

    # coupled default: (256, 16) certifies 5000 docs via the composite key
    idx_c = str(tmp_path / "midx_coupled")
    build_media_index(ref_on_disk, idx_c, corpus_estimate=5000)
    meta_c = read_meta(idx_c)
    assert (meta_c["n_bits"], meta_c["bands_hint"]) == (256, 16)
    assert "max_hamming_hint" not in meta_c

    # explicit non-256 width: the bands hint is a DIVISOR that keeps the
    # width-coupled radius un-capped (a fixed 16 would make the index
    # unusable — 324 % 16 != 0; the r11 review caught this)
    idx_e = str(tmp_path / "midx_explicit")
    build_media_index(ref_on_disk, idx_e, sig_bits=324)
    meta_e = read_meta(idx_e)
    assert meta_e["bands_hint"] == 27 and 324 % 27 == 0
    assert max(12, 15 * 324 // 256) <= meta_e["bands_hint"] - 1
    # an all-default probe against it runs (the frozen config is usable)
    _, d_e = media_dedup_against_index(
        _media_frame(spark, [(201, REF_IMG)]), spark, idx_e
    )
    assert d_e.count() == 1

    # probes default bands from the hint and thresholds from the width;
    # exact + edited near-dups drop against the estimate-sized index
    batch = _media_frame(
        spark,
        [
            (101, REF_IMG),
            (102, xmm.make_gradient_bmp(36, 32, seed=1, invert_col=18)),
            (103, xmm.make_gradient_bmp(36, 32, seed=5)),  # fresh
        ],
    )
    survivors, dropped = media_dedup_against_index(batch, spark, idx)
    d = {r.doc_id: r for r in dropped.collect()}
    assert set(d) == {101, 102} and d[101].hamming == 0
    assert {r.doc_id for r in survivors.collect()} == {103}


def test_witness_is_closest_match(spark, tmp_path):
    """The dropped-row witness is the CLOSEST indexed match (minimum
    hamming, ties by smallest ref_id) — a doc dropped because of an
    exact dup is never recorded with a farther match's distance just
    because the farther match has a smaller id."""
    base = xmm.make_gradient_bmp(36, 32, seed=3)
    near = xmm.make_gradient_bmp(36, 32, seed=3, invert_col=18)
    idx = str(tmp_path / "midx")
    # ref 1 = the NEAR variant (hamming > 0 vs the probe, smallest id);
    # ref 2 = the EXACT copy (hamming 0, larger id)
    build_media_index(_media_frame(spark, [(1, near), (2, base)]), idx)

    _, dropped = media_dedup_against_index(
        _media_frame(spark, [(100, base)]), spark, idx
    )
    (d,) = dropped.collect()
    assert (d.ref_id, d.hamming) == (2, 0)  # the copy, not the lower id

    # ties on hamming break to the smallest ref_id (deterministic audit)
    idx2 = str(tmp_path / "midx2")
    build_media_index(_media_frame(spark, [(7, base), (4, base)]), idx2)
    (_, dropped2) = media_dedup_against_index(
        _media_frame(spark, [(100, base)]), spark, idx2
    )
    (d2,) = dropped2.collect()
    assert (d2.ref_id, d2.hamming) == (4, 0)


def test_media_index_guards(spark, tmp_path, ref_on_disk):
    idx = str(tmp_path / "midx")
    with pytest.raises(ValueError, match="image_method"):
        build_media_index(ref_on_disk, idx, image_method="phash9000")
    with pytest.raises(FileNotFoundError, match="_META"):
        read_meta(str(tmp_path / "nope"))
    build_media_index(ref_on_disk, idx)
    with pytest.raises(ValueError, match="reserved"):
        append_media_index(ref_on_disk, idx, batch_id=-1)
    batch = _media_frame(spark, [(101, REF_IMG)])
    with pytest.raises(ValueError, match="bands"):
        media_dedup_against_index(batch, spark, idx, max_hamming=16, bands=16)


def test_continuous_media_curation_stream(spark, tmp_path):
    """The streaming media funnel end-to-end: per batch, curate_media
    decides within-batch (undecodable + within-batch near-dup), the
    index probe drops cross-batch duplicates, and survivors extend the
    corpus AND the index so the NEXT batch sees them; replaying a batch
    overwrites its own staged partitions with identical rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beeper_matric_etl_tool_spark.ext.media_index import build_media_index
    from beeper_matric_etl_tool_spark.streaming.media_curation import (
        media_curation_batch_writer,
        start_media_curation_stream,
    )

    seed_img = xmm.make_gradient_bmp(36, 32, seed=9)
    idx = str(tmp_path / "midx")
    build_media_index(_media_frame(spark, [(0, seed_img)]), idx)

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    audit = str(tmp_path / "audit")

    img_a = xmm.make_gradient_bmp(36, 32, seed=1)
    batches = {}

    def emit(q, name, rows):
        batches[name] = rows
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
    dec = str(tmp_path / "decisions")
    q = start_media_curation_stream(
        stream, idx, out, str(tmp_path / "ckpt"), audit_dir=audit,
        decisions_dir=dec, max_hamming=15,
    )
    try:
        # batch 0: A fresh; a copy of the SEED (index drop); garbage
        # (funnel drop); a within-batch near-dup of A (funnel drop)
        emit(q, "b0.parquet", [
            (1, img_a),
            (2, seed_img),
            (3, b"not media, just bytes"),
            (4, xmm.make_gradient_bmp(36, 32, seed=1, invert_col=18)),
        ])
        assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}

        # batch 1: a copy of batch 0's survivor A (cross-batch drop via
        # the index append), plus a fresh audio clip
        emit(q, "b1.parquet", [
            (5, img_a),
            (6, xmm.make_saw_wav(3300, seed=3)),
        ])
        assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 6}

        audits = {
            r.batch_id: (r.n_in, r.n_kept, r.n_drop_index)
            for r in spark.read.parquet(audit).collect()
        }
        assert audits[0] == (4, 1, 1) and audits[1] == (2, 1, 1)

        # per-doc decisions: every ingested doc accounted for, index
        # drops override their funnel keep and carry the witness
        d = {r.doc_id: r for r in spark.read.parquet(dec).collect()}
        assert set(d) == {1, 2, 3, 4, 5, 6}
        # the streaming audit's vocabulary is the published superset
        assert all(
            r.decision in xmm.MEDIA_STREAM_DECISIONS for r in d.values()
        )
        assert d[1].decision == "keep"
        assert d[2].decision == "drop:near_dup_index"
        assert (d[2].ref_id, d[2].hamming) == (0, 0)
        assert d[3].decision == "drop:undecodable"
        assert d[4].decision == "drop:near_dup" and d[4].cluster_id == 1
        assert d[5].decision == "drop:near_dup_index" and d[5].ref_id == 1
        assert d[6].decision == "keep"
        # r12: the persisted audit carries n_bytes, so the data card's
        # MASS axis composes with the streamed decisions directly
        card = {
            (r.modality, r.metric, r.bucket): r.n
            for r in xmm.media_report(
                spark.read.parquet(dec), include_mass=True
            ).collect()
        }
        assert card[("image", "mass_bytes", "keep")] == len(img_a)
        assert card[
            ("image", "mass_bytes", "drop:near_dup_index")
        ] == len(seed_img) + len(img_a)  # docs 2 and 5
    finally:
        q.stop()

    # REPLAY batch 1: same rows, same batch id — the probe excludes the
    # batch's own partition, decisions re-derive identically, and every
    # staged partition is replaced, not duplicated
    writer = media_curation_batch_writer(
        idx, out, audit, decisions_dir=dec, max_hamming=15
    )
    writer(_media_frame(spark, batches["b1.parquet"]), 1)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 6}
    # decisions replayed in place too: still one row per ingested doc
    assert spark.read.parquet(dec).count() == 6
    import os

    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert sigs.filter(F.col("ingest_batch") == 1).count() == 1
    audits = {
        r.batch_id: (r.n_in, r.n_kept, r.n_drop_index)
        for r in spark.read.parquet(audit).collect()
    }
    assert audits[1] == (2, 1, 1)


def test_streaming_funnel_single_decode(spark, tmp_path, monkeypatch):
    """Each payload decodes EXACTLY ONCE per micro-batch: the writer runs
    the funnel once (its per-leg checkpoints are the only decode), and
    the index probe + append consume the funnel's SIGNATURE frames —
    never a payload re-derivation. Spied by (a) counting funnel calls,
    (b) poisoning every payload-decoding entry the writer must not touch
    (`media_signatures`, the payload-level probe, the payload-level
    append), and (c) asserting the e2e decisions are unchanged."""
    from beeper_matric_etl_tool_spark.ext import media_index as midx
    from beeper_matric_etl_tool_spark.streaming import media_curation as mc

    idx = str(tmp_path / "midx")
    seed_img = xmm.make_gradient_bmp(36, 32, seed=9)
    build_media_index(_media_frame(spark, [(0, seed_img)]), idx)

    calls = {"funnel": 0}
    real_funnel = mc.curate_media_with_signatures

    def counting_funnel(*a, **kw):
        calls["funnel"] += 1
        return real_funnel(*a, **kw)

    def poisoned(*_a, **_kw):  # any payload re-decode fails the test
        raise AssertionError(
            "payload re-decoded outside the funnel — single-decode violated"
        )

    monkeypatch.setattr(mc, "curate_media_with_signatures", counting_funnel)
    monkeypatch.setattr(midx, "media_signatures", poisoned)
    monkeypatch.setattr(midx, "media_dedup_against_index", poisoned)
    monkeypatch.setattr(midx, "append_media_index", poisoned)

    writer = mc.media_curation_batch_writer(
        idx, str(tmp_path / "out"), decisions_dir=str(tmp_path / "dec"),
        max_hamming=15,
    )
    img_a = xmm.make_gradient_bmp(36, 32, seed=1)
    writer(
        _media_frame(
            spark,
            [
                (1, img_a),                     # fresh keep
                (2, seed_img),                  # index drop
                (3, b"garbage bytes"),          # funnel drop
                (4, xmm.make_saw_wav(3300, 5)), # fresh audio keep
            ],
        ),
        0,
    )
    assert calls["funnel"] == 1  # one funnel pass = one decode per payload
    out = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert out == {1, 4}
    dec = {r.doc_id: r.decision
           for r in spark.read.parquet(str(tmp_path / "dec")).collect()}
    assert dec == {
        1: "keep", 2: "drop:near_dup_index", 3: "drop:undecodable", 4: "keep",
    }
    # the appended signatures came from the funnel's frames and are
    # probe-able: a batch-1 copy of doc 1 drops against them
    writer2 = mc.media_curation_batch_writer(
        idx, str(tmp_path / "out"), decisions_dir=str(tmp_path / "dec"),
        max_hamming=15,
    )
    writer2(_media_frame(spark, [(10, img_a)]), 1)
    dec = {r.doc_id: r for r in
           spark.read.parquet(str(tmp_path / "dec")).collect()}
    assert dec[10].decision == "drop:near_dup_index" and dec[10].ref_id == 1


def test_streaming_cross_modal_gate(spark, tmp_path):
    """The index-scope re-encoded-still gate: a video whose frames match
    an INDEXED image drops as drop:near_dup_cross with the image as
    witness (zero extra decodes — the frames ride the funnel's signature
    relation); a within-batch still is caught by the funnel's gate; and
    replaying the batch is byte-stable."""
    import numpy as np

    from beeper_matric_etl_tool_spark.streaming.media_curation import (
        media_curation_batch_writer,
    )

    still = xmm.make_gradient_bmp(36, 32, seed=5)
    idx = str(tmp_path / "midx")
    build_media_index(_media_frame(spark, [(1, still)]), idx)

    frame_px = xmm._bmp_pixels(still)[:, :, :3]
    video_of_indexed = xmm._encode_avi(np.stack([frame_px] * 24), fps=12)
    batch_img = xmm.make_gradient_bmp(36, 32, seed=2)
    video_of_batch = xmm._encode_avi(
        np.stack([xmm._bmp_pixels(batch_img)[:, :, :3]] * 24), fps=12
    )
    fresh = xmm.make_gradient_avi(40, 16, 24, seed=3)

    out, dec = str(tmp_path / "out"), str(tmp_path / "dec")
    writer = media_curation_batch_writer(
        idx, out, decisions_dir=dec, max_hamming=15, cross_modal=True
    )
    rows = [
        (10, video_of_indexed),  # frames match the INDEXED image
        (11, batch_img),         # fresh image -> keep
        (12, video_of_batch),    # frames match the BATCH image (funnel gate)
        (13, fresh),             # fresh video -> keep
    ]
    writer(_media_frame(spark, rows), 0)

    d = {r.doc_id: r for r in spark.read.parquet(dec).collect()}
    assert d[10].decision == "drop:near_dup_cross"
    assert (d[10].ref_id, d[10].hamming) == (1, 0)  # the indexed still
    assert d[11].decision == "keep"
    assert d[12].decision == "drop:near_dup_cross"
    assert d[12].ref_id is None  # funnel-scope drop: no index witness
    assert d[13].decision == "keep"
    assert all(r.decision in xmm.MEDIA_STREAM_DECISIONS for r in d.values())
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {11, 13}

    # the appended index rows are the SIGNATURE_COLUMNS contract (no
    # frame_bits leak into the lake's schema)
    import os

    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert "frame_bits" not in sigs.columns
    assert sigs.filter(F.col("ingest_batch") == 0).count() == 2

    # replay: identical staged rows, no duplication
    writer(_media_frame(spark, rows), 0)
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {11, 13}
    assert spark.read.parquet(dec).count() == 4
    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert sigs.filter(F.col("ingest_batch") == 0).count() == 2

    # the media data card composes with the streaming audit unchanged
    card = {
        (r.modality, r.metric, r.bucket): r.n
        for r in xmm.media_report(spark.read.parquet(dec)).collect()
    }
    assert card[("video", "decision", "drop:near_dup_cross")] == 2
    assert card[("image", "decision", "keep")] == 1
    assert card[("video", "decision", "keep")] == 1


def test_append_signatures_width_guard(spark, tmp_path, ref_on_disk):
    """The decode-free append asserts the index's frozen width against
    each appended frame inside the write plan — a mismatched signature
    fails the job instead of silently poisoning banding selectivity."""
    from beeper_matric_etl_tool_spark.ext.media_index import (
        append_media_index_signatures,
        media_signatures,
    )

    idx = str(tmp_path / "midx")
    build_media_index(ref_on_disk, idx)  # frozen at the 256-bit default
    wrong = media_signatures(
        _media_frame(spark, [(9, xmm.make_gradient_bmp(36, 32, seed=2))]),
        n_bits=64,
    )
    with pytest.raises(Exception, match="width"):
        append_media_index_signatures(wrong, idx, batch_id=1)
    ok = media_signatures(
        _media_frame(spark, [(9, xmm.make_gradient_bmp(36, 32, seed=2))]),
        n_bits=256,
    )
    append_media_index_signatures(ok, idx, batch_id=1)
    import os

    sigs = spark.read.parquet(os.path.join(idx, "signatures"))
    assert sigs.filter(F.col("ingest_batch") == 1).count() == 1


def test_media_curation_writer_guards(spark, tmp_path, ref_on_disk):
    """Construction-time gates: non-index path, id-column mismatch with
    the frozen meta, fresh-checkpoint-vs-staged-index binding."""
    from beeper_matric_etl_tool_spark.ext.media_index import build_media_index
    from beeper_matric_etl_tool_spark.streaming.media_curation import (
        media_curation_batch_writer,
        start_media_curation_stream,
    )

    with pytest.raises(FileNotFoundError, match="_META"):
        media_curation_batch_writer(str(tmp_path / "noindex"), str(tmp_path / "o"))
    idx = str(tmp_path / "midx")
    build_media_index(ref_on_disk, idx)
    with pytest.raises(ValueError, match="id_col"):
        media_curation_batch_writer(idx, str(tmp_path / "o"), id_col="uid")
    with pytest.raises(ValueError, match="sig_bits"):
        media_curation_batch_writer(idx, str(tmp_path / "o"), sig_bits=64)
    # the image hash method is frozen in the index too — within-batch
    # dhash vs cross-batch ahash would decide on different signatures
    with pytest.raises(ValueError, match="image_method"):
        media_curation_batch_writer(
            idx, str(tmp_path / "o"), image_method="ahash"
        )
    assert media_curation_batch_writer(idx, str(tmp_path / "o")) is not None

    # checkpoint binding: a second stream with a DIFFERENT checkpoint
    # against the same index fails before starting
    (tmp_path / "srcdir").mkdir()
    stream = spark.readStream.schema("doc_id long, payload binary").parquet(
        str(tmp_path / "srcdir")
    )
    q = start_media_curation_stream(
        stream, idx, str(tmp_path / "out"), str(tmp_path / "ckpt1")
    )
    q.stop()
    with pytest.raises(ValueError, match="checkpoint"):
        start_media_curation_stream(
            stream, idx, str(tmp_path / "out"), str(tmp_path / "ckpt2")
        )


def test_compact_media_index_preserves_decisions(spark, tmp_path, ref_on_disk):
    """Compaction folds staged partitions into the bootstrap partition
    (preserve_last shields the highest staged batch), and probe
    decisions are identical before and after — the text index's
    small-file fix, shared core."""
    import os

    from beeper_matric_etl_tool_spark.ext.media_index import (
        build_media_index,
        compact_media_index,
    )

    idx = str(tmp_path / "midx")
    build_media_index(ref_on_disk, idx, sig_bits=64)
    append_media_index(
        _media_frame(spark, [(50, xmm.make_gradient_bmp(36, 32, seed=4))]),
        idx, batch_id=3,
    )
    append_media_index(
        _media_frame(spark, [(60, xmm.make_saw_wav(3300, seed=9))]),
        idx, batch_id=7,
    )

    batch = _media_frame(
        spark,
        [
            (201, xmm.make_gradient_bmp(36, 32, seed=4, invert_col=18)),
            (202, xmm.make_saw_wav(3300, seed=9, edit=(1022, 1622))),
            (203, xmm.make_gradient_avi(40, 16, 24, seed=8)),
        ],
    )
    before = sorted(
        tuple(r)
        for r in media_dedup_against_index(batch, spark, idx, max_hamming=15)[1].collect()
    )
    counts = compact_media_index(spark, idx)
    assert counts == {"signatures": 5}
    after = sorted(
        tuple(r)
        for r in media_dedup_against_index(batch, spark, idx, max_hamming=15)[1].collect()
    )
    assert after == before and len(before) == 2

    # preserve_last kept batch 7 un-folded; batch 3 folded into bootstrap
    parts = {
        d for d in os.listdir(os.path.join(idx, "signatures"))
        if d.startswith("ingest_batch=")
    }
    assert parts == {"ingest_batch=-1", "ingest_batch=7"}
    # ...so a REPLAY of batch 7 can still exclude its own rows
    _, d_ex = media_dedup_against_index(
        batch, spark, idx, max_hamming=15, exclude_batch=7
    )
    assert {r.doc_id for r in d_ex.collect()} == {201}

    # preserve_last=False folds everything (clean-stop mode)
    compact_media_index(spark, idx, preserve_last=False)
    parts = {
        d for d in os.listdir(os.path.join(idx, "signatures"))
        if d.startswith("ingest_batch=")
    }
    assert parts == {"ingest_batch=-1"}


def test_video_frames_probe_against_image_index(spark, tmp_path):
    """Cross-plane composition: a video whose frames re-encode an INDEXED
    image is caught by sampling its frames (`video_sample_frames` emits
    real standalone BMPs) and probing them against the image signatures —
    the 'is this clip built from known stills' check, pure composition of
    existing operators. A video of fresh frames probes clean."""
    import numpy as np

    from beeper_matric_etl_tool_spark.ext.media_index import (
        build_media_index,
        media_dedup_against_index,
    )

    # the indexed still, and a 12-frame video whose every frame IS it
    still = xmm.make_gradient_bmp(40, 16, seed=5)
    idx = str(tmp_path / "midx")
    build_media_index(_media_frame(spark, [(1, still)]), idx)  # 256 default

    frame_px = xmm._bmp_pixels(still)[:, :, :3]
    video_of_still = xmm._encode_avi(
        np.stack([frame_px] * 12), fps=12
    )
    fresh_video = xmm.make_gradient_avi(40, 16, 12, seed=8)

    vids = _media_frame(spark, [(10, video_of_still), (20, fresh_video)])
    frames = xmm.video_sample_frames(vids, n_samples=4)
    # frame rows become image payloads keyed by (video, frame) — a
    # synthetic probe id keeps the witness attributable
    probe = frames.filter(F.col("error").isNull()).select(
        (F.col("doc_id") * 1000 + F.col("frame_idx")).alias("doc_id"),
        "payload",
    )
    survivors, dropped = media_dedup_against_index(probe, spark, idx)
    hits = {r.doc_id // 1000 for r in dropped.collect()}
    assert hits == {10}  # every sampled frame of the re-encode matches...
    assert dropped.count() == 4 and dropped.filter(F.col("hamming") > 0).count() == 0
    # ...and the fresh video's frames all probe clean
    assert {r.doc_id // 1000 for r in survivors.collect()} == {20}


def test_media_search_ranked_variants(spark, tmp_path):
    """Bounded-radius ranked retrieval: the probe's variants come back
    closest-first (copy at hamming 0 = rank 1), capped at k, same
    modality only, deterministic tie-break; beyond-radius and
    cross-modality media never appear."""
    from beeper_matric_etl_tool_spark.ext.media_index import (
        build_media_index,
        media_search,
    )

    base = xmm.make_gradient_bmp(36, 32, seed=2)
    idx = str(tmp_path / "midx")
    # 64-bit width: the planted full-column edits sit at 6-12 there; at
    # 256 bits the same edit flips 13-23 bits (proportionally larger
    # footprint on the finer grid) and can exceed the 16-band radius
    build_media_index(
        _media_frame(
            spark,
            [
                (1, base),                                          # exact copy
                (2, xmm.make_gradient_bmp(36, 32, 2, invert_col=18)),  # near
                (3, xmm.make_gradient_bmp(36, 32, 2, invert_col=30)),  # near
                (4, xmm.make_gradient_bmp(36, 32, 5)),              # far image
                (5, xmm.make_saw_wav(3300, seed=2)),                # other plane
            ],
        ),
        idx,
        sig_bits=64,
    )
    probe = _media_frame(spark, [(100, base)])

    hits = media_search(probe, spark, idx, max_hamming=15, k=10).collect()
    ranked = [(r.ref_id, r.hamming, r.rank) for r in
              sorted(hits, key=lambda r: r.rank)]
    assert ranked[0] == (1, 0, 1)  # the copy, closest
    assert {r.ref_id for r in hits} <= {1, 2, 3}  # far + audio excluded
    assert all(r.modality == "image" for r in hits)
    hams = [r.hamming for r in sorted(hits, key=lambda r: r.rank)]
    assert hams == sorted(hams)  # ranked by distance

    # k caps the per-probe result
    top1 = media_search(probe, spark, idx, max_hamming=15, k=1).collect()
    assert len(top1) == 1 and top1[0].ref_id == 1


def test_pinned_radius_zero_is_respected(spark, tmp_path, ref_on_disk):
    """ADVICE r12: ``max_hamming=0`` is a legitimate pinned radius (an
    exact-dup-only index) — the falsy hint must NOT fall through to the
    width-coupled default and silently drop non-duplicate docs. Probes,
    the search entry and the streaming writer all resolve radius 0 via
    an explicit None check."""
    from beeper_matric_etl_tool_spark.ext.media_index import media_search
    from beeper_matric_etl_tool_spark.streaming.media_curation import (
        media_curation_batch_writer,
    )

    idx = str(tmp_path / "midx0")
    build_media_index(ref_on_disk, idx, max_hamming=0)
    assert read_meta(idx)["max_hamming_hint"] == 0

    batch = _media_frame(
        spark,
        [
            (101, REF_IMG),  # exact dup -> hamming 0, still drops
            (102, xmm.make_gradient_bmp(36, 32, seed=1, invert_col=18)),
        ],
    )
    survivors, dropped = media_dedup_against_index(batch, spark, idx)
    # under the width-coupled default (radius >= 12) doc 102 would drop;
    # at the pinned radius 0 only the exact duplicate does
    assert {r.doc_id for r in dropped.collect()} == {101}
    assert {r.doc_id for r in survivors.collect()} == {102}

    # the ranked-search entry resolves the same pinned radius
    hits = media_search(batch, spark, idx, k=5).collect()
    assert {(r.probe_id, r.hamming) for r in hits} == {(101, 0)}

    # the streaming writer resolves it too (construction-time): its
    # funnel thresholds come from the same hint
    out = tmp_path / "curated"
    write = media_curation_batch_writer(idx, str(out))
    write(batch, 3)
    kept = spark.read.parquet(str(out))
    assert {r.doc_id for r in kept.collect()} == {102}
