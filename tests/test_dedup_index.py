"""Persisted incremental-dedup index (ext/dedup_index.py): bit-identical
decisions vs the from-scratch path, NO reference-text scan in the probe
plan, and append keeps batch N+1 equivalent to a full rebuild — the
round-5 verdict's "steady state" gap, closed and pinned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.dedup import dedup_against_reference
from beeper_matric_etl_tool_spark.ext.dedup_index import (
    append_dedup_index,
    build_dedup_index,
    dedup_against_index,
    read_meta,
)

REF_ROWS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten eleven twelve"),
    (3, "red orange yellow green blue indigo violet ultraviolet infrared xray"),
]

BATCH_ROWS = [
    (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
    (102, "one two three four five six seven eight nine ten eleven twelve thirteen"),  # near dup of 2
    (103, "totally fresh document with its own unique vocabulary here now"),
    (104, "another brand new document sharing nothing with the reference corpus"),
]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def ref_on_disk(spark, tmp_path):
    """Reference corpus WRITTEN TO PARQUET and read back, so the
    reference-text scan is identifiable in plans by its path."""
    ref_path = str(tmp_path / "reference_corpus")
    _frame(spark, REF_ROWS).write.parquet(ref_path)
    return spark.read.parquet(ref_path), ref_path


def test_probe_matches_from_scratch_and_never_scans_reference_text(
    spark, tmp_path, ref_on_disk
):
    reference, ref_path = ref_on_disk
    idx = str(tmp_path / "idx")
    build_dedup_index(reference, idx)

    batch = _frame(spark, BATCH_ROWS)
    s_scratch, d_scratch = dedup_against_reference(batch, reference)
    s_index, d_index = dedup_against_index(batch, spark, idx)

    # identical survivors AND identical audit trail (witness, reason, ppm)
    assert _pairs(s_index) == _pairs(s_scratch)
    assert _pairs(d_index) == _pairs(d_scratch)
    # the fixture is meaningful: one exact drop, one near drop, two survivors
    reasons = {r["doc_id"]: r["reason"] for r in d_index.collect()}
    assert reasons == {101: "exact", 102: "near"}
    assert {r["doc_id"] for r in s_index.collect()} == {103, 104}

    # the done-criterion: the probe plan contains NO scan of the
    # reference corpus TEXT (the only parquet carrying a text column),
    # while the from-scratch plan does; the probe reads the index's
    # derived tables instead. Asserted on ReadSchema signatures — file
    # paths are truncated in plan strings, column schemas are not.
    plan_scratch = s_scratch._jdf.queryExecution().executedPlan().toString()
    plan_index = s_index._jdf.queryExecution().executedPlan().toString()
    plan_index_d = d_index._jdf.queryExecution().executedPlan().toString()
    assert "text:string" in plan_scratch  # reference text scanned from scratch
    assert "text:string" not in plan_index  # probe: no text read anywhere
    assert "text:string" not in plan_index_d
    # ...because the derived tables are read in its place
    assert "fp:string" in plan_index
    assert "shingle_set" in plan_index_d or "shingle_set" in plan_index


def test_append_keeps_index_equivalent_to_rebuild(spark, tmp_path, ref_on_disk):
    reference, _ = ref_on_disk
    idx = str(tmp_path / "idx")
    build_dedup_index(reference, idx)

    batch1 = _frame(spark, BATCH_ROWS)
    survivors1, _ = dedup_against_index(batch1, spark, idx)
    accepted = survivors1.select("doc_id", "text")
    append_dedup_index(accepted, idx)

    # batch2: a near-dup of a batch1 SURVIVOR (caught only via the
    # appended rows), an exact dup of the original reference, one fresh
    batch2 = _frame(
        spark,
        [
            (201, "totally fresh document with its own unique vocabulary here now again"),
            (202, "red orange yellow green blue indigo violet ultraviolet infrared xray"),
            (203, "entirely novel content never before seen in any corpus at all"),
        ],
    )
    s_index, d_index = dedup_against_index(batch2, spark, idx)
    full_reference = reference.unionByName(accepted)
    s_scratch, d_scratch = dedup_against_reference(batch2, full_reference)

    assert _pairs(s_index) == _pairs(s_scratch)
    assert _pairs(d_index) == _pairs(d_scratch)
    reasons = {r["doc_id"]: (r["reason"], r["ref_id"]) for r in d_index.collect()}
    assert reasons[201] == ("near", 103)  # witnessed by the APPENDED survivor
    assert reasons[202] == ("exact", 3)
    assert 203 not in reasons


def test_config_is_stored_and_guarded(spark, tmp_path):
    idx = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="must divide"):
        build_dedup_index(_frame(spark, REF_ROWS), idx, num_hashes=32, bands=7)

    build_dedup_index(
        _frame(spark, REF_ROWS), idx, num_hashes=16, bands=4, portable=True
    )
    meta = read_meta(idx)
    assert meta == {
        "num_hashes": 16,
        "bands": 4,
        "shingle_k": 3,
        "text_col": "text",
        "id_col": "doc_id",
        "portable": True,
        "layout": "ingest-batch-partitioned",
    }
    # the stored config drives the probe: portable md5 signatures decide
    # identically to a from-scratch run under the same config
    batch = _frame(spark, BATCH_ROWS)
    s_idx, d_idx = dedup_against_index(batch, spark, idx)
    s_ref, d_ref = dedup_against_reference(
        batch, _frame(spark, REF_ROWS), num_hashes=16, bands=4, portable=True
    )
    assert _pairs(s_idx) == _pairs(s_ref)
    assert _pairs(d_idx) == _pairs(d_ref)

    with pytest.raises(FileNotFoundError, match="_META"):
        dedup_against_index(batch, spark, str(tmp_path / "not_an_index"))


def test_curate_rides_the_persisted_index(spark, tmp_path, ref_on_disk):
    """curate(reference_index=...) runs the incremental stage through the
    persisted index — same survivors as curate(reference_docs=...) under
    the matching config, and the two reference forms are mutually
    exclusive (the index's stored config would silently override the
    call's)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import curate

    reference, _ = ref_on_disk
    idx = str(tmp_path / "idx")
    build_dedup_index(reference, idx, portable=True)

    # batch framed as a curate() input (needs lang for gate+packing);
    # texts long enough to pass the quality gate are not needed here —
    # we compare the two reference forms on identical inputs, so the
    # pre-incremental funnel is the same either way
    batch = spark.createDataFrame(
        [(i, "en", t) for i, t in BATCH_ROWS], "doc_id long, lang string, text string"
    )
    via_index = curate(
        batch, reference_index=idx, persist_intermediates=False, portable=True
    )["incremental"]
    via_docs = curate(
        batch,
        reference_docs=reference,
        persist_intermediates=False,
        portable=True,
    )["incremental"]
    assert _pairs(via_index.select("doc_id")) == _pairs(via_docs.select("doc_id"))

    with pytest.raises(ValueError, match="not both"):
        curate(batch, reference_docs=reference, reference_index=idx)


def test_dedup_index_rejects_scheme_prefixed_paths(spark):
    """The _META.json side-file machinery is POSIX-local (sinks.py
    'Filesystem contract'); an s3:// index path must fail with the
    contract error at every lifecycle entry point, not an opaque
    FileNotFoundError mid-pipeline."""
    import pytest as _pytest

    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        append_dedup_index,
        build_dedup_index,
        dedup_against_index,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="URI scheme"):
        build_dedup_index(docs, "s3://bucket/index")
    with _pytest.raises(ValueError, match="URI scheme"):
        append_dedup_index(docs, "s3://bucket/index")
    with _pytest.raises(ValueError, match="URI scheme"):
        dedup_against_index(docs, spark, "s3://bucket/index")


def test_compact_dedup_index_folds_batches_and_preserves_decisions(
    spark, tmp_path, ref_on_disk
):
    """After many staged appends, compaction rewrites each derived table
    into ONE bootstrap partition — same rows, same probe decisions,
    partition count collapsed (the streaming steady-state small-file
    fix)."""
    import os

    from beeper_matric_etl_tool_spark.ext.dedup_index import (
        append_dedup_index,
        build_dedup_index,
        compact_dedup_index,
        dedup_against_index,
    )

    idx = str(tmp_path / "idx")
    build_dedup_index(_frame(spark, REF_ROWS), idx, num_hashes=16, bands=4)
    extra = [
        (900 + i, f"wholly original appended document number {_w(i)} with "
                  f"enough body to shingle cleanly and stand alone")
        for i in range(4)
    ]
    for i, row in enumerate(extra):
        append_dedup_index(_frame(spark, [row]), idx, batch_id=i)

    batch = _frame(spark, BATCH_ROWS + [extra[2]])
    before_s, before_d = dedup_against_index(batch, spark, idx)
    before = (_pairs(before_s), _pairs(before_d))

    # default preserve_last=True: the HIGHEST staged batch partition
    # survives un-folded, so a replay of a possibly-uncommitted final
    # micro-batch can still exclude its own rows
    counts = compact_dedup_index(spark, idx)
    assert counts["fingerprints"] == counts["signatures"] == len(REF_ROWS) + 4

    def parts():
        return sorted(
            d for d in os.listdir(os.path.join(idx, "fingerprints"))
            if d.startswith("ingest_batch=")
        )

    assert parts() == ["ingest_batch=-1", "ingest_batch=3"]
    after_s, after_d = dedup_against_index(batch, spark, idx)
    assert (_pairs(after_s), _pairs(after_d)) == before
    # excluding the preserved batch still hides exactly its rows: the
    # replay contract compaction must not break — a copy of batch 3's
    # document survives ONLY when batch 3 is excluded
    copy3 = _frame(spark, [(999, extra[3][1])])
    ex_s, _d = dedup_against_index(copy3, spark, idx, exclude_batch=3)
    assert {r[0] for r in ex_s.select("doc_id").collect()} == {999}
    noex_s, _d = dedup_against_index(copy3, spark, idx)
    assert noex_s.count() == 0

    # a committed-checkpoint compaction folds everything
    counts2 = compact_dedup_index(spark, idx, preserve_last=False)
    assert counts2 == counts
    assert parts() == ["ingest_batch=-1"]
    after2_s, after2_d = dedup_against_index(batch, spark, idx)
    assert (_pairs(after2_s), _pairs(after2_d)) == before


def _w(i: int) -> str:
    return ["alpha", "bravo", "carol", "delta"][i % 4] + str("x" * (i + 1))


def test_read_meta_rejects_pre_batch_flat_layout(spark, tmp_path):
    """An index whose _META.json lacks the ingest-batch layout key (a
    pre-layout artifact) must fail at every lifecycle entry point with
    the rebuild instruction, not die mid-stream on an unresolvable
    partition column or corrupt the table with mixed layouts."""
    import json
    import os

    idx = tmp_path / "idx"
    idx.mkdir()
    (idx / "_META.json").write_text(json.dumps({
        "num_hashes": 16, "bands": 4, "shingle_k": 3,
        "text_col": "text", "id_col": "doc_id", "portable": False,
    }))
    with pytest.raises(ValueError, match="rebuild the index"):
        read_meta(str(idx))


def test_curation_stream_guard_rejects_foreign_checkpoint(spark, tmp_path):
    """Batch ids are checkpoint-scoped; binding an index to a second
    checkpoint would let the new stream's batch 0 overwrite the old
    stream's staged partitions — the guard fails fast instead."""
    from beeper_matric_etl_tool_spark.streaming.curation import (
        _guard_checkpoint_binding,
    )

    idx = tmp_path / "idx"
    idx.mkdir()
    _guard_checkpoint_binding(str(idx), str(tmp_path / "ckptA"))
    # same binding is idempotent
    _guard_checkpoint_binding(str(idx), str(tmp_path / "ckptA"))
    with pytest.raises(ValueError, match="checkpoint-scoped"):
        _guard_checkpoint_binding(str(idx), str(tmp_path / "ckptB"))
