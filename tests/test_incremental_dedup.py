"""Incremental dedup (ext/dedup.py:dedup_against_reference): a new batch
checked against the already-kept corpus — exact drops via fingerprint
anti-join, near drops via cross-corpus LSH + exact-Jaccard verify."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.dedup import dedup_against_reference
from beeper_matric_etl_tool_spark.sources.tables import table

NEW_BASE = 900_000


def _batch(spark, reference):
    ref_rows = {r["doc_id"]: r["text"] for r in reference.select("doc_id", "text").collect()}
    exact_copy = ref_rows[5]
    words = ref_rows[7].split(" ")
    words[len(words) // 2] = "altogethernovelword"
    near_copy = " ".join(words)
    fresh = (
        "a wholly original passage that shares no phrasing with the corpus "
        "under test because every one of its shingles was invented here for "
        "the purpose of surviving both duplicate detectors unscathed today"
    )
    return spark.createDataFrame(
        [
            (NEW_BASE + 0, exact_copy),
            (NEW_BASE + 1, near_copy),
            (NEW_BASE + 2, fresh),
        ],
        "doc_id long, text string",
    )


def test_incremental_dedup_against_corpus(spark, sf_dir):
    reference = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = _batch(spark, reference)
    survivors, dropped = dedup_against_reference(batch, reference, threshold=0.7)
    s_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    d_rows = {r["doc_id"]: r for r in dropped.collect()}

    # partition: every batch row is either survivor or dropped, never both
    assert s_ids | set(d_rows) == {NEW_BASE + 0, NEW_BASE + 1, NEW_BASE + 2}
    assert not (s_ids & set(d_rows))

    # the exact copy is dropped with its reference witness, no jaccard
    assert d_rows[NEW_BASE + 0]["reason"] == "exact"
    assert d_rows[NEW_BASE + 0]["ref_id"] == 5
    assert d_rows[NEW_BASE + 0]["jaccard_ppm"] is None

    # the near copy is dropped with a verified similarity >= threshold
    assert d_rows[NEW_BASE + 1]["reason"] == "near"
    assert d_rows[NEW_BASE + 1]["ref_id"] == 7
    assert d_rows[NEW_BASE + 1]["jaccard_ppm"] >= 700_000

    # the fresh doc survives with its columns intact
    assert NEW_BASE + 2 in s_ids
    assert survivors.columns == ["doc_id", "text"]

    # precision invariant: no survivor's fingerprint exists in the corpus
    surv_fp = {
        hashlib.md5(r["text"].encode()).hexdigest()
        for r in survivors.collect()
    }
    ref_fp = {
        hashlib.md5(r["text"].encode()).hexdigest()
        for r in reference.collect()
    }
    assert not (surv_fp & ref_fp)


def test_incremental_dedup_is_idempotent_on_survivors(spark, sf_dir):
    """Re-checking the survivors against the same reference drops nothing —
    the defining property of an incremental pass (running it twice per
    snapshot is safe)."""
    reference = table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = _batch(spark, reference)
    survivors, _ = dedup_against_reference(batch, reference, threshold=0.7)
    again, dropped2 = dedup_against_reference(survivors, reference, threshold=0.7)
    assert dropped2.count() == 0
    assert again.count() == survivors.count()


def test_all_new_batch_passes_through(spark, sf_dir):
    reference = table(spark, sf_dir, "documents").select("doc_id", "text")
    fresh = spark.createDataFrame(
        [(NEW_BASE + 9, "completely unrelated miniature text nobody wrote before")],
        "doc_id long, text string",
    )
    survivors, dropped = dedup_against_reference(fresh, reference)
    assert survivors.count() == 1
    assert dropped.count() == 0


def test_union_shaped_batch_survives_planner_union_pushdown(spark, sf_dir):
    """Regression: a batch built as a UNION of sources (the normal
    multi-source ingest shape) used to die with "Can't zip RDDs with
    unequal numbers of partitions" — Spark pushes the exact-tier LeftAnti
    join through the Union, and the resulting UnionExec claims its
    children's hash partitioning while its actual RDD carries the summed
    partition count; the first downstream zip then sees N vs 2N. The
    explicit repartition on the post-exact batch inside
    dedup_against_reference pins a true partitioning (and is reused by
    the survivors anti-join, so it costs no extra exchange)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 4 != 0)
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .unionByName(
            ref.filter(F.col("doc_id") % 10 == 1)
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        )
    )
    survivors, dropped = dedup_against_reference(
        batch, ref, threshold=0.7, portable=True
    )
    n_batch = batch.count()
    n_drop = dropped.count()
    assert survivors.count() + n_drop == n_batch
    # every redelivered row is dropped at the EXACT tier. (The witness is
    # the MIN reference id sharing the text — usually the original, but if
    # the reference itself contains exact duplicates a lower-id twin wins,
    # so witness identity is the oracle's business, not this test's.)
    exact_drops = {
        r["doc_id"] for r in dropped.filter(F.col("reason") == "exact").collect()
    }
    redelivered_ids = {
        r["doc_id"] + 100000
        for r in ref.filter(F.col("doc_id") % 10 == 1).collect()
    }
    assert redelivered_ids <= exact_drops


def test_near_witness_is_closest_match(spark):
    """r12 witness unification: the near-tier witness is the CLOSEST
    reference (maximum verified jaccard, ties to the smallest ref_id) —
    the media index's contract — NOT the lowest-id candidate. Planted
    two-ref corpus: the farther match carries the SMALLER id, so the
    old lowest-id policy would have picked it."""
    from beeper_matric_etl_tool_spark.ext.dedup import (
        lsh_cross_candidates,
        minhash_signatures,
    )

    base = [f"w{i}" for i in range(40)]
    far = list(base)
    far[0:4] = [f"x{i}" for i in range(4)]   # 3-gram jaccard 34/42
    near = list(base)
    near[0] = "y0"                            # 3-gram jaccard 37/39
    reference = spark.createDataFrame(
        [(10, " ".join(far)), (20, " ".join(near))], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000, " ".join(base))], "doc_id long, text string"
    )

    # honesty precondition: BOTH references are LSH candidates, so the
    # witness choice below is a real choice, not a single-candidate walk
    cands = lsh_cross_candidates(
        minhash_signatures(batch, 32, 3, "text", "doc_id"),
        minhash_signatures(reference, 32, 3, "text", "doc_id"),
    )
    assert {r.ref_id for r in cands.collect()} == {10, 20}

    _, dropped = dedup_against_reference(batch, reference, threshold=0.7)
    (d,) = dropped.collect()
    assert d.reason == "near"
    assert d.ref_id == 20                       # closest, not lowest-id
    assert d.jaccard_ppm == 1_000_000 * 37 // 39  # ...and ITS similarity
