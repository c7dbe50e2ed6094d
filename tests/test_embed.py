"""Hashed-feature embeddings (ext/embed.py): exactness vs a Python
reference, zero-shuffle plan shape, determinism/identity properties, and
composition with the embedding-consuming dedup tier."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.embed import (
    DEFAULT_DIM,
    embed_documents,
    hashed_features,
)


def _py_ref(text: str, dim: int) -> list[int]:
    vec = [0] * dim
    for t in text.split(" "):
        if not t:
            continue
        h = hashlib.md5(t.encode()).hexdigest()
        vec[int(h[:8], 16) % dim] += 1 if int(h[8], 16) % 2 == 0 else -1
    return vec


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "a completely different document about spark engines"),
        (3, "single"),
        (4, ""),  # empty doc -> zero vector
        (5, "trailing space "),  # split artifact token
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_features_match_python_reference(docs):
    out = {
        r["doc_id"]: list(r["v"])
        for r in docs.select(
            "doc_id", hashed_features("text", dim=16).alias("v")
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        assert out[i] == _py_ref(t, 16), i
    # identical text -> identical vector; empty doc -> zero vector
    assert out[0] == out[1]
    assert out[4] == [0] * 16
    # the trailing-'' artifact contributes nothing
    assert out[5] == _py_ref("trailing space", 16)


def test_embed_documents_normalization_and_plan(docs):
    emb = embed_documents(docs, dim=16)
    rows = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    for i, v in rows.items():
        assert len(v) == 16
        n = math.sqrt(sum(x * x for x in v))
        if any(x != 0 for x in v):
            assert abs(n - 1.0) < 1e-5, i
        else:
            assert i == 4  # the empty doc stays all-zero
    # map-only: the embedding never shuffles
    plan = emb._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # raw mode keeps the integer counts (as floats)
    raw = {
        r["doc_id"]: [int(x) for x in r["embedding"]]
        for r in embed_documents(docs, dim=16, normalize=False).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert raw[2] == _py_ref(texts[2], 16)


def test_embed_guards_and_default_dim(docs):
    with pytest.raises(ValueError, match="dim"):
        hashed_features("text", dim=0)
    r = docs.limit(1).select(hashed_features("text").alias("v")).first()
    assert len(r["v"]) == DEFAULT_DIM


def test_hashed_embeddings_feed_embedding_dedup(spark):
    """The composition the embedder exists for: embed the corpus, then
    run the embedding near-dup kernel over the result — exact duplicate
    texts MUST pair up (identical vectors), unrelated texts must not."""
    from beeper_matric_etl_tool_spark.ext.similarity import near_dup_embeddings

    base = (
        "the quick brown fox jumps over a lazy dog near the quiet river "
        "bank while evening settles over the watchful forest"
    )
    rows = (
        [(i, base) for i in range(3)]  # three exact copies
        + [
            (10 + i, f"document {i} about {w} pipelines and {w} engines")
            for i, w in enumerate(["spark", "flink", "trino", "duck"])
        ]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_documents(docs, dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    pairs = near_dup_embeddings(emb, threshold=0.999)
    got = {
        tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs.collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= got
    assert all(a < 3 and b < 3 for a, b in got)


def test_dsir_importance_resampling(spark):
    """DSIR kernels: totals match a Python reference, weights favor
    target-heavy buckets, scores separate target-like from source-only
    documents, and resample keeps exactly the score>=threshold set."""
    from beeper_matric_etl_tool_spark.ext.embed import (
        bucket_totals,
        importance_resample,
        importance_scores,
        importance_weights_ppm,
    )

    target_voc = "alpha beta gamma delta epsilon zeta eta theta"
    source_voc = "one two three four five six seven eight nine ten"
    targetish = [(i, f"{target_voc} alpha beta gamma") for i in range(4)]
    sourcish = [(10 + i, f"{source_voc} one two three") for i in range(8)]
    df = spark.createDataFrame(
        targetish + sourcish, "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(100 + i, target_voc) for i in range(3)], "doc_id long, text string"
    )
    dim = 16
    tt = bucket_totals(target, dim=dim)
    st = bucket_totals(df, dim=dim)
    # python reference for totals
    ref = [0] * dim
    for _, t in targetish + sourcish:
        for tok in t.split(" "):
            ref[int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim] += 1
    assert st == ref
    w = importance_weights_ppm(tt, st)
    assert len(w) == dim
    scored = {
        r["doc_id"]: r["dsir_score_ppm"]
        for r in importance_scores(df, w, dim=dim).collect()
    }
    # every target-like doc outscores every source-only doc
    assert min(scored[i] for i in range(4)) > max(
        scored[10 + i] for i in range(8)
    )
    kept = {
        r["doc_id"]
        for r in importance_resample(df, target, dim=dim).collect()
    }
    # threshold 0: doc kept iff its own score (vs in-df source totals)
    # is non-negative — recompute with in-df weights for the pin
    w_self = importance_weights_ppm(tt, st)
    scored_self = {
        r["doc_id"]: r["dsir_score_ppm"]
        for r in importance_scores(df, w_self, dim=dim).collect()
    }
    assert kept == {i for i, s in scored_self.items() if s >= 0}
    assert {i for i, _ in targetish} <= kept
    with pytest.raises(ValueError, match="dim mismatch"):
        importance_weights_ppm([0] * 4, [0] * 8)
    with pytest.raises(ValueError, match="weights for dim"):
        importance_scores(df, [0] * 4, dim=16)


def test_importance_resample_lazy_matches_eager_and_launches_no_jobs(spark, sf_dir):
    """lazy=True returns the exact eager rows/scores (same integer
    weights — the ln() input set is dim-sized either way) and launches
    ZERO jobs at construction — the contract curate()'s dsir stage
    relies on."""
    from beeper_matric_etl_tool_spark.ext.embed import importance_resample
    from beeper_matric_etl_tool_spark.sources.tables import table
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    target = (
        table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "text")
    )
    eager = {
        (r["doc_id"], r["dsir_score_ppm"])
        for r in importance_resample(docs, target, dim=32).collect()
    }
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    lazy_df = importance_resample(docs, target, dim=32, lazy=True)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)  # construction launched nothing
    lazy = {
        (r["doc_id"], r["dsir_score_ppm"]) for r in lazy_df.collect()
    }
    assert lazy == eager


def test_curate_dsir_stage_is_the_lazy_plan_form(spark, sf_dir):
    """curate(dsir_target) must build the dsir stage through the LAZY
    importance_resample form (zero construction jobs — pinned above on
    the operator): the lazy plan scores via posexplode + a weights JOIN,
    where the eager form embeds the collected weights as a literal array
    consumed by zip_with. Plan-shape assertion (deterministic, unlike
    session-wide job counting): the stage plan contains a generator
    explode and no zip_with scoring fold."""
    from beeper_matric_etl_tool_spark.ext.pipeline import curate
    from beeper_matric_etl_tool_spark.sources.tables import table
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    stages = curate(docs, dsir_target=target)
    plan = stages["dsir"]._jdf.queryExecution().optimizedPlan().toString()
    assert "posexplode" in plan or "Generate" in plan
    assert "zip_with" not in plan
