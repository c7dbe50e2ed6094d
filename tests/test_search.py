"""BM25 retrieval (ext/search.py) vs a DuckDB oracle twin at sf0.001.

The oracle mirrors the engine's determinism contract exactly: each
(doc, term) contribution floored to ppm, then integer-summed — so the
comparison is a hash-tier equality, not a tolerance check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.search import bm25_scores, bm25_topk
from beeper_matric_etl_tool_spark.sources.tables import table
from tests.oracle import assert_matches_oracle

QUERY = ["the", "data", "model"]

ORACLE = f"""
    WITH base AS (
        SELECT doc_id, str_split(text, ' ') AS toks,
               len(str_split(text, ' ')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base
    ),
    hits AS (
        SELECT doc_id, dl, term, count(*) AS tf FROM (
            SELECT doc_id, dl, unnest(toks) AS term FROM base
        ) WHERE term IN ('the', 'data', 'model')
        GROUP BY doc_id, dl, term
    ),
    tdf AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term
    ),
    scored AS (
        SELECT h.doc_id,
               CAST(floor(
                   CAST(floor(1000000.0
                        * ln(1.0 + (s.n_docs - t.df + 0.5) / (t.df + 0.5)))
                     AS BIGINT)
                   * (h.tf * (1.2 + 1.0))
                   / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * h.dl / s.avgdl))
               ) AS BIGINT) AS contrib_ppm
        FROM hits h JOIN tdf t USING (term) CROSS JOIN stats s
    )
    SELECT doc_id, CAST(sum(contrib_ppm) AS BIGINT) AS score_ppm,
           count(*) AS n_matched
    FROM scored GROUP BY doc_id
"""


def test_bm25_matches_duckdb_oracle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = bm25_scores(docs, QUERY)
    assert_matches_oracle(got, ORACLE, sf_dir)


def test_bm25_topk_deterministic_and_ranked(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    top = bm25_topk(docs, QUERY, k=5).collect()
    assert len(top) == 5
    scores = [r["score_ppm"] for r in top]
    assert scores == sorted(scores, reverse=True)
    again = bm25_topk(docs, QUERY, k=5).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_bm25_rewards_rarity_and_saturates_tf(spark):
    spark_df = spark.createDataFrame(
        [
            (0, "rare common common common common"),
            (1, "common common common common common"),
            (2, "common common common common filler"),
            (3, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["score_ppm"]
        for r in bm25_scores(spark_df, ["rare", "common"]).collect()
    }
    # the one doc holding the rare term outranks pure-common docs of the
    # same length: idf rewards rarity
    assert scores[0] > scores[1]
    # doc 3 matches nothing — absent from the result entirely
    assert 3 not in scores
    # tf saturation: 5x'common' beats 4x'common' by LESS than 4x beats 0
    gain_5_vs_4 = scores[1] - scores[2]
    assert 0 <= gain_5_vs_4 < scores[2]


def test_bm25_precomputed_stats_path_matches(spark, sf_dir):
    """The corpus_stats fast path must score identically to the
    self-computed stats path when handed the exact same (n_docs, avgdl)."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(F.size(F.split("text", " ")).alias("dl"))
    n_docs = base.count()
    avgdl = base.agg(F.avg("dl")).first()[0]
    self_computed = sorted(
        tuple(r) for r in bm25_scores(docs, QUERY).collect()
    )
    precomputed = sorted(
        tuple(r)
        for r in bm25_scores(docs, QUERY, corpus_stats=(n_docs, avgdl)).collect()
    )
    assert self_computed == precomputed


def test_bm25_empty_query_raises(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])
