"""BM25 retrieval (ext/search.py) vs a DuckDB oracle twin at sf0.001.

The oracle mirrors the engine's determinism contract exactly: each
(doc, term) contribution floored to ppm, then integer-summed — so the
comparison is a hash-tier equality, not a tolerance check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.search import (
    bm25_scores,
    bm25_topk,
    unigram_nll_scores,
)
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


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (ext/search.py:unigram_nll_scores)
# ---------------------------------------------------------------------------

LM_ORACLE = """
    WITH tf AS (
        SELECT doc_id, term, count(*) AS tf FROM (
            SELECT doc_id, unnest(str_split(text, ' ')) AS term
            FROM documents
        ) GROUP BY doc_id, term
    ),
    vocab AS (
        SELECT term, CAST(sum(tf) AS BIGINT) AS ct FROM tf GROUP BY term
    ),
    stats AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS v FROM vocab
    ),
    nll AS (
        SELECT term,
               CAST(floor(1000000 * ln(
                   (s.n_total + s.v) * 1.0 / (ct + 1.0))) AS BIGINT)
                   AS nll_ppm
        FROM vocab CROSS JOIN stats s
    )
    SELECT tf.doc_id,
           CAST(sum(tf.tf * n.nll_ppm) // sum(tf.tf) AS BIGINT) AS score_ppm
    FROM tf JOIN nll n USING (term) GROUP BY tf.doc_id
"""


def test_unigram_nll_matches_duckdb_oracle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert_matches_oracle(unigram_nll_scores(docs), LM_ORACLE, sf_dir)


def test_unigram_nll_hand_computed(spark):
    """3-token-vocab corpus with every intermediate checkable by hand:
    counts a=4 b=1 c=1, N=6, V=3 -> nll(a)=floor(1e6 ln(9/5))=587786,
    nll(b)=nll(c)=floor(1e6 ln(9/2))=1504077.
    d1 'a a a b' = (3*587786+1504077) DIV 4 = 816858
    d2 'a c'     = (587786+1504077)   DIV 2 = 1045931
    — and the ordering is the operator's point: the doc made of frequent
    tokens (d1) is LESS surprising than the rare-token doc (d2)."""
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["score_ppm"]
        for r in unigram_nll_scores(docs).collect()
    }
    assert got == {1: 816858, 2: 1045931}
    assert got[1] < got[2]


def test_unigram_nll_lazy_stats_matches_and_launches_no_jobs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    eager = {r["doc_id"]: r["score_ppm"] for r in unigram_nll_scores(docs).collect()}
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    lazy_df = unigram_nll_scores(docs, lazy_stats=True)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)  # construction launched nothing
    lazy = {r["doc_id"]: r["score_ppm"] for r in lazy_df.collect()}
    assert lazy == eager


def test_unigram_nll_reference_mode_is_batch_invariant(spark, sf_dir):
    """Frozen-model mode: scoring against a reference vocabulary yields
    the SAME score for a document regardless of what else is in its
    batch (the property self-scoring cannot have); OOV terms score at
    the smoothing maximum ln((N+V)/1), so a doc of unseen tokens ranks
    strictly above any in-vocabulary doc."""
    ref = table(spark, sf_dir, "documents")
    d1 = spark.createDataFrame(
        [(100, "the data model"), (101, "qzzqv wxxqj kjjqz")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(100, "the data model")], "doc_id long, text string"
    )
    s1 = {r["doc_id"]: r["score_ppm"]
          for r in unigram_nll_scores(d1, reference=ref).collect()}
    s2 = {r["doc_id"]: r["score_ppm"]
          for r in unigram_nll_scores(d2, reference=ref).collect()}
    assert s1[100] == s2[100]  # batch composition cannot move the score
    assert s1[101] > s1[100]   # pure-OOV doc is maximally surprising
    # lazy_stats parity holds in reference mode too
    lazy = {
        r["doc_id"]: r["score_ppm"]
        for r in unigram_nll_scores(d1, reference=ref, lazy_stats=True).collect()
    }
    assert lazy == s1


# ---------------------------------------------------------------- round 7

from beeper_matric_etl_tool_spark.ext.search import (  # noqa: E402
    bigram_nll_scores,
    dense_hash_topk,
    rrf_fuse,
)

LM2_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
    ),
    lmvocab AS (
        SELECT term, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY term
    ),
    lmstats AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n_total,
               CAST(count(*) AS BIGINT) AS v FROM lmvocab
    ),
    bgr AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
            WHERE len(toks) >= 2
        )
    ),
    bgtf AS (
        SELECT doc_id, w1, w2, count(*) AS tf FROM bgr GROUP BY doc_id, w1, w2
    ),
    bgc AS (
        SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM bgtf GROUP BY w1, w2
    ),
    bgnll AS (
        SELECT c.w1, c.w2,
               CAST(floor(-1000000.0 * ln(
                   {0.7!r} * c.c12 / u1.ct
                   + {1.0 - 0.7!r} * (u2.ct + 1.0) / (s.n_total + s.v)
               )) AS BIGINT) AS nll_ppm
        FROM bgc c
        JOIN lmvocab u1 ON u1.term = c.w1
        JOIN lmvocab u2 ON u2.term = c.w2
        CROSS JOIN lmstats s
    )
    SELECT t.doc_id,
           CAST(sum(t.tf * n.nll_ppm) // sum(t.tf) AS BIGINT) AS score_ppm
    FROM bgtf t JOIN bgnll n ON n.w1 = t.w1 AND n.w2 = t.w2
    GROUP BY t.doc_id
"""


def test_bigram_nll_matches_duckdb_oracle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert_matches_oracle(bigram_nll_scores(docs), LM2_ORACLE, sf_dir)


def test_bigram_nll_hand_computed(spark):
    """Corpus 'a b' ×3 + 'b a': unigram counts a=4 b=4 (N=8, V=2);
    bigram counts (a,b)=3, (b,a)=1. Mirroring the engine's float chain
    in Python gives the exact expected integers, and the ordering is the
    operator's point: the document whose transition is corpus-typical
    scores LOWER (less surprising) than the reversed one — word order
    enters the score, which no unigram model can do."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "b a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score_ppm"] for r in bigram_nll_scores(docs).collect()}
    lam, oml = 0.7, 1.0 - 0.7
    nll_ab = math.floor(-1e6 * math.log(lam * 3 / 4 + oml * (4 + 1.0) / 10))
    nll_ba = math.floor(-1e6 * math.log(lam * 1 / 4 + oml * (4 + 1.0) / 10))
    assert got == {1: nll_ab, 2: nll_ab, 3: nll_ab, 4: nll_ba}
    assert got[4] > got[1]


def test_bigram_nll_lazy_stats_matches_and_launches_no_jobs(spark, sf_dir):
    """lazy_stats folds the (N, V) scalar pass into the plan (broadcast
    one-row cross join) — zero jobs at composition, identical scores, in
    both self and frozen-reference mode; corpus_stats overrides both
    (round-7 ADVICE item: the eager .first() would silently break a
    zero-jobs composition context)."""
    docs = table(spark, sf_dir, "documents")
    eager = {r["doc_id"]: r["score_ppm"] for r in bigram_nll_scores(docs).collect()}
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    lazy_df = bigram_nll_scores(docs, lazy_stats=True)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)  # construction launched nothing
    lazy = {r["doc_id"]: r["score_ppm"] for r in lazy_df.collect()}
    assert lazy == eager
    # reference mode: lazy parity + frozen corpus_stats parity
    ref = docs
    probe = spark.createDataFrame(
        [(100, "the data model")], "doc_id long, text string"
    )
    eager_ref = {
        r["doc_id"]: r["score_ppm"]
        for r in bigram_nll_scores(probe, reference=ref).collect()
    }
    lazy_ref = {
        r["doc_id"]: r["score_ppm"]
        for r in bigram_nll_scores(probe, reference=ref, lazy_stats=True).collect()
    }
    assert lazy_ref == eager_ref
    n_total, v_size = (
        docs.selectExpr("explode(split(text, ' ')) AS t")
        .agg(F.count(F.lit(1)), F.count_distinct("t"))
        .first()
    )
    frozen = {
        r["doc_id"]: r["score_ppm"]
        for r in bigram_nll_scores(
            probe, reference=ref, corpus_stats=(n_total, v_size)
        ).collect()
    }
    assert frozen == eager_ref


def test_bigram_nll_skips_sub_two_token_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, "")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in bigram_nll_scores(docs).collect()}
    assert ids == {1}


def test_dense_hash_topk_exact_query_doc_ranks_first(spark):
    """A document that IS the query text has cosine 1 — no other doc can
    beat it; score is the integer-exact (dot²·1e9) DIV norm², so ties
    break on id and the ranking is bit-stable."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "the data model"),
            (3, "the data model extra words beyond the query"),
            (4, "unrelated text entirely here"),
        ],
        "doc_id long, text string",
    )
    got = dense_hash_topk(docs, ["the", "data", "model"], k=3).collect()
    assert got[0]["doc_id"] == 2
    # the true lexical matches outrank any dim=64 bucket-collision noise
    assert [r["doc_id"] for r in got[:2]] == [2, 3]
    with pytest.raises(ValueError, match="non-empty"):
        dense_hash_topk(docs, [])


def test_dense_hash_topk_matches_duckdb_oracle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    got = dense_hash_topk(docs, QUERY, k=10)
    oracle = """
        WITH toks AS (
            SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents
        ),
        dvc AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS b,
                   count(*) AS c
            FROM toks WHERE t <> '' GROUP BY doc_id, b
        ),
        qvb AS (
            SELECT CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS b,
                   count(*) AS qc
            FROM (VALUES ('the'), ('data'), ('model')) q(t) GROUP BY b
        ),
        dsc AS (
            SELECT v.doc_id,
                   CAST(sum(v.c * coalesce(q.qc, 0)) AS BIGINT) AS dot,
                   CAST(sum(v.c * v.c) AS BIGINT) AS norm2
            FROM dvc v LEFT JOIN qvb q USING (b) GROUP BY v.doc_id
        )
        SELECT doc_id, score_ppb, rnk AS rank FROM (
            SELECT doc_id,
                   CAST((dot * dot * 1000000000) // norm2 AS BIGINT)
                       AS score_ppb,
                   row_number() OVER (
                       ORDER BY (dot * dot * 1000000000) // norm2 DESC,
                                doc_id) AS rnk
            FROM dsc WHERE dot > 0
        ) WHERE rnk <= 10
    """
    assert_matches_oracle(got, oracle, sf_dir)


def test_dense_hash_topk_batch_matches_per_query_loop(spark, sf_dir):
    """The query-frame form returns IDENTICAL (id, score, rank) lists to
    the per-query loop for every query in the set — one corpus pass for
    the whole sweep instead of one job per query — under 1/3/13-partition
    corpora; plan pins: the query frame broadcasts (no shuffle scoring
    the pairs), and the final per-query sort input is candidate-bounded
    by the local-rank prune BEFORE the exchange."""
    from beeper_matric_etl_tool_spark.ext.search import dense_hash_topk_batch

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    query_sets = {
        0: ["the", "data", "model"],
        1: ["alpha", "of", "the"],
        2: ["qzzqv"],  # no hits: empty list in both forms
    }
    queries = spark.createDataFrame(
        [(qid, " ".join(terms)) for qid, terms in query_sets.items()],
        "query_id long, text string",
    )
    want = {
        qid: [
            (r["doc_id"], r["score_ppb"], r["rank"])
            for r in dense_hash_topk(docs, terms, k=5).collect()
        ]
        for qid, terms in query_sets.items()
    }
    for parts in (1, 3, 13):
        batch = dense_hash_topk_batch(
            docs.repartition(parts), queries, k=5
        ).collect()
        got: dict = {qid: [] for qid in query_sets}
        for r in sorted(batch, key=lambda r: (r["query_id"], r["rank"])):
            got[r["query_id"]].append(
                (r["doc_id"], r["score_ppb"], r["rank"])
            )
        assert got == want, parts
    plan = (
        dense_hash_topk_batch(docs, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan
    # the local prune (filter on the partition-local rank) sits in the
    # plan before the per-query global window
    assert plan.count("Window") >= 2


def test_rrf_fuse_hand_computed(spark):
    """Lists A=[1@1, 2@2], B=[2@1, 3@2]: rrf(2) = 1e9//62 + 1e9//61
    beats rrf(1) = 1e9//61 — consensus across lists wins over a single
    first place, the fusion property; exact integer arithmetic so the
    values are checkable by hand."""
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = rrf_fuse([a, b]).collect()
    by_id = {r["doc_id"]: (r["rrf_ppb"], r["n_lists"]) for r in got}
    assert by_id == {
        1: (1_000_000_000 // 61, 1),
        2: (1_000_000_000 // 62 + 1_000_000_000 // 61, 2),
        3: (1_000_000_000 // 62, 1),
    }
    assert [r["doc_id"] for r in got] == [2, 1, 3]
    with pytest.raises(ValueError, match="empty"):
        rrf_fuse([])


def test_bigram_nll_reference_mode_is_batch_invariant(spark, sf_dir):
    """Frozen-model bigram scoring: same doc, same score in any batch;
    a doc whose transitions the reference never saw scores at the
    smoothing maximum — strictly above any in-vocabulary doc; self-mode
    values are untouched by the reference-mode code path (oracle leg
    still green)."""
    ref = table(spark, sf_dir, "documents")
    d1 = spark.createDataFrame(
        [(100, "the data model"), (101, "qzzqv wxxqj kjjqz pqqzv")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(100, "the data model")], "doc_id long, text string"
    )
    s1 = {r["doc_id"]: r["score_ppm"]
          for r in bigram_nll_scores(d1, reference=ref).collect()}
    s2 = {r["doc_id"]: r["score_ppm"]
          for r in bigram_nll_scores(d2, reference=ref).collect()}
    assert s1[100] == s2[100]
    assert s1[101] > s1[100]
    # the OOV doc sits exactly at the smoothing maximum: every transition
    # scores floor(1e6·ln((N+V)/((1-λ)^-1 ... )) — recompute driver-side
    import math

    from beeper_matric_etl_tool_spark.ext.text import tokens as _  # noqa: F401

    toks = [t for r in ref.select("text").collect() for t in r["text"].split(" ") if t != ""]
    n_total, v = len(toks), len(set(toks))
    exp = math.floor(-1e6 * math.log((1.0 - 0.7) * 1.0 / (n_total + v)))
    assert s1[101] == exp


def test_rrf_fuse_composes_with_topk_producers(spark, sf_dir):
    """The advertised composition works directly: both top-k producers
    emit rank, so fusion needs no hand-built window; the fused head is
    deterministic across runs."""
    docs = table(spark, sf_dir, "documents")
    fused = rrf_fuse(
        [bm25_topk(docs, QUERY, k=10), dense_hash_topk(docs, QUERY, k=10)]
    )
    rows = fused.collect()
    assert 10 <= len(rows) <= 20
    assert rows == fused.collect()
    assert all(r["n_lists"] in (1, 2) for r in rows)


def test_rrf_fuse_weighted(spark):
    """Weighted RRF: an integer weight scales a list's contribution
    exactly; weight 0 silences a list without changing n_lists; bad
    weight vectors raise."""
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], weights=[3, 1]).collect()}
    unit = 1_000_000_000 // 61
    assert got[1]["rrf_ppb"] == 3 * unit + unit
    assert got[2]["rrf_ppb"] == 1_000_000_000 // 62
    muted = {r["doc_id"]: r for r in rrf_fuse([a, b], weights=[0, 1]).collect()}
    assert muted[1]["rrf_ppb"] == unit and muted[1]["n_lists"] == 2
    with pytest.raises(ValueError, match="non-negative"):
        rrf_fuse([a, b], weights=[1])


def test_pmi_collocations_hand_computed(spark):
    """Tiny corpus with one planted hot collocation: 'data model' occurs
    in every doc (c12 = 4), each unigram also appears alone, so
    pmi_ppm = floor(1e6·ln(c12·N/(c1·c2))) is hand-checkable; the
    min_count floor removes hapax pairs entirely; ties break (w1, w2)."""
    import math

    from beeper_matric_etl_tool_spark.ext.search import pmi_collocations

    docs = spark.createDataFrame(
        [
            (1, "data model data model alpha"),
            (2, "data model beta"),
            (3, "model data model gamma data"),
            (4, "delta data model"),
        ],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=4, k=5).collect()
    # corpus: N = 16 tokens; c(data) = 6, c(model) = 6; 'data model'
    # pairs: doc1 ×2, doc2 ×1, doc3 ×1, doc4 ×1 → c12 = 5
    expected = math.floor(1e6 * math.log((5 / 6) * (16 / 6)))
    top = out[0]
    assert (top["w1"], top["w2"], top["c12"]) == ("data", "model", 5)
    assert top["pmi_ppm"] == expected
    assert top["rank"] == 1
    # every surviving pair respects the floor
    assert all(r["c12"] >= 4 for r in out)
    # ranks are dense and ordering is (pmi desc, w1, w2)
    scores = [(r["pmi_ppm"], r["w1"], r["w2"]) for r in out]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1], t[2]))
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))


def test_pmi_collocations_min_count_floor(spark):
    """A pair under the floor never surfaces, however high its PMI."""
    from beeper_matric_etl_tool_spark.ext.search import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "rare pair"), (2, "common word common word common word")],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=2, k=10).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("rare", "pair") not in pairs  # c12 = 1 < 2
    assert ("common", "word") in pairs  # c12 = 3


def test_pmi_unigram_relation_computes_once_without_aqe(spark):
    """materialize_unigrams=True (default) localCheckpoints the
    vocabulary-sized unigram counts, so the three consumers (w1 join,
    w2 join, N-total) read ONE materialization regardless of AQE — the
    plan carries ZERO 'groupBy term' aggregates; the lazy opt-out
    re-plans the aggregate per consumer under the static planner.
    Values are identical either way."""
    from beeper_matric_etl_tool_spark.ext.search import pmi_collocations

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat and the cat ran to the barn")
         for i in range(10)],
        "doc_id long, text string",
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        mat = pmi_collocations(docs, min_count=3, k=5)
        pm = mat._jdf.queryExecution().executedPlan().toString()
        assert pm.count("keys=[term") == 0
        lazy = pmi_collocations(docs, min_count=3, k=5,
                                materialize_unigrams=False)
        pl = lazy._jdf.queryExecution().executedPlan().toString()
        assert pl.count("keys=[term") > 0
        assert sorted(map(tuple, mat.collect())) == sorted(
            map(tuple, lazy.collect())
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_dense_hash_topk_batch_exchanges_are_k_bounded(spark):
    """The docstring's scale claim, pinned: the physical plan bounds
    BOTH rank exchanges map-side via WindowGroupLimit(Partial) — each
    shuffles at most k rows per (partition, query) group, so no
    corpus-sized sort ever reaches one task."""
    from beeper_matric_etl_tool_spark.ext.search import dense_hash_topk_batch

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "query_id long, text string"
    )
    plan = dense_hash_topk_batch(docs, q, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan
