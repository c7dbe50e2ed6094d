"""Ranked full-text retrieval over the documents table (SURVEY §2.12 text
tier): Okapi BM25 scoring as pure DataFrame algebra.

Why it's here: a training-data platform needs corpus SEARCH, not just
statistics — "find the documents most about X" drives contamination
triage, topic audits and eval-set curation. TF-IDF (`tfidf_top_terms`)
ranks a document's own terms; BM25 ranks DOCUMENTS against a query, with
the two refinements that made it the lexical-retrieval standard: term
frequency saturation (k1) and document-length normalization (b).

Determinism contract (the repo-wide fixed-point rule): every per-(doc,
term) contribution is floored to ppm BEFORE summation, so the final score
is an integer SUM of integers — commutative and engine-portable. A float
Σ over terms would depend on the engine's aggregation order in the last
ulp, exactly where floor() flips. ln() itself is IEEE libm on both planes
(the same contract `tfidf_top_terms`'s oracle already relies on).

Scale shape: TWO corpus passes — a stats pass (N, avgdl: count + length
average, no explode) and the tokenize+explode pass, whose query-term
filter prunes the stream to |query| terms before the (doc, term) count.
A search system serving many queries computes (N, avgdl) once and passes
them via ``corpus_stats``, making every query a single pruned pass;
per-term df and the stats are broadcast scalars/tiny dims either way, so
no shuffle carries more than |matching docs × query terms| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1_x100: int = 120,
    b_x100: int = 75,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """(id_col, score_ppm, n_matched) per document matching ≥1 query term,
    scored with Okapi BM25 (k1 = k1_x100/100, b = b_x100/100 — integer
    parameters keep the call site engine-portable). ``corpus_stats`` is an
    optional precomputed (n_docs, avgdl) — pass it to skip the stats scan
    when serving many queries over one corpus (see module docstring).

    idf uses the standard +1-smoothed log form (always positive):
    ln(1 + (N - df + 0.5)/(df + 0.5)), floored to integer ppm PER TERM
    (idf_ppm) before it touches any per-row factor — the same convention
    `tfidf_top_terms` uses, capping the ln() last-ulp cross-engine
    exposure at vocabulary size instead of one floor-flip chance per
    (doc, term) row. Each term's contribution is then
    floor(idf_ppm · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))) — only the
    saturation/length-norm factor (plain IEEE arithmetic, identical ops
    in every engine) remains inside the per-row floor — and the
    contributions are integer-summed (see module docstring)."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    k1 = F.lit(k1_x100 / 100.0)
    b = F.lit(b_x100 / 100.0)

    base = docs.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        id_col, "__toks", F.size("__toks").alias("__dl")
    )
    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
        stats = docs.sparkSession.createDataFrame(
            [(int(n_docs), float(avgdl))], "__n_docs long, __avgdl double"
        )
    else:
        stats = base.agg(
            F.count(F.lit(1)).alias("__n_docs"),
            F.avg("__dl").alias("__avgdl"),
        )
    hits = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__term"))
        .filter(F.col("__term").isin(query_terms))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    term_df = hits.groupBy("__term").agg(
        F.countDistinct(id_col).alias("__df")
    )
    scored = (
        hits.join(F.broadcast(term_df), on="__term")
        .join(F.broadcast(stats))
        .withColumn(
            "__idf_ppm",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    F.lit(1.0)
                    + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                    / (F.col("__df") + F.lit(0.5))
                )
            ).cast("long"),
        )
        .withColumn(
            "__contrib_ppm",
            F.floor(
                F.col("__idf_ppm")
                * (F.col("__tf") * (k1 + F.lit(1.0)))
                / (
                    F.col("__tf")
                    + k1 * (F.lit(1.0) - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).cast("long"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__contrib_ppm").alias("score_ppm"),
        F.count(F.lit(1)).alias("n_matched"),
    )


def unigram_nll_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_stats: tuple[int, int] | None = None,
    lazy_stats: bool = False,
) -> DataFrame:
    """(id_col, score_ppm): mean per-token negative log-likelihood under a
    +1-smoothed unigram language model trained on the corpus itself —
    the CCNet/Gopher-family "perplexity filter" in its engine-portable
    form. score_ppm is mean NLL in nats × 1e6 (log-perplexity), so LOW =
    fluent/typical, HIGH = surprising (gibberish, OOV soup, boilerplate
    of rare symbols). A real deployment scores against a model trained on
    a trusted corpus (Wikipedia in CCNet); self-scoring is the same plan
    with the vocabulary built from a different DataFrame.

    Determinism contract: nll_ppm = floor(1e6·ln((N+V)/(ct+1))) has a
    vocabulary-sized set of DISTINCT inputs (it depends only on the
    term's corpus count ct and two corpus constants — the tfidf/bm25
    per-term-floor convention's exposure bound, even though the
    expression is evaluated per (doc,term) row: identical IEEE inputs
    give identical results); the per-document score is then
    sum(tf·nll_ppm) DIV sum(tf) — exact integer arithmetic end to end,
    so cross-engine agreement is bit-exact given libm-equal ln() on the
    vocabulary.

    Scale shape (plan-audited): the main job tokenizes the corpus ONCE —
    per-term corpus counts come from a whole-partition window over the
    (doc,term) tf relation, not a vocabulary self-join, so there is no
    second explode pass and no "vocabulary must fit in a broadcast"
    assumption. Shuffled relations are (doc,term) pairs keyed by
    (doc,term) → term → doc; no shuffle carries token positions. The two
    model scalars (N = total tokens, V = vocab size) cost one extra
    linear stats pass — pass ``corpus_stats=(n_total, v_size)`` to skip
    it when scoring many batches against one frozen model (the
    bm25_scores convention), or ``lazy_stats=True`` to fold the stats
    pass into the plan as a broadcast one-row cross join instead of an
    eager driver job: same values (long addition is exact, the double
    cast matches the literal path bit-for-bit below 2⁵³), but the call
    launches NO jobs — the form a lazily-composed pipeline stage
    (curate()) requires. The cost is that the (doc,term) relation is
    derived twice at execution; the eager default keeps the main job
    single-scan."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__term")
    )
    tf = toks.groupBy(id_col, "__term").agg(F.count(F.lit(1)).alias("__tf"))
    from pyspark.sql import Window

    wt = Window.partitionBy("__term")
    with_ct = tf.withColumn("__ct", F.sum("__tf").over(wt))
    if corpus_stats is not None or not lazy_stats:
        if corpus_stats is not None:
            n_total, v_size = corpus_stats
        else:
            n_total, v_size = tf.agg(
                F.sum("__tf"), F.count_distinct("__term")
            ).first()
        nv = F.lit(float(n_total)) + F.lit(float(v_size))
    else:
        stats = tf.agg(
            F.sum("__tf").alias("__n_total"),
            F.count_distinct("__term").alias("__v"),
        )
        with_ct = with_ct.join(F.broadcast(stats))
        nv = (F.col("__n_total") + F.col("__v")).cast("double")
    scored = with_ct.withColumn(
        "__nll_ppm",
        F.floor(
            F.lit(1_000_000.0)
            * F.log(nv / (F.col("__ct") + F.lit(1.0)))
        ).cast("long"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum(F.col("__tf") * F.col("__nll_ppm")).alias("__tot"),
            F.sum("__tf").alias("__dl"),
        )
        .select(
            id_col,
            F.expr("__tot DIV __dl").cast("long").alias("score_ppm"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 results with deterministic (score desc, id asc) tie-break
    — a TakeOrderedAndProject, never a global sort."""
    id_col = kwargs.get("id_col", "doc_id")
    return (
        bm25_scores(docs, query_terms, **kwargs)
        .orderBy(F.col("score_ppm").desc(), F.col(id_col).asc())
        .limit(k)
    )
