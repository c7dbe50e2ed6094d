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
    reference: DataFrame | None = None,
) -> DataFrame:
    """(id_col, score_ppm): mean per-token negative log-likelihood under a
    +1-smoothed unigram language model — the CCNet/Gopher-family
    "perplexity filter" in its engine-portable form. score_ppm is mean
    NLL in nats × 1e6 (log-perplexity), so LOW = fluent/typical, HIGH =
    surprising (gibberish, OOV soup, boilerplate of rare symbols).

    TWO modes, explicit about what the model is trained on:

    - ``reference=None`` (self-scoring): the model IS the scored batch —
      term counts, N and V all come from ``docs``. By definition the
      same document scores differently in different batches (the model
      changed); this is the exploratory/within-batch mode and the one
      the driver oracle replays. ``corpus_stats`` here only skips the
      (N, V) scalar job — it does NOT freeze the per-term counts, so it
      is a plan optimization, never a frozen model.
    - ``reference=<docs frame>`` (frozen model — the CCNet deployment
      shape, Wikipedia-scores-the-crawl): the vocabulary and all counts
      come from the REFERENCE corpus; scored terms absent from it are
      OOV with ct=0 (nll = ln((N+V)/1), the +1-smoothing maximum).
      Scoring the same document then yields the same score in ANY batch
      (pinned in tests). ``corpus_stats`` may carry the reference's
      precomputed (n_total, v_size).

    Determinism contract: nll_ppm = floor(1e6·ln((N+V)/(ct+1))) has a
    vocabulary-sized set of DISTINCT inputs (the tfidf/bm25
    per-term-floor convention's exposure bound — identical IEEE inputs
    give identical results even when evaluated per (doc,term) row); the
    per-document score is sum(tf·nll_ppm) DIV sum(tf) — exact integer
    arithmetic end to end.

    Scale shape (plan-audited): self-mode tokenizes the batch ONCE —
    per-term counts come from a whole-partition window over the
    (doc,term) tf relation, no vocabulary self-join, no broadcast-size
    assumption; shuffles carry (doc,term) pairs keyed (doc,term) → term
    → doc, never token positions. Reference mode adds one linear pass
    over the reference (or reuse a persisted/parquet reference frame)
    and a term-keyed equi-join of two vocabulary-shaped relations.
    ``lazy_stats=True`` folds the (N, V) scalar pass into the plan as a
    broadcast one-row cross join instead of an eager driver job — same
    values (long addition exact, double cast matches the literal path
    below 2⁵³), zero jobs at composition (the form curate() needs), at
    the cost of deriving the counts relation twice at execution."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__term")
    )
    tf = toks.groupBy(id_col, "__term").agg(F.count(F.lit(1)).alias("__tf"))

    from pyspark.sql import Window

    if reference is not None:
        vocab = (
            reference.select(F.explode(tokens(text_col)).alias("__term"))
            .groupBy("__term")
            .agg(F.count(F.lit(1)).alias("__ct"))
        )
        with_ct = tf.join(vocab, on="__term", how="left").withColumn(
            "__ct", F.coalesce(F.col("__ct"), F.lit(0))
        )
        stats_src = vocab
    else:
        wt = Window.partitionBy("__term")
        with_ct = tf.withColumn("__ct", F.sum("__tf").over(wt))
        stats_src = tf

    if corpus_stats is not None or not lazy_stats:
        if corpus_stats is not None:
            n_total, v_size = corpus_stats
        else:
            n_total, v_size = stats_src.agg(
                F.sum(
                    "__ct" if reference is not None else "__tf"
                ),
                F.count_distinct("__term"),
            ).first()
        nv = F.lit(float(n_total)) + F.lit(float(v_size))
    else:
        stats = stats_src.agg(
            F.sum("__ct" if reference is not None else "__tf").alias(
                "__n_total"
            ),
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
