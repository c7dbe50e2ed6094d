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
    toks_col: str | None = None,
) -> DataFrame:
    """(id_col, score_ppm, n_matched) per document matching ≥1 query term,
    scored with Okapi BM25 (k1 = k1_x100/100, b = b_x100/100 — integer
    parameters keep the call site engine-portable). ``corpus_stats`` is an
    optional precomputed (n_docs, avgdl) — pass it to skip the stats scan
    when serving many queries over one corpus (see module docstring).
    ``toks_col`` names an ALREADY-TOKENIZED array column on ``docs``
    (``tokens(text_col)``'s output, typically a checkpointed share across
    several scorers — r13): when given, the tokenize pass is skipped and
    ``text_col`` is never read. Scores are identical either way (tokens()
    is deterministic).

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

    toks_expr = F.col(toks_col) if toks_col else tokens(text_col)
    base = docs.select(F.col(id_col), toks_expr.alias("__toks")).select(
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
    toks_col: str | None = None,
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
    the cost of deriving the counts relation twice at execution.
    ``toks_col`` (r13): see `bm25_scores` — a pre-tokenized array column
    on ``docs`` that skips the tokenize pass (scoring side only; a
    ``reference`` frame is always tokenized from its ``text_col``)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.col(toks_col) if toks_col else tokens(text_col)).alias(
            "__term"
        ),
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
    — a TakeOrderedAndProject, never a global sort — plus a ``rank``
    column (row_number over the SAME order, windowed over the k rows
    only) so the output feeds :func:`rrf_fuse` directly."""
    from pyspark.sql import Window

    id_col = kwargs.get("id_col", "doc_id")
    order = [F.col("score_ppm").desc(), F.col(id_col).asc()]
    return (
        bm25_scores(docs, query_terms, **kwargs)
        .orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )


def bigram_nll_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lambda_ppm: int = 700_000,
    reference: DataFrame | None = None,
    lazy_stats: bool = False,
    corpus_stats: tuple[int, int] | None = None,
    toks_col: str | None = None,
) -> DataFrame:
    """(id_col, score_ppm) for every document with ≥2 tokens: mean
    per-transition negative log-likelihood under a Jelinek-Mercer
    interpolated bigram language model — the CCNet perplexity filter one
    order up, where "the the the" scores BADLY (the unigram model loves
    it) and natural word order scores well:

        P(w2 | w1) = λ · c(w1,w2)/c(w1) + (1−λ) · (c(w2)+1)/(N+V)

    with λ = lambda_ppm/1e6 (default 0.7), c(·) corpus counts, and the
    +1-smoothed unigram as the backoff mass so unseen continuations get
    the `unigram_nll_scores` floor rather than −∞.

    TWO modes, mirroring `unigram_nll_scores`:

    - ``reference=None`` (self-scoring): the model IS the scored batch —
      the exploratory mode the driver oracle replays.
    - ``reference=<docs frame>`` (frozen model — the CCNet deployment
      shape): all counts (c12, c1, c2, N, V) come from the REFERENCE
      corpus. Transitions the reference never saw get zero bigram mass
      (when c(w1)=0 the λ-term is 0, not 0/0); fully-OOV transitions
      score at the smoothing maximum ln((N+V)/1) exactly like the
      unigram scorer. Scoring the same document yields the same score
      in ANY batch (pinned in tests).

    Determinism contract: the interpolated probability has a BIGRAM-
    vocabulary-sized set of distinct IEEE inputs — all counts are exact
    longs, λ and (N+V) are per-run literals, and the float chain
    (two divides, one multiply-add, one ln) is evaluated identically by
    any IEEE engine, so nll_ppm = floor(1e6·ln(1/P)) flips nowhere; the
    per-document score is sum(tf·nll_ppm) DIV sum(tf), exact integers.

    Scale shape: ONE tokenize pass; the transition relation is built by
    zipping each token array with its own tail (zero-shuffle fan-out,
    ~n_tokens rows), then three (doc,bigram)-keyed/vocabulary-keyed
    exchanges mirror the unigram scorer's plan — window per-bigram
    counts, a vocabulary-sized unigram join (left word + right word),
    never a corpus self-join.

    Stats modes, mirroring `unigram_nll_scores` exactly: by default the
    (N, V) smoothing denominator is ONE eager scalar job at composition
    time; ``lazy_stats=True`` folds it into the plan as a broadcast
    one-row cross join — zero jobs at composition (the form a zero-jobs
    context like a curate() stage needs), same values (long sums are
    exact; the double cast matches the literal path below 2⁵³), at the
    cost of deriving the unigram relation twice at execution.
    ``corpus_stats=(n_total, v_size)`` supplies frozen precomputed stats
    (reference-mode reuse) and overrides both.
    ``toks_col`` (r13): see `bm25_scores` — a pre-tokenized array column
    on ``docs`` that skips the tokenize pass (scoring side only)."""
    from pyspark.sql import Window

    lam = F.lit(lambda_ppm / 1_000_000.0)
    toks = docs.select(
        F.col(id_col),
        (F.col(toks_col) if toks_col else tokens(text_col)).alias("__toks"),
    )
    pairs = (
        toks.filter(F.size("__toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice(
                        F.col("__toks"), 1, F.size("__toks") - 1
                    ),
                    F.slice(
                        F.col("__toks"), 2, F.size("__toks") - 1
                    ),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("__bg"),
        )
        .select(id_col, F.col("__bg.w1").alias("__w1"), F.col("__bg.w2").alias("__w2"))
    )
    tf = pairs.groupBy(id_col, "__w1", "__w2").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    if reference is not None:
        # frozen model: every count comes from the reference corpus;
        # both count relations are vocabulary-shaped term-keyed joins
        rtoks = reference.select(tokens(text_col).alias("__toks"))
        rbg = (
            rtoks.filter(F.size("__toks") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
                        F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    )
                ).alias("__bg")
            )
            .select(
                F.col("__bg.w1").alias("__w1"), F.col("__bg.w2").alias("__w2")
            )
            .groupBy("__w1", "__w2")
            .agg(F.count(F.lit(1)).alias("__c12"))
        )
        with_c12 = tf.join(rbg, on=["__w1", "__w2"], how="left").withColumn(
            "__c12", F.coalesce(F.col("__c12"), F.lit(0))
        )
        uni = (
            rtoks.select(F.explode("__toks").alias("__term"))
            .groupBy("__term")
            .agg(F.count(F.lit(1)).alias("__ct"))
        )
        join_how = "left"
    else:
        # corpus bigram count via window over the (doc, bigram) tf
        # relation — the unigram scorer's no-vocab-broadcast trick
        wbg = Window.partitionBy("__w1", "__w2")
        with_c12 = tf.withColumn("__c12", F.sum("__tf").over(wbg))
        # unigram counts from the SAME tokenize pass (full token stream —
        # c(w1) must count w1 everywhere, incl. document-final positions)
        uni = (
            toks.select(F.explode("__toks").alias("__term"))
            .groupBy("__term")
            .agg(F.count(F.lit(1)).alias("__ct"))
        )
        join_how = "inner"  # self-mode: every scored term is in-vocabulary
    if corpus_stats is not None or not lazy_stats:
        if corpus_stats is not None:
            n_total, v_size = corpus_stats
        else:
            n_total, v_size = uni.agg(
                F.sum("__ct"), F.count_distinct("__term")
            ).first()
        nv = F.lit(float((n_total or 0) + (v_size or 0)))
    else:
        stats = uni.agg(
            F.sum("__ct").alias("__n_total"),
            F.count_distinct("__term").alias("__v"),
        )
        with_c12 = with_c12.join(F.broadcast(stats))
        nv = (
            F.coalesce(F.col("__n_total"), F.lit(0)) + F.col("__v")
        ).cast("double")
    c1 = F.coalesce(F.col("__c1"), F.lit(0)).cast("double")
    c2 = F.coalesce(F.col("__c2"), F.lit(0))
    # zero continuation mass when w1 is OOV — the λ-term vanishes
    # instead of evaluating 0/0 (reference mode only; self mode never
    # sees c1=0 and keeps the oracle-replayed expression shape)
    bigram_term = F.when(
        c1 > 0.0, lam * F.col("__c12").cast("double") / c1
    ).otherwise(F.lit(0.0))
    scored = (
        with_c12.join(
            uni.select(
                F.col("__term").alias("__w1"), F.col("__ct").alias("__c1")
            ),
            on="__w1",
            how=join_how,
        )
        .join(
            uni.select(
                F.col("__term").alias("__w2"), F.col("__ct").alias("__c2")
            ),
            on="__w2",
            how=join_how,
        )
        .withColumn(
            "__nll_ppm",
            F.floor(
                F.lit(-1_000_000.0)
                * F.log(
                    bigram_term
                    + (F.lit(1.0) - lam)
                    * (c2 + F.lit(1.0)).cast("double")
                    / nv
                )
            ).cast("long"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum(F.col("__tf") * F.col("__nll_ppm")).alias("__tot"),
            F.sum("__tf").alias("__n"),
        )
        .select(
            id_col,
            F.expr("__tot DIV __n").cast("long").alias("score_ppm"),
        )
    )


#: the exact-long score bound: (dot²·1e9) stays under 2⁶³−1 only while
#: dot ≤ floor(√(2⁶³/1e9)) = 96,038 — held to 96,000 for headroom. A
#: larger dot means ~10⁵ co-bucketed (doc, query) token-count mass,
#: i.e. a pathological document; the guard raises rather than letting
#: the long wrap negative and corrupt the ranking.
DENSE_MAX_DOT = 96_000


def dense_hash_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by hashed-feature cosine similarity to the query —
    the DENSE leg a hybrid retrieval stack pairs with BM25 (`rrf_fuse`),
    model-free: both sides embed through `ext/embed.py:hashed_counts`'
    bucket formula, so identical wording maps to identical buckets.

    Ranking is integer-exact: with d = doc count vector, q = query count
    vector, cos²(d,q) ∝ dot(d,q)²/‖d‖² (the query norm is constant across
    docs and drops out of the ordering), so

        score = (dot² · 1e9) DIV ‖d‖²

    is a pure long expression — no float enters the comparison, so the
    (score desc, id asc) order is engine-portable bit for bit. Overflow
    needs dot > √(2⁶³/1e9) ≈ 96k co-bucketed (doc,query) token-count
    mass — raise-guarded at ``DENSE_MAX_DOT`` BEFORE the squaring, so a
    pathological document fails loudly instead of wrapping the long and
    corrupting the ranking. Output carries ``rank`` (windowed over the k
    rows only), feeding :func:`rrf_fuse` directly.

    Scale shape: the query vector rides in as a dim-length literal
    (hashlib on the driver — same md5-prefix formula as the column
    kernel, pinned in tests); scoring is one map-only pass over docs
    (the count vector folds at the row, two bounded references), and the
    k rows come from TakeOrderedAndProject — no shuffle at all."""
    import hashlib

    if not query_terms:
        raise ValueError("dense_hash_topk: query_terms must be non-empty")
    qv = [0] * dim
    for t in query_terms:
        if t:
            qv[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim] += 1
    from beeper_matric_etl_tool_spark.ext.embed import hashed_counts

    qlit = F.array(*[F.lit(int(c)).cast("long") for c in qv])
    vec = hashed_counts(text_col, dim=dim)
    dot = F.aggregate(
        F.zip_with(vec, qlit, lambda c, q: c * q),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm2 = F.aggregate(
        vec,
        F.lit(0).cast("long"),
        lambda acc, c: acc + c * c,
    )
    score = F.when(
        F.col("__dot") > F.lit(DENSE_MAX_DOT),
        F.raise_error(
            F.lit(
                "dense_hash_topk: dot product exceeds the exact-long "
                f"score bound ({DENSE_MAX_DOT}) — dot²·1e9 would "
                "overflow int64; lower dim collision mass or "
                "pre-truncate documents"
            )
        ).cast("long"),
    ).otherwise(
        F.expr("(__dot * __dot * 1000000000) DIV __norm2").cast("long")
    )
    scored = (
        docs.select(
            F.col(id_col), dot.alias("__dot"), norm2.alias("__norm2")
        )
        .filter(F.col("__dot") > 0)
        .select(id_col, score.alias("score_ppb"))
    )
    order = [F.col("score_ppb").desc(), F.col(id_col).asc()]
    from pyspark.sql import Window

    return (
        scored.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )


def dense_hash_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """The QUERY-FRAME form of :func:`dense_hash_topk` — score a whole
    evaluation sweep's query set in ONE corpus pass instead of one job
    per query. Each query row embeds through the SAME
    `ext/embed.py:hashed_counts` bucket formula the per-query form's
    driver-side hashlib uses (`tokens(query_text_col)` defines the
    terms, so a query whose text is the space-joined term list returns
    IDENTICAL results to the per-query loop — pinned in tests), and the
    ranking stays integer-exact: score = (dot²·1e9) DIV ‖d‖², same
    overflow raise at ``DENSE_MAX_DOT``.

    Output: one row per (query, hit) — (query_id_col, id_col,
    score_ppb, rank), rank windowed per query, ready for per-query RRF
    fusion or `ext/similarity.py:evaluate_recall`.

    Scale shape: the query frame BROADCASTS (it is an eval set, not a
    corpus — thousands of rows, not millions); each document's count
    vector and squared norm are computed ONCE in the projection BELOW
    the broadcast join (both are referenced by every pair row, which is
    exactly what stops Catalyst's CollapseProject from re-inlining the
    O(dim·n_tokens) fold per query — the `embed_documents` two-column
    pattern), so the join stage is |docs|·|queries| integer dot products
    over resident vectors with NO shuffle. Top-k then prunes in two
    bounded windows: a local rank per (input partition, query) cuts each
    partition's contribution to k rows before any exchange, and the
    physical plan carries TWO rank exchanges — one per window — both
    k-bounded map-side by WindowGroupLimit(Partial), so each shuffles
    ≤ k rows per (partition, query) group and the per-query global sort
    re-ranks ≤ k·n_partitions candidates — never the corpus
    (`sample_quota two_phase`'s containment argument: every global
    top-k row is its partition's local top-k). The k-bounded-exchange
    property is pinned by a plan test, not prose."""
    from pyspark.sql import Window

    from beeper_matric_etl_tool_spark.ext.embed import hashed_counts

    q = queries.select(
        F.col(query_id_col).alias("__bq_id"),
        hashed_counts(query_text_col, dim=dim).alias("__qv"),
    )
    vec = hashed_counts(text_col, dim=dim)
    d = docs.select(F.col(id_col), vec.alias("__dv")).withColumn(
        "__norm2",
        F.aggregate(
            F.col("__dv"), F.lit(0).cast("long"), lambda acc, c: acc + c * c
        ),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__dv"), F.col("__qv"), lambda c, qq: c * qq),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = F.when(
        F.col("__dot") > F.lit(DENSE_MAX_DOT),
        F.raise_error(
            F.lit(
                "dense_hash_topk_batch: dot product exceeds the exact-long "
                f"score bound ({DENSE_MAX_DOT}) — dot²·1e9 would overflow "
                "int64; lower dim collision mass or pre-truncate documents"
            )
        ).cast("long"),
    ).otherwise(
        F.expr("(__dot * __dot * 1000000000) DIV __norm2").cast("long")
    )
    scored = (
        d.crossJoin(F.broadcast(q))
        .select(F.col("__bq_id"), F.col(id_col), dot.alias("__dot"), "__norm2")
        .filter(F.col("__dot") > 0)
        .select("__bq_id", id_col, score.alias("score_ppb"))
    )
    order = [F.col("score_ppb").desc(), F.col(id_col).asc()]
    wl = Window.partitionBy(F.spark_partition_id(), "__bq_id").orderBy(*order)
    wg = Window.partitionBy("__bq_id").orderBy(*order)
    return (
        scored.withColumn("__lrk", F.row_number().over(wl))
        .filter(F.col("__lrk") <= k)
        .drop("__lrk")
        .withColumn("rank", F.row_number().over(wg))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("__bq_id", query_id_col)
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    weights: list[int] | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009, public
    method) over any number of ranked lists: each (id, rank) row
    contributes 1/(k0 + rank), summed per id —

        rrf_ppb(id) = Σ_lists  1e9 DIV (k0 + rank)

    as exact integer arithmetic (the ppb floor makes the fused score and
    its ordering engine-portable; k0=60 is the paper's constant). Returns
    (id_col, rrf_ppb, n_lists) sorted (rrf_ppb desc, id asc) — ids
    missing from a list simply contribute nothing, the property that
    makes RRF robust to incomparable score scales (BM25 ppm vs cosine
    ppb never meet — only ranks do).

    ``weights`` (optional, one non-negative integer per list) scales
    each list's contribution — weighted RRF, the common production
    variant when one retriever is trusted more: contribution =
    w·(1e9 DIV (k0+rank)), still exact integers. None = all 1s (the
    paper's form).

    Scale shape: inputs are top-k lists (k rows each), so the union +
    groupBy runs on lists-of-k rows regardless of corpus size; fusion
    cost is independent of the corpus by construction."""
    if not ranked:
        raise ValueError("rrf_fuse: ranked is empty")
    if weights is None:
        weights = [1] * len(ranked)
    if len(weights) != len(ranked) or any(int(w) < 0 for w in weights):
        raise ValueError(
            f"rrf_fuse: weights must be {len(ranked)} non-negative "
            f"integers, got {weights}"
        )
    legs = [
        df.select(
            F.col(id_col),
            F.expr(f"{int(w)} * (1000000000 DIV ({int(k0)} + {rank_col}))")
            .cast("long")
            .alias("__rrf"),
        )
        for df, w in zip(ranked, weights)
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return (
        out.groupBy(id_col)
        .agg(
            F.sum("__rrf").alias("rrf_ppb"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("rrf_ppb").desc(), F.col(id_col).asc())
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
    materialize_unigrams: bool = True,
    toks_col: str | None = None,
) -> DataFrame:
    """Top-``k`` two-word collocations by pointwise mutual information
    (Church & Hanks 1990) — (w1, w2, c12, pmi_ppm, rank). The corpus-
    statistics surface a training-data pipeline reads to find multiword
    units worth protecting from tokenizer splits, boilerplate phrases
    worth auditing, and contamination-marker phrases:

        pmi_ppm = floor(1e6 · ln( (c12/c1) · (N/c2) ))

    with c12 the corpus bigram count, c1/c2 unigram counts, N total
    tokens. ``min_count`` is the classic rare-pair floor — PMI is
    maximized by hapax pairs, so unfloored output is all noise.

    Determinism contract: all counts are exact longs; the float chain
    (two divides, one multiply, one ln, one floor) has BIGRAM-VOCABULARY-
    many distinct inputs and is evaluated identically by any IEEE engine
    (the lm2-leg exposure argument); ranking ties break (w1, w2) asc.

    Scale shape: two tokenize passes (bigrams via the zero-shuffle
    zip-with-own-tail — `bigram_nll_scores`'s plan — and the unigram
    explode); the (w1,w2) count agg is map-side combined into a
    bigram-vocabulary-sized relation, the two unigram joins are
    vocabulary-sized, and the top-k is a TakeOrderedAndProject — no
    global sort, no corpus-sized join, nothing quadratic. The unigram
    count relation has THREE consumers (w1 join, w2 join, N-total row);
    ``materialize_unigrams=True`` (default) localCheckpoints that
    vocabulary-sized relation once (the `knn_multiprobe` precedent), so
    it computes exactly once REGARDLESS of AQE/exchange-reuse config —
    at the cost of one eager job at composition. Pass False only when
    lazy composition matters more and AQE's runtime exchange reuse (the
    engine default; measured: 2 ReusedQueryStage at sf0.001) can be
    relied on — without it the static planner may recompute the
    tokenize+count pass per consumer."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        (F.col(toks_col) if toks_col else tokens(text_col)).alias("__toks"),
    )
    pairs = (
        toks.filter(F.size("__toks") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
                    F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("__bg")
        )
        .select(F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = (
        toks.select(F.explode("__toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    if materialize_unigrams:
        # one vocabulary-sized materialization; the plan is a window-free
        # explode+agg, outside the documented quality+PII+window persist
        # hazard class
        uni = uni.localCheckpoint(eager=True)
    stats = uni.agg(F.sum("ct").cast("long").alias("n_total"))
    scored = (
        c12.filter(F.col("c12") >= F.lit(int(min_count)))
        .join(uni.select(F.col("term").alias("w1"), F.col("ct").alias("c1")), on="w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("ct").alias("c2")), on="w2")
        .crossJoin(F.broadcast(stats))
        .select(
            "w1", "w2", "c12",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    (F.col("c12").cast("double") / F.col("c1").cast("double"))
                    * (F.col("n_total").cast("double") / F.col("c2").cast("double"))
                )
            ).cast("long").alias("pmi_ppm"),
        )
    )
    order = [F.col("pmi_ppm").desc(), F.col("w1").asc(), F.col("w2").asc()]
    return (
        scored.orderBy(*order)
        .limit(int(k))
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select("w1", "w2", "c12", "pmi_ppm", "rank")
    )
