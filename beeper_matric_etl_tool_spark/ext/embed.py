"""Hashed-feature document embeddings + DSIR importance resampling —
the feature-hashing trick (Weinberger et al. 2009) and hashed-n-gram
data selection (Xie et al. 2023, DSIR; both public methods) as pure
Spark column algebra (SURVEY §2.12 similarity/text tier).

Why it exists: every embedding-consuming operator in the engine
(SemDeDup, embedding near-dup, IVF/PQ similarity search) reads an
`array<float>` column that, in the reference pipeline, arrives from an
external model. This module is the engine-native producer: a
deterministic text → vector map good enough for *structural* uses —
near-dup blocking, clustering, coarse retrieval — with zero external
dependencies and zero Python in the hot path.

The map: each token contributes ±1 to one of `dim` buckets; bucket and
sign come from disjoint hex regions of ONE md5 per token (digits 1-8 →
bucket, digit 9 → sign — independent bits of the same digest, so one
hash pays for both decisions). Signed hashing keeps the estimator of
the inner product unbiased (the '09 paper's point); the raw vector is
INTEGER-exact and engine-portable (md5 is the same everywhere), which
is what lets the driver oracle replay it bit for bit. L2 normalization
(for cosine consumers) is a float step layered on top.

Scale shape: the whole embedding is computed AT THE ROW — one projection,
no explode, no shuffle, no UDF. The per-row cost is O(dim · n_tokens)
integer adds inside ONE `F.aggregate` fold whose accumulator is the
dense vector; the token-pair array is referenced exactly once, so
Catalyst cannot re-inline the tokenization per bucket (the
`_max_multiplicity` detonation class — see ext/quality.py). A
groupBy-(doc, bucket) formulation would shuffle dim·|corpus| rows for
the same answer; this one shuffles nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.text import tokens

#: default embedding width — wide enough that random 60-token docs
#: rarely collide into near-identical vectors, small enough that the
#: O(dim·n_tokens) per-row fold stays cheap.
DEFAULT_DIM = 64


def _bucket_sign_pairs(text: Column | str, dim: int) -> Column:
    """array<struct<b: long, s: long>> — one (bucket, ±1) pair per token,
    from one md5 per token (module docstring). Empty tokens (split's
    trailing-'' artifact) are filtered before hashing."""
    toks = F.filter(tokens(text), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: F.struct(
            (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dim).alias(
                "b"
            ),
            F.when(
                F.conv(F.substring(F.md5(t), 9, 1), 16, 10).cast("long") % 2 == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("s"),
        ),
    )


def hashed_features(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """The signed hashed-TF vector as ``array<long>`` of length ``dim`` —
    integer-exact, deterministic, engine-portable (the driver oracle
    replays it in DuckDB). One fold, accumulator = the dense vector,
    token pairs referenced once."""
    if dim < 1:
        raise ValueError(f"hashed_features: dim={dim} must be >= 1")
    pairs = _bucket_sign_pairs(text, dim)
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return F.aggregate(
        pairs,
        zero,
        lambda acc, x: F.transform(
            acc,
            lambda v, i: v
            + F.when(i.cast("long") == x["b"], x["s"]).otherwise(
                F.lit(0).cast("long")
            ),
        ),
    )


def hashed_counts(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """The UNSIGNED hashed-TF vector (``array<long>`` of non-negative
    bucket counts) — the distribution form importance resampling reads
    (a signed wash would make 'probability of bucket b' meaningless).
    Same bucket hash as :func:`hashed_features`, sign forced +1."""
    if dim < 1:
        raise ValueError(f"hashed_counts: dim={dim} must be >= 1")
    toks = F.filter(tokens(text), lambda t: t != "")
    buckets = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        % dim,
    )
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return F.aggregate(
        buckets,
        zero,
        lambda acc, b: F.transform(
            acc,
            lambda v, i: v
            + F.when(i.cast("long") == b, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
    )


def bucket_totals(
    df: DataFrame, text_col: str = "text", dim: int = DEFAULT_DIM
) -> list[int]:
    """Corpus-level bucket totals (Σ over docs of each bucket's count) as
    a driver-resident dim-list — the sufficient statistic importance
    weighting needs from each corpus. Scale shape: per-doc vectors fold
    at the row, posexplode fans out dim small longs per doc, and the
    groupBy's map-side partial aggregation collapses each partition to
    ≤ dim rows before the shuffle — the exchange carries O(dim ·
    n_partitions) longs regardless of corpus size; the collect is dim
    rows. (A per-bucket `F.sum(element_at(vec, i))` agg would re-inline
    the tokenizing fold dim times per row — the `_max_multiplicity`
    detonation class — which is why the explode form is the right one.)"""
    exploded = df.select(
        F.posexplode(hashed_counts(text_col, dim=dim)).alias("b", "c")
    )
    rows = exploded.groupBy("b").agg(F.sum("c").alias("t")).collect()
    out = [0] * dim
    for r in rows:
        out[r["b"]] = int(r["t"])
    return out


def importance_weights_ppm(
    target_totals: list[int], source_totals: list[int]
) -> list[int]:
    """Per-bucket DSIR importance log-weights (Xie et al. 2023, public
    method), ppm-floored integers: w_b = floor(10⁶ · ln(p̂_target(b) /
    p̂_source(b))) under +1 smoothing. Computed driver-side from the two
    dim-vectors (bounded — dim entries); the ln of the composed RATIO is
    one libm call per bucket, the same expression the DuckDB oracle
    evaluates, so the floored weights agree across planes."""
    import math

    if len(target_totals) != len(source_totals):
        raise ValueError(
            f"importance_weights_ppm: dim mismatch "
            f"{len(target_totals)} vs {len(source_totals)}"
        )
    dim = len(target_totals)
    t_sum = sum(target_totals) + dim
    s_sum = sum(source_totals) + dim
    return [
        math.floor(
            1_000_000.0
            * math.log(((tb + 1) * s_sum) / ((sb + 1) * t_sum))
        )
        for tb, sb in zip(target_totals, source_totals)
    ]


def importance_scores(
    df: DataFrame,
    weights_ppm: list[int],
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    out_col: str = "dsir_score_ppm",
) -> DataFrame:
    """Attach the per-document importance score: Σ_b count(doc, b) ·
    w_b — the hashed-feature estimate of how much more target-like than
    source-like the document reads (positive = resample toward it).
    Integer-exact given the frozen weights (long count × long ppm weight,
    long sum — engine-portable, oracle-replayable). Scale shape: the
    count vector folds at the row and is referenced ONCE by the zip_with
    dot product; the weights ride in as a literal array — no shuffle, no
    join, no broadcast."""
    if len(weights_ppm) != dim:
        raise ValueError(
            f"importance_scores: {len(weights_ppm)} weights for dim={dim}"
        )
    wlit = F.array(*[F.lit(int(w)).cast("long") for w in weights_ppm])
    vec = hashed_counts(text_col, dim=dim)
    score = F.aggregate(
        F.zip_with(vec, wlit, lambda c, w: c * w),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out_col, score)


def importance_resample(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    min_score_ppm: int = 0,
    out_col: str = "dsir_score_ppm",
    lazy: bool = False,
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR in one call: estimate bucket distributions of ``target``
    (the trusted domain sample — small, e.g. a quality reference corpus)
    and of ``df`` itself (the source), weight, score, and keep documents
    with score ≥ ``min_score_ppm`` (0 = 'more target-like than
    source-like'). Survivors carry ``out_col`` for audit or downstream
    quota sampling (`ext/pipeline.py:sample_quota` composes for
    fixed-size draws).

    ``lazy=False`` (default): two eager bucket-total collects feed the
    weights in as a literal array — the tightest scoring plan (map-only,
    no join), right when the caller is about to act on the result
    anyway. ``lazy=True`` launches ZERO jobs at call time (the
    `unigram_nll_scores(lazy_stats=True)` precedent — the form
    `curate()` needs to keep its no-jobs contract): the weights become a
    dim-sized relation (source buckets left-joined with target buckets,
    sums as a broadcast one-row cross join) and scoring joins the
    exploded (doc, bucket, count) rows against the broadcast weights.
    Same integer weights, same scores (the ln() input set is dim-sized
    either way; pinned eager ≡ lazy in tests — with the caveat that at
    count-product scale beyond 2⁵³ the lazy plane's cast-then-divide may
    differ from Python's exact int/int division by one ulp before the
    floor, the same bounded exposure the ln() convention documents), at
    the cost of deriving ``df``'s lineage twice at execution (totals +
    scoring) — persist the input, as curate()'s cache boundary does,
    when that matters. The lazy join keys on ``id_col`` (must be unique;
    text never enters a shuffle key)."""
    if not lazy:
        w = importance_weights_ppm(
            bucket_totals(target, text_col=text_col, dim=dim),
            bucket_totals(df, text_col=text_col, dim=dim),
        )
        scored = importance_scores(
            df, w, text_col=text_col, dim=dim, out_col=out_col
        )
        return scored.filter(F.col(out_col) >= F.lit(int(min_score_ppm)))

    src = (
        df.select(F.posexplode(hashed_counts(text_col, dim=dim)).alias("__b", "__c"))
        .groupBy("__b")
        .agg(F.sum("__c").alias("__sc"))
    )
    tgt = (
        target.select(
            F.posexplode(hashed_counts(text_col, dim=dim)).alias("__b", "__c")
        )
        .groupBy("__b")
        .agg(F.sum("__c").alias("__tc"))
    )
    # +dim smoothing mass mirrors importance_weights_ppm exactly; the two
    # one-row sums broadcast onto the dim-sized weight relation. A bucket
    # absent from src carries no scored mass (the source totals come from
    # the very frame being scored), so the left join covers every bucket
    # a score can touch; absent-from-target buckets coalesce to 0.
    sums = F.broadcast(
        src.agg((F.sum("__sc") + F.lit(dim)).alias("__ssum")).crossJoin(
            tgt.agg((F.sum("__tc") + F.lit(dim)).alias("__tsum"))
        ).select(
            F.coalesce("__ssum", F.lit(dim)).alias("__ssum"),
            F.coalesce("__tsum", F.lit(dim)).alias("__tsum"),
        )
    )
    weights = (
        src.join(tgt, on="__b", how="left")
        .crossJoin(sums)
        .select(
            "__b",
            F.floor(
                F.lit(1_000_000.0)
                * F.log(
                    ((F.coalesce(F.col("__tc"), F.lit(0)) + F.lit(1)) * F.col("__ssum"))
                    .cast("double")
                    / ((F.col("__sc") + F.lit(1)) * F.col("__tsum")).cast("double")
                )
            ).cast("long").alias("__w"),
        )
    )
    per_doc = (
        df.select(
            F.col(id_col),
            F.posexplode(hashed_counts(text_col, dim=dim)).alias("__b", "__c"),
        )
        .filter(F.col("__c") > 0)
        .join(F.broadcast(weights), on="__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__c") * F.col("__w")).alias(out_col))
    )
    # docs with no tokens fold to score 0 in the eager path — mirror that
    # (left join on the UNIQUE id keeps text out of every shuffle key)
    scored = df.join(per_doc, on=id_col, how="left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0))
    )
    return scored.filter(F.col(out_col) >= F.lit(int(min_score_ppm)))


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    out_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Attach the hashed-feature embedding as ``array<float>`` —
    L2-normalized by default so cosine consumers (`ext/semdedup.py`,
    `ext/similarity.py`, `ext/quantization.py`) can read it like any
    model-produced embedding column. ``normalize=False`` keeps the raw
    integer counts cast to float (dot-product consumers). The all-zero
    vector (empty doc, or a signed wash) stays all-zero rather than
    dividing by zero. Identical texts embed identically by construction
    — hashed embeddings compose with the embedding-dedup tier without a
    model in the loop."""
    vec = hashed_features(text_col, dim=dim)
    if not normalize:
        return df.withColumn(
            out_col, F.transform(vec, lambda v: v.cast("float"))
        )
    # project the integer vector, then the SCALAR norm, each through its
    # own column — the transform lambda below references the norm as a
    # plain column, never re-evaluating the O(dim) fold per element
    # (Spark does not hoist subexpressions out of higher-order-function
    # lambdas, so an inlined norm would cost O(dim²) per row)
    tmp = f"__{out_col}_raw"
    tmp_n = f"__{out_col}_norm"
    norm = F.sqrt(
        F.aggregate(
            F.col(tmp),
            F.lit(0.0),
            lambda acc, v: acc + (v * v).cast("double"),
        )
    )
    return (
        df.withColumn(tmp, vec)
        .withColumn(tmp_n, norm)
        .withColumn(
            out_col,
            F.transform(
                F.col(tmp),
                lambda v: F.when(
                    F.col(tmp_n) > 0.0, v.cast("double") / F.col(tmp_n)
                )
                .otherwise(F.lit(0.0))
                .cast("float"),
            ),
        )
        .drop(tmp, tmp_n)
    )
