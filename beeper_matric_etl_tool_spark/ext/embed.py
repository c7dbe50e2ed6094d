"""Hashed-feature document embeddings — the feature-hashing trick
(Weinberger et al. 2009, public method) as pure Spark column algebra
(SURVEY §2.12 similarity/text tier).

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
    # reference the integer vector through its own projection ONCE per
    # consumer expression (norm, then scale) — two references total,
    # bounded, unlike a per-bucket expansion
    tmp = f"__{out_col}_raw"
    norm = F.sqrt(
        F.aggregate(
            F.col(tmp),
            F.lit(0.0),
            lambda acc, v: acc + (v * v).cast("double"),
        )
    )
    return (
        df.withColumn(tmp, vec)
        .withColumn(
            out_col,
            F.transform(
                F.col(tmp),
                lambda v: F.when(norm > 0.0, v.cast("double") / norm)
                .otherwise(F.lit(0.0))
                .cast("float"),
            ),
        )
        .drop(tmp)
    )
