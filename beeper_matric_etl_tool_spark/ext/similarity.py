"""Similarity search over embedding columns (SURVEY §2.12).

The dot product / cosine is pure column algebra — ``zip_with`` multiply +
``aggregate`` sum run inside codegen on the JVM; no Python, no UDF. Two
search strategies:

- **Brute force** (`cosine_topk`): broadcast the (small) query set against
  the corpus, window top-k per query. Exact; cost O(|queries|·|corpus|·dim).
  The baseline and the oracle-checkable path.
- **IVF-style partition pruning** (`cosine_topk_partitioned`): restrict each
  probe to its coarse partition (here the `label` column stands in for a
  centroid assignment; a real pipeline k-means-assigns offline). Cost drops
  by the partition fan-out; the partition key also becomes the parquet
  partition column at scale, so a probe reads ~1/k of the data — classic
  IVF with nprobe=1.

Determinism contract: ranking uses the raw double cosine with vec_id as
tie-break; float arithmetic is sequential left-fold in both Spark and the
oracle, so scores agree bit-for-bit on the same float32 inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-fold — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    partition_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per query row (self-matches excluded).

    ``queries`` is broadcast (it is the small side by construction); the scan
    over ``corpus`` is a single pass. With ``partition_col`` set, candidate
    pairs are additionally required to share that column — the IVF pruning.
    """
    part_q = [F.col(partition_col).alias("__part")] if partition_col else []
    # precompute each side's norm ONCE — naive cosine-per-pair would redo the
    # |corpus| norm folds |queries| times (and vice versa)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv"), *part_q
    ).withColumn("__qn", norm(F.col("__qv")))
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv"), *part_q
    ).withColumn("__cn", norm(F.col("__cv")))
    if partition_col is not None:
        pairs = F.broadcast(q).join(c, on="__part").drop("__part")
    else:
        pairs = F.broadcast(q).crossJoin(c)
    # ppm fixed-point: floor of bit-identical doubles is reproducible across
    # engines; round() is not (decimal-boundary ulp flips). The association
    # ORDER matters for bit-identity: (1e6·dot)/(na·nb), matching the SQL
    # oracle's `1000000 * dot / (...)` parse and search_ivf — 1e6·(dot/norms)
    # can differ by 1 ulp and flip the floor.
    scored = pairs.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine_ppm",
        F.floor(
            (F.lit(1_000_000.0) * dot(F.col("__qv"), F.col("__cv")))
            / (F.col("__qn") * F.col("__cn"))
        ).cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select("query_id", "neighbor_id", "cosine_ppm", F.col("__rank").alias("rank"))
    )
