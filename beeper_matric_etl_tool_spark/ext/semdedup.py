"""Semantic deduplication (SemDeDup): embedding-space near-duplicate removal
scoped by a learned coarse clustering.

The pattern (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means the
corpus embeddings, then look for near-duplicates only WITHIN each cluster —
the clustering turns the O(n²) all-pairs cosine problem into k independent
O((n/k)²) blocks, and at web scale k is sized so blocks stay bounded
(the paper runs k ≈ 0.1% of corpus size). MinHash/SimHash (ext/dedup.py)
catch *lexical* duplicates; this pass catches *semantic* ones — paraphrases,
translations, template re-renders — that share no shingles.

Differences from the paper, chosen for engine determinism:
- duplicate groups are the CONNECTED COMPONENTS of the threshold graph
  (reusing ext/dedup.connected_components), not greedy per-pair pruning —
  the result is independent of pair visit order;
- the kept representative is the LOWEST id in each component (the same
  lowest-id-wins convention as exact_dedup / dedup_clusters), not the
  centroid-distance heuristic — deterministic under re-runs and re-shards.

Scale shape: the corpus is scanned once for clustering (ext/clustering.kmeans
is the measured dim-agnostic build), once (column-pruned to the cluster id)
for the oversized-cluster guard count, once for the within-cluster
self-join, and once for the final decision join. Only verified EDGES (a
sliver of the corpus) feed the component loop, and the edge relation is
checkpointed once so the quadratic self-join never re-executes for the
component rounds or the returned audit trail. The self-join is quadratic within a block
by design — ``max_cluster_size`` makes an under-partitioned call fail
loudly instead of detonating a corpus²-shaped join at 100 TB.

Reference parity: the reference has no embedding operators at all — this
module is part of the SURVEY §2.12 extension tier mandated by the north
star, sized against the public SemDeDup recipe rather than reference code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.clustering import kmeans
from beeper_matric_etl_tool_spark.ext.dedup import connected_components
from beeper_matric_etl_tool_spark.ext.similarity import dot, quantize


def semantic_edges(
    clustered: DataFrame,
    threshold_ppm: int = 950_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster_id",
    max_cluster_size: int = 100_000,
) -> DataFrame:
    """All within-cluster pairs whose quantized cosine reaches the
    threshold: (id_a, id_b, cluster_id, cosine_ppm) with id_a < id_b.

    Scoring is the engine-wide exact convention (ext/similarity.py):
    floor(1e6·dot/(‖a‖·‖b‖)) over floor(x·2¹⁶) quantized vectors —
    bit-identical across engines and partition orders. A zero-norm vector
    scores NULL against everything (try_divide), so it never forms an edge
    and is always kept — degrading, not crashing, on degenerate input.

    The self-join is equi on ``cluster_col`` — quadratic only within a
    block. Callers own sizing k so blocks stay bounded; the guard raises
    on any cluster above ``max_cluster_size`` BEFORE the join executes,
    because an under-clustered corpus would otherwise schedule a
    corpus²-scale shuffle (the exact failure mode SemDeDup's clustering
    exists to prevent).
    """
    oversized = (
        clustered.groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_cluster_size)
        .limit(1)
        .collect()
    )
    if oversized:
        row = oversized[0]
        raise ValueError(
            f"semantic_edges: cluster {row[cluster_col]} holds {row['__n']} vectors "
            f"(max_cluster_size={max_cluster_size}) — the within-cluster self-join "
            f"would be quadratic in that block; raise k (more, smaller clusters) "
            f"or max_cluster_size if the block size is intended"
        )
    q = clustered.select(
        F.col(id_col),
        F.col(cluster_col),
        quantize(F.col(vec_col)).alias("__qv"),
    ).withColumn("__qn2", dot(F.col("__qv"), F.col("__qv")))
    a = q.select(
        F.col(id_col).alias("id_a"),
        F.col(cluster_col),
        F.col("__qv").alias("__qa"),
        F.col("__qn2").alias("__na"),
    )
    b = q.select(
        F.col(id_col).alias("id_b"),
        F.col(cluster_col),
        F.col("__qv").alias("__qb"),
        F.col("__qn2").alias("__nb"),
    )
    return (
        a.join(b, on=cluster_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine_ppm",
            F.floor(
                F.try_divide(
                    F.lit(1_000_000.0) * dot(F.col("__qa"), F.col("__qb")),
                    F.sqrt(F.col("__na")) * F.sqrt(F.col("__nb")),
                )
            ).cast("long"),
        )
        .filter(F.col("cosine_ppm") >= F.lit(int(threshold_ppm)))
        .select("id_a", "id_b", F.col(cluster_col), "cosine_ppm")
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iterations: int = 3,
    threshold_ppm: int = 950_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup over ``df``: returns ``(decisions, edges)``.

    decisions: one row per input row — (id_col, cluster_id, keep boolean,
    component). ``component`` is the duplicate-group label (lowest reachable
    id through the within-cluster threshold graph; equal to the row's own id
    for singletons), ``keep`` is true iff the row IS its component minimum.
    Training-data callers filter ``keep`` and drop the rest; audit callers
    group by ``component`` to inspect what was collapsed.

    edges: the verified duplicate pairs (id_a, id_b, cluster_id,
    cosine_ppm) — the evidence trail for every dropped row.

    Invariants (property-tested in tests/test_semdedup.py and self-checked
    into driver-oracled booleans by plans/catalog_ext.kmeans_invariants):
    every dropped row touches ≥1 edge; no edge joins two kept rows; exactly
    one kept row per component; kept + dropped = |df|.
    """
    assignments, _centroids = kmeans(
        df, k=k, iterations=iterations, vec_col=vec_col, id_col=id_col
    )
    clustered = df.select(id_col, vec_col).join(
        assignments.select(id_col, "cluster_id"), on=id_col
    )
    # checkpoint the edge relation ONCE: it is consumed by the component
    # loop AND returned as the audit trail — without this, every consumer
    # action re-executes the quadratic within-cluster self-join.
    edges = semantic_edges(
        clustered,
        threshold_ppm=threshold_ppm,
        vec_col=vec_col,
        id_col=id_col,
        max_cluster_size=max_cluster_size,
    ).localCheckpoint(eager=False)
    components = connected_components(edges, src_col="id_a", dst_col="id_b")
    decisions = (
        clustered.select(id_col, "cluster_id")
        .join(
            components.select(F.col("node").alias(id_col), "component"),
            on=id_col,
            how="left",
        )
        .select(
            id_col,
            "cluster_id",
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
            (F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col)).alias(
                "keep"
            ),
        )
    )
    return decisions, edges
