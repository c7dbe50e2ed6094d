"""Distributed k-means over embedding columns — the offline half of IVF
similarity search (SURVEY §2.12 scale path).

`knn_search` (ivf strategy) prunes probes to a coarse partition; this module *builds* that
partition assignment when none exists. Lloyd's algorithm as pure DataFrame
ops per iteration:

  assign:   mapInPandas over the corpus with the RESIDENT centroid matrix
            (k×dim, driver-collected — it is k rows by construction): one
            vectorized ‖c−q‖² argmin per Arrow batch, vector passed
            through. No shuffle, no per-pair array materialization.
  update:   posexplode → groupBy(cluster, position) → per-dimension mean
            (one shuffle of partial sums, map-side combined), re-assembled.

The loop is driver-side but each iteration is a full cluster-parallel job —
the pattern Spark MLlib itself uses. Iterations are bounded and
deterministic: init picks the first k vectors by id, ties in argmin break
toward the lower cluster id (numpy argmin keeps the first minimum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.similarity import dot


def _sq_dist(a, b):
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return dot(diff, diff)


def assign_clusters(df: DataFrame, centroids: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", keep_vec: bool = False) -> DataFrame:
    """(id, cluster_id[, vec]) — nearest centroid per row via one vectorized
    distance matrix per Arrow batch against the resident k×dim centroid
    matrix. Shuffle-free: the corpus partitioning passes straight through,
    and with ``keep_vec`` the vector rides along so the Lloyd update step
    needs no re-join. Ties break toward the lower cluster id (np.argmin
    keeps the first minimum; centroid rows are ordered by cluster_id).

    The output schema is DERIVED from the input: the id column keeps its
    own type (any integral or string id works — it passes through the
    Arrow batch untouched) and ``keep_vec`` re-emits the vector column at
    its input type. Unsupported id types raise upfront with a clear
    message instead of corrupting inside the Arrow stage."""
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint", "string"):
        raise ValueError(
            f"assign_clusters: unsupported id column type {id_type!r} for "
            f"{id_col!r} — use an integral or string id (the id passes "
            f"through the Arrow stage and must round-trip exactly)"
        )
    vec_type = df.schema[vec_col].dataType.simpleString()
    if not vec_type.startswith("array<"):
        raise ValueError(
            f"assign_clusters: {vec_col!r} must be an array column, got {vec_type!r}"
        )
    cent_rows = sorted(
        centroids.select("cluster_id", "centroid").collect(), key=lambda r: r.cluster_id
    )
    cids = np.array([r.cluster_id for r in cent_rows], dtype=np.int64)
    C = np.array([r.centroid for r in cent_rows], dtype=np.float64)
    cn2 = np.einsum("ij,ij->i", C, C)

    fields = f"{id_col} {id_type}, cluster_id long" + (
        f", {vec_col} {vec_type}" if keep_vec else ""
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            # argmin ‖v−c‖² = argmin (‖c‖² − 2 v·c) per row — ‖v‖² is constant
            d = cn2[None, :] - 2.0 * (V @ C.T)
            best = cids[np.argmin(d, axis=1)]
            out = {id_col: pdf[id_col], "cluster_id": best}
            if keep_vec:
                out[vec_col] = pdf[vec_col]
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(assign, fields)


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids). Deterministic init: the k lowest-id
    vectors seed the centroids.

    The update step is DIMENSION-AGNOSTIC: ``posexplode`` → one partial-
    combined groupBy on (cluster, position) → sorted re-assembly. No driver
    dim probe, no per-dimension ``F.sum(vec[i])`` expression list — the old
    form built `dim` aggregate expressions and blew up analysis/codegen at
    real embedding widths (768–4096); this one's plan is the same size at
    dim 8 and dim 4096, and the shuffled aggregate is k·dim rows."""
    # the corpus is read 2× per Lloyd iteration (assign + update join);
    # cache it for the duration of the build — at scale this is the same
    # persist MLlib's own KMeans performs on its training RDD
    df = df.select(F.col(id_col), F.col(vec_col)).persist()
    # seed ids must come from a REAL ordering (the vector id), not
    # row_number over a constant — post-limit row order is a plan artifact
    # and a seed permutation would flip distance-tie assignments.
    centroids = (
        df.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col), F.col(vec_col).alias("centroid"))
        .withColumn("cluster_id", F.row_number().over(Window.orderBy(F.col(id_col).asc())) - 1)
        .drop(id_col)
    ).cache()

    for _ in range(iterations):
        # vector rides through the assign stage — no corpus re-join
        assigned = assign_clusters(df, centroids, vec_col, id_col, keep_vec=True)
        exploded = assigned.select(
            "cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        # per (cluster, dimension): sum + member count in ONE aggregate —
        # each member contributes exactly one value per position, so
        # count(val) at any position IS the cluster size
        means = (
            exploded.groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .select(
                "cluster_id", "pos",
                (F.col("__s") / F.col("__n")).cast("float").alias("__m"),
            )
        )
        prev = centroids
        updated = means.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__m"))),
                lambda x: x["__m"],
            ).alias("centroid")
        )
        # a cluster that lost every member this iteration has no mean rows;
        # silently dropping it would return < k centroids and downstream
        # IVF layouts built on "k coarse partitions" would quietly get
        # coarser pruning. Standard Lloyd practice: carry the previous
        # centroid forward (both frames are k-row — the anti-join is free).
        centroids = updated.unionByName(
            prev.join(updated.select("cluster_id"), on="cluster_id", how="left_anti")
        ).cache()
        centroids.count()  # materialize before releasing the parent cache
        prev.unpersist()
    # final re-assignment against the LAST updated centroids — without it
    # the returned assignments answer to the previous iteration's centroids
    # and the Lloyd invariant (every vector in its argmin cluster over the
    # EMITTED centroids) does not hold. This is how Lloyd terminates.
    assignments = assign_clusters(df, centroids, vec_col, id_col)
    # cut the lineage: the final assignment is |corpus| skinny rows, but its
    # lazy plan replays the assign stage for every downstream reference.
    # Materializing here turns consumers' plans into 'scan + join a small
    # cached relation' — and lets the corpus cache go.
    assignments = assignments.localCheckpoint(eager=True)
    df.unpersist()
    return assignments, centroids
