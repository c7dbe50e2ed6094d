"""Phase-level job census of kmeans_invariants' trainers under a plain
driver-like session (local[8], sf0.01): which sub-trainer owns the jobs?

Usage: python tools/kmeans_phase_census.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from beeper_matric_etl_tool_spark.sources.tables import table

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("kmeans-phase-census")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def census(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")
        jobs = tracker.getJobIdsForGroup(name) or []
        tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    tasks += si.numTasks
        print(f"{name:32s} jobs={len(jobs):>4} tasks={tasks:>5} wall={wall:>6.1f}s")
        return out

    from beeper_matric_etl_tool_spark.ext.bpe import train_bpe_merges
    from beeper_matric_etl_tool_spark.ext.classifier import (
        classify,
        evaluate_auc,
        feature_stats,
        quality_features,
        standardize,
        train_logreg,
    )
    from beeper_matric_etl_tool_spark.ext.clustering import kmeans
    from beeper_matric_etl_tool_spark.ext.dedup import connected_components
    from beeper_matric_etl_tool_spark.ext.quantization import (
        encode_pq,
        pq_topk,
        train_pq,
    )
    from beeper_matric_etl_tool_spark.ext.quality import (
        quality_signal_columns,
        quality_verdict_columns,
    )
    from beeper_matric_etl_tool_spark.ext.semdedup import semantic_edges

    emb = table(spark, sf, "embeddings")
    docs = table(spark, sf, "documents")

    assignments = centroids = None

    def run_kmeans():
        nonlocal assignments, centroids
        assignments, centroids = kmeans(emb, k=8, iterations=3)
        return None

    census("kmeans(k=8,it=3)", run_kmeans)
    clustered = emb.join(assignments, on="vec_id")

    edges = census(
        "semantic_edges",
        lambda: semantic_edges(
            clustered.select("vec_id", "embedding", "cluster_id"),
            threshold_ppm=400_000,
        ).localCheckpoint(eager=False),
    )
    census(
        "connected_components",
        lambda: connected_components(edges, src_col="id_a", dst_col="id_b").count(),
    )

    books = census("train_pq(m=8,k=16,it=3)", lambda: train_pq(emb, m=8, k=16, iterations=3))
    enc = census("encode_pq+ckpt", lambda: encode_pq(emb, books).localCheckpoint(eager=True))
    pq_probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    census(
        "pq_topk k=10 (+ckpt)",
        lambda: pq_topk(pq_probes, enc, books, k=10).localCheckpoint(eager=True),
    )
    census(
        "pq_topk refine=50 collect",
        lambda: pq_topk(pq_probes, enc, books, k=10, refine=50, corpus=emb).count(),
    )

    census("train_bpe_merges #1", lambda: train_bpe_merges(docs, n_merges=12, min_pair_count=2))
    census(
        "train_bpe_merges #2 (repart)",
        lambda: train_bpe_merges(docs.repartition(5), n_merges=12, min_pair_count=2),
    )

    sig = quality_signal_columns("text", lang_col="lang")
    feats = quality_features("text", lang_col="lang")
    clf_cols = list(feats)
    labeled = census(
        "labeled features ckpt",
        lambda: docs.select(
            "doc_id",
            *[c.alias(n) for n, c in sig.items()],
            *[c.alias(k) for k, c in feats.items()],
        )
        .select(
            "doc_id",
            *clf_cols,
            quality_verdict_columns()["keep"].cast("int").alias("__y"),
        )
        .localCheckpoint(eager=True),
    )
    clf_stats = census("feature_stats", lambda: feature_stats(labeled, clf_cols))
    z = census(
        "standardize+ckpt", lambda: standardize(labeled, clf_stats).localCheckpoint(eager=True)
    )
    w1 = census("train_logreg #1 (it=12)", lambda: train_logreg(z, clf_cols, "__y", iterations=12, lr=1.0))
    census(
        "train_logreg #2 (repart)",
        lambda: train_logreg(z.repartition(5), clf_cols, "__y", iterations=12, lr=1.0),
    )
    census("classify+agg", lambda: classify(z, w1, clf_cols).count())
    census(
        "evaluate_auc (spread)",
        lambda: evaluate_auc(
            classify(z, w1, clf_cols).select(
                "quality_prob", (F.col("__y") == 1).alias("__lab")
            ),
            "quality_prob",
            "__lab",
            spread=True,
        ).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
