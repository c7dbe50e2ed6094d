"""SemDeDup (ext/semdedup.py) — brute-force-verified semantic dedup.

The corpus is the sf0.001 embeddings table plus PLANTED near-duplicates
(tiny positive rescalings of existing vectors → cosine ≈ 1), because the
driver testdata's random vectors hold no natural semantic dupes (max
pairwise cosine ≈ 0.48). The oracle here is NumPy: re-derive the
within-cluster threshold graph and its connected components from the
operator's OWN cluster assignment, then require exact agreement on the
edge set, the component labels, and every keep/drop decision.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.semdedup import semantic_dedup, semantic_edges
from beeper_matric_etl_tool_spark.sources.tables import table

THRESHOLD_PPM = 990_000
QUANT = 65_536.0


def _planted_corpus(spark, sf_dir):
    """embeddings ∪ near-copies of vec_ids 0..9 (ids 10_000+i, vector
    scaled by 1+1e-4 — same direction, cosine ≈ 1) ∪ one zero vector
    (id 20_000) to pin the zero-norm degrade path."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dupes = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            (F.col("vec_id") + F.lit(10_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: (x * F.lit(1.0001)).cast("float")
            ).alias("embedding"),
        )
    )
    dim = len(emb.first()["embedding"])
    zero = spark.createDataFrame(
        [(20_000, [0.0] * dim)], "vec_id long, embedding array<float>"
    )
    return emb.unionByName(dupes).unionByName(zero)


def _numpy_semdedup(rows, threshold_ppm):
    """Reference implementation over [(id, cluster, vector)] rows: quantized
    cosine within cluster, union-find components, lowest-id keep."""
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    clusters = np.array([r[1] for r in rows], dtype=np.int64)
    V = np.floor(np.array([r[2] for r in rows], dtype=np.float64) * QUANT)
    norms = np.sqrt(np.einsum("ij,ij->i", V, V))
    edges = set()
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if clusters[i] != clusters[j]:
                continue
            denom = norms[i] * norms[j]
            if denom == 0:
                continue  # zero-norm scores NULL engine-side → never an edge
            ppm = np.floor(1e6 * (V[i] @ V[j]) / denom)
            if ppm >= threshold_ppm:
                a, b = int(ids[i]), int(ids[j])
                edges.add((min(a, b), max(a, b)))
                union(a, b)
    component = {int(i): find(int(i)) for i in ids}
    keep = {i: (component[i] == i) for i in component}
    return edges, component, keep


@pytest.fixture(scope="module")
def semdedup_run(spark, sf_dir):
    corpus = _planted_corpus(spark, sf_dir)
    decisions, edges = semantic_dedup(
        corpus, k=4, iterations=2, threshold_ppm=THRESHOLD_PPM
    )
    decisions = decisions.cache()
    dec_rows = {r["vec_id"]: r for r in decisions.collect()}
    edge_rows = [(r["id_a"], r["id_b"]) for r in edges.collect()]
    clustered = {
        r["vec_id"]: (r["vec_id"], dec_rows[r["vec_id"]]["cluster_id"], r["embedding"])
        for r in corpus.collect()
    }
    ref_edges, ref_component, ref_keep = _numpy_semdedup(
        list(clustered.values()), THRESHOLD_PPM
    )
    return dec_rows, edge_rows, ref_edges, ref_component, ref_keep


def test_decisions_total(semdedup_run, spark, sf_dir):
    dec_rows, *_ = semdedup_run
    n_input = _planted_corpus(spark, sf_dir).count()
    assert len(dec_rows) == n_input


def test_edges_match_bruteforce(semdedup_run):
    _, edge_rows, ref_edges, _, _ = semdedup_run
    assert set(edge_rows) == ref_edges
    # the planted copies MUST be found (cosine ≈ 1 ≥ threshold), so the
    # test is not vacuous
    assert len(ref_edges) >= 10


def test_components_and_keeps_match_bruteforce(semdedup_run):
    dec_rows, _, _, ref_component, ref_keep = semdedup_run
    for vid, row in dec_rows.items():
        assert row["component"] == ref_component[vid], vid
        assert row["keep"] == ref_keep[vid], vid


def test_invariants(semdedup_run):
    dec_rows, edge_rows, *_ = semdedup_run
    touched = {i for e in edge_rows for i in e}
    keeps_per_component: dict[int, int] = {}
    for vid, row in dec_rows.items():
        if row["keep"]:
            keeps_per_component[row["component"]] = (
                keeps_per_component.get(row["component"], 0) + 1
            )
        else:
            # every dropped row has edge evidence
            assert vid in touched, vid
    # exactly one kept representative per component
    assert set(keeps_per_component.values()) == {1}
    # no edge joins two kept rows
    for a, b in edge_rows:
        assert not (dec_rows[a]["keep"] and dec_rows[b]["keep"]), (a, b)


def test_zero_norm_vector_is_kept(semdedup_run):
    dec_rows, *_ = semdedup_run
    assert dec_rows[20_000]["keep"] is True
    assert dec_rows[20_000]["component"] == 20_000


def test_oversized_cluster_guard(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    one_block = emb.withColumn("cluster_id", F.lit(0))
    with pytest.raises(ValueError, match="max_cluster_size"):
        semantic_edges(one_block, max_cluster_size=10)


def test_evaluate_recall_hand_computed(spark):
    """Recall@k audit: per-query intersection over the exact set, exact
    integers; a query the approx side missed entirely shows n_hit=0
    instead of vanishing."""
    from beeper_matric_etl_tool_spark.ext.similarity import evaluate_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (3, 30)],
        "query_id long, vec_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99), (2, 20), (2, 21)],
        "query_id long, vec_id long",
    )
    rows = {r["query_id"]: r for r in evaluate_recall(approx, exact).collect()}
    assert (rows[1]["n_exact"], rows[1]["n_hit"], rows[1]["recall_ppm"]) == (3, 2, 666_666)
    assert (rows[2]["n_exact"], rows[2]["n_hit"], rows[2]["recall_ppm"]) == (2, 2, 1_000_000)
    assert (rows[3]["n_exact"], rows[3]["n_hit"], rows[3]["recall_ppm"]) == (1, 0, 0)


def test_evaluate_recall_composes_with_knn(spark, sf_dir):
    """The advertised composition: IVF multiprobe results audited
    against brute-force cosine ground truth — recall@5 is high at probe
    count = cluster count (probing everything ≡ exact), and the audit is
    result-sized (one row per probe query)."""
    from beeper_matric_etl_tool_spark.ext.similarity import (
        cosine_topk,
        evaluate_recall,
    )
    from beeper_matric_etl_tool_spark.sources.tables import table
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probes = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk(probes, emb, k=5).select(
        "query_id", F.col("neighbor_id").alias("vec_id")
    )
    audit = evaluate_recall(exact, exact)  # self vs self = recall 1.0
    rows = audit.collect()
    assert len(rows) == 3
    assert all(r["recall_ppm"] == 1_000_000 for r in rows)


def test_evaluate_recall_dedups_duplicate_result_rows(spark):
    """A multiprobe index returning the same id from two probes must not
    inflate the audit: duplicate (query, id) rows dedupe on both sides."""
    from beeper_matric_etl_tool_spark.ext.similarity import evaluate_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11)], "query_id long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 10)], "query_id long, vec_id long"
    )
    r = evaluate_recall(approx, exact).first()
    assert (r["n_exact"], r["n_hit"], r["recall_ppm"]) == (2, 1, 500_000)
