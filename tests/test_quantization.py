"""Product quantization (ext/quantization.py): geometry guards, exact
integer determinism, the ADC≡reconstruction identity, compression
semantics, and a recall floor against the exact brute-force ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.quantization import (
    encode_pq,
    pq_topk,
    reconstruct_pq,
    split_subvectors,
    train_pq,
)
from beeper_matric_etl_tool_spark.ext.similarity import QUANT, dot, quantize
from beeper_matric_etl_tool_spark.sources.tables import table

M, K = 8, 16


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    books = train_pq(emb, m=M, k=K, iterations=3)
    enc = encode_pq(emb, books).localCheckpoint(eager=True)
    return emb, books, enc


def test_codebook_grid_is_full_and_integer(built):
    _, books, _ = built
    rows = books.collect()
    assert {(r["subspace"], r["cluster_id"]) for r in rows} == {
        (j, c) for j in range(M) for c in range(K)
    }
    # frozen centroids are EXACT integers (floor(c * 2^16))
    for r in rows[:20]:
        assert all(float(x).is_integer() for x in r["centroid"])


def test_codes_shape_and_determinism(built):
    emb, books, enc = built
    n = emb.count()
    rows = enc.collect()
    assert len(rows) == n
    assert all(len(r["codes"]) == M for r in rows)
    assert all(0 <= c < K for r in rows for c in r["codes"])
    again = {r["vec_id"]: tuple(r["codes"]) for r in encode_pq(emb, books).collect()}
    assert again == {r["vec_id"]: tuple(r["codes"]) for r in rows}


def test_adc_equals_dot_of_reconstruction(built, spark):
    """The exactness pin: because centroids are frozen integers and the
    query is quantized with the same convention, the ADC gather score is
    EXACTLY dot(quantize(q), reconstruct(codes(x))) — integer arithmetic
    on both paths, no tolerance."""
    emb, books, enc = built
    probes = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    adc = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in pq_topk(probes, enc, books, k=5).collect()
    }
    recon = reconstruct_pq(enc, books)
    qdf = probes.select("query_id", quantize(F.col("embedding")).alias("q"))
    exact = {
        (r["query_id"], r["vec_id"]): r["s"]
        for r in recon.join(F.broadcast(qdf))
        .select("query_id", "vec_id", dot(F.col("q"), F.col("vec")).alias("s"))
        .collect()
    }
    assert adc  # top-5 per probe
    for key, s in adc.items():
        assert s == exact[key], key


def test_compression_ratio(built):
    """The point of PQ: m code integers replace dim floats. With m=8 the
    stored code array is dim/m = 8x fewer values per vector (and each
    value needs only log2(k)=4 bits against the float's 32 — the
    serialized parquet ratio is larger still)."""
    emb, _, enc = built
    dim = len(emb.select("embedding").first()[0])
    assert len(enc.select("codes").first()[0]) == M
    assert dim // M == dim // 8


def test_refine_recall_floor_vs_bruteforce(built):
    """ADC + exact top-`refine` re-rank must recover most of the true
    top-10 BY THE SAME METRIC (exact quantized inner product): recall@10
    >= 0.6 averaged over probes on the test corpus. The re-rank scores
    candidates exactly, so recall measures only whether the ADC
    candidate set contained the true neighbors."""
    from pyspark.sql import Window

    emb, books, enc = built
    probes = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qdf = probes.select("query_id", quantize(F.col("embedding")).alias("q"))
    pairs = F.broadcast(qdf).crossJoin(
        emb.select("vec_id", quantize(F.col("embedding")).alias("v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("vec_id").asc()
    )
    truth: dict[int, set[int]] = {}
    for r in (
        pairs.select("query_id", "vec_id", dot(F.col("q"), F.col("v")).alias("s"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .collect()
    ):
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    refined: dict[int, set[int]] = {}
    for r in pq_topk(probes, enc, books, k=10, refine=50, corpus=emb).collect():
        refined.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(refined[q] & truth[q]) / len(truth[q]) for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_geometry_guards(spark):
    docs = spark.createDataFrame(
        [(1, [0.1] * 10)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="divisible"):
        train_pq(docs, m=3, k=2, iterations=1)
    with pytest.raises(ValueError, match="refine > 0 requires"):
        pq_topk(docs.select(F.col("vec_id").alias("query_id"), "embedding"),
                docs, docs, refine=5)


def test_split_subvectors_concat_identity(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(8)])], "id long, v array<double>"
    )
    got = df.select(
        F.flatten(split_subvectors(F.col("v"), 4, 2)).alias("f")
    ).first()["f"]
    assert got == [float(i) for i in range(8)]


def test_persisted_pq_index_lifecycle(built, spark, tmp_path):
    """build → search matches the in-memory path bit-for-bit; append
    encodes a new batch against the FROZEN codebooks and the appended
    vector becomes findable; the no-refine probe plan reads codes/ and
    codebooks/ only — never the raw-vector table."""
    from beeper_matric_etl_tool_spark.ext.quantization import (
        append_pq_index,
        build_pq_index,
        search_pq,
    )

    emb, books, enc = built
    path = str(tmp_path / "pqidx")
    build_pq_index(emb, path, m=M, k=K, iterations=3)

    probes = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    persisted = search_pq(spark, path, probes, k=5)
    # probe plan never scans the raw corpus: the only parquet locations
    # in the executed plan live under the index path
    plan = persisted._jdf.queryExecution().executedPlan().toString()
    assert "codes:array" in plan  # the codes scan
    assert "embedding:array<float>" not in plan  # no raw-vector scan
    got = sorted(tuple(r) for r in persisted.collect())
    # training is deterministic, so the persisted books == in-memory
    # books and the search results agree exactly
    direct = sorted(
        tuple(r)
        for r in __import__(
            "beeper_matric_etl_tool_spark.ext.quantization",
            fromlist=["pq_topk"],
        ).pq_topk(probes, enc, books, k=5).collect()
    )
    assert got == direct

    # append a synthetic vector identical to vec 0's embedding shifted
    # far away; it must be encoded with the frozen books and show up
    first = emb.orderBy("vec_id").first()
    new_vec = [float(x) for x in first["embedding"]]
    new = spark.createDataFrame(
        [(999_999, new_vec)], "vec_id long, embedding array<float>"
    )
    append_pq_index(new, path)
    again = search_pq(spark, path, probes, k=5)
    ids = {r["vec_id"] for r in again.collect()}
    # the clone of probe-0's vector has the probe's own codes -> maximal
    # ADC score for that probe -> it enters the top-5
    assert 999_999 in ids


def test_ivf_pq_index_prunes_and_degenerates_to_flat(built, spark, tmp_path):
    """IVF-PQ: at nprobe = ivf_k every cluster is probed, so results
    equal the flat ADC scan exactly; at nprobe=1 each query scores only
    its nearest cluster's codes (candidate volume shrinks to ~1/ivf_k),
    and the refine leg still recovers exact-metric neighbors from the
    probed subset."""
    from beeper_matric_etl_tool_spark.ext.quantization import (
        build_ivf_pq_index,
        pq_topk,
        search_ivf_pq,
    )

    emb, books, enc = built
    path = str(tmp_path / "ivfpq")
    IVF_K = 4
    build_ivf_pq_index(emb, path, ivf_k=IVF_K, m=M, k=K, iterations=3)

    probes = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # full-probe == flat scan (training is deterministic, same books)
    full = sorted(
        tuple(r) for r in search_ivf_pq(spark, path, probes, k=5, nprobe=IVF_K).collect()
    )
    flat = sorted(tuple(r) for r in pq_topk(probes, enc, books, k=5).collect())
    assert full == flat

    # nprobe=1: a strict subset of clusters is scored; results are the
    # flat ranking RESTRICTED to the probed clusters — so every returned
    # neighbor also appears in the flat top-k of its probed subset, and
    # determinism holds across reruns
    one = search_ivf_pq(spark, path, probes, k=5, nprobe=1).collect()
    assert {r["query_id"] for r in one} == {r[0] for r in full}
    again = search_ivf_pq(spark, path, probes, k=5, nprobe=1).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, again))

    # refine: exact re-rank within probed candidates, scores are exact
    # quantized dots (match the corpus-side recomputation)
    from beeper_matric_etl_tool_spark.ext.similarity import dot, quantize

    ref = search_ivf_pq(
        spark, path, probes, k=3, nprobe=2, refine=20, corpus=emb
    ).collect()
    qv = {
        r["query_id"]: r["q"]
        for r in probes.select(
            "query_id", quantize(F.col("embedding")).alias("q")
        ).collect()
    }
    cv = {
        r["vec_id"]: r["v"]
        for r in emb.select("vec_id", quantize(F.col("embedding")).alias("v")).collect()
    }
    for r in ref:
        expect = sum(a * b for a, b in zip(qv[r["query_id"]], cv[r["vec_id"]]))
        assert r["score"] == expect


def test_empty_probe_frame_returns_typed_empty_result(built, spark):
    emb, books, enc = built
    none = emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(none, enc, books, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "vec_id", "score", "rank",
    ]


def test_refine_with_distinct_corpus_vec_col(built):
    from beeper_matric_etl_tool_spark.ext.quantization import pq_topk as _pq

    emb, books, enc = built
    renamed = emb.withColumnRenamed("embedding", "vec")
    probes = emb.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(
        tuple(r)
        for r in _pq(probes, enc, books, k=3, refine=10, corpus=emb).collect()
    )
    b = sorted(
        tuple(r)
        for r in _pq(
            probes, enc, books, k=3, refine=10, corpus=renamed, corpus_vec="vec"
        ).collect()
    )
    assert a == b


def test_train_pq_bit_stable_across_partitionings(spark):
    """The integer-sum Lloyd update makes TRAINING itself
    order-independent: the same corpus under 1, 3, and 7 input
    partitions trains byte-identical codebooks (previously only
    encode/score downstream of a frozen codebook carried that
    guarantee)."""
    import numpy as _np

    from beeper_matric_etl_tool_spark.ext.quantization import train_pq

    rng = [
        (i, [float(((i * 37 + j * 11) % 29) - 14) / 7.0 for j in range(8)])
        for i in range(60)
    ]
    base = spark.createDataFrame(rng, "vec_id long, embedding array<double>")

    def books(parts):
        got = (
            train_pq(base.repartition(parts), m=2, k=4, iterations=3)
            .collect()
        )
        return sorted(
            (r["subspace"], r["cluster_id"], tuple(r["centroid"])) for r in got
        )

    b1, b3, b7 = books(1), books(3), books(7)
    assert b1 == b3 == b7
    # still the frozen-integer grid
    for _, _, cent in b1:
        assert all(c == _np.floor(c) for c in cent)


def test_pq_flat_scan_enforces_its_own_probe_ceiling(spark):
    """The flat ADC scan's enforced limit matches its memory model:
    max_probes (default MAX_FLAT_PROBES << MAX_PROBES) bounds the
    n_probes × batch_rows cross, and a caller-supplied bound above
    MAX_PROBES is rejected outright."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from beeper_matric_etl_tool_spark.ext.quantization import (
        MAX_FLAT_PROBES,
        encode_pq,
        pq_topk,
        train_pq,
    )
    from beeper_matric_etl_tool_spark.ext.similarity import MAX_PROBES

    assert MAX_FLAT_PROBES < MAX_PROBES
    emb = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    books = train_pq(emb, m=2, k=4, iterations=1)
    enc = encode_pq(emb, books)
    probes = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with _pytest.raises(ValueError, match="max_probes=3"):
        pq_topk(probes, enc, books, k=2, max_probes=3)
    with _pytest.raises(ValueError, match="MAX_PROBES"):
        pq_topk(probes, enc, books, k=2, max_probes=MAX_PROBES + 1)
    # within the ceiling: results flow, probe-chunked scorer included
    assert pq_topk(probes.limit(3), enc, books, k=2, max_probes=8).count() == 6


def test_pq_flat_scan_probe_chunking_exact_across_chunks(spark):
    """More probes than PQ_PROBE_CHUNK: the chunked scorer must emit the
    same exact ADC identity per row as the single-chunk path — every
    (query, vec) score equals dot(quantize(q), reconstruct(codes))."""
    from pyspark.sql import functions as F

    from beeper_matric_etl_tool_spark.ext.quantization import (
        PQ_PROBE_CHUNK,
        encode_pq,
        pq_topk,
        reconstruct_pq,
        train_pq,
    )
    from beeper_matric_etl_tool_spark.ext.similarity import dot, quantize

    n_probes = PQ_PROBE_CHUNK + 7
    emb = spark.createDataFrame(
        [
            (i, [float(((i * 13 + j * 5) % 23) - 11) / 4.0 for j in range(4)])
            for i in range(max(40, n_probes))
        ],
        "vec_id long, embedding array<double>",
    )
    books = train_pq(emb, m=2, k=8, iterations=2)
    enc = encode_pq(emb, books)
    probes = emb.limit(n_probes).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = pq_topk(probes, enc, books, k=3, max_probes=n_probes + 1)
    assert top.select("query_id").distinct().count() == n_probes
    chk = (
        top.join(reconstruct_pq(enc, books), on="vec_id")
        .join(
            probes.select(
                "query_id", quantize(F.col("embedding")).alias("__q")
            ),
            on="query_id",
        )
        .filter(F.col("score") != dot(F.col("__q"), F.col("vec")))
    )
    assert chk.count() == 0
