"""Similarity search over embedding columns (SURVEY §2.12).

Two search strategies:

- **Brute force** (`cosine_topk`): broadcast the (small) query set against
  the corpus, window top-k per query. Exact; cost O(|queries|·|corpus|·dim).
  The baseline and the oracle-checkable path.
- **IVF-style partition pruning** (`cosine_topk` with ``partition_col``):
  restrict each probe to its coarse partition (a `label` column or a
  k-means assignment). Cost drops by the partition fan-out; the partition
  key also becomes the parquet partition column at scale, so a probe reads
  ~1/k of the data — classic IVF with nprobe=1.

Determinism contract — **quantized-integer scoring**: embeddings are
quantized component-wise to floor(x·2¹⁶) before any arithmetic. Integer
dot products are order-independent and every partial sum here stays below
2⁵³ (dim 64, |x| < 1 ⇒ dot < 1e11), so the SAME exact integers come out of
numpy's BLAS matmul, DuckDB's fold, and Spark's codegen — bit-identical
regardless of summation order or SIMD. Float dot products cannot make that
promise (pairwise vs sequential summation differs in the last ulp, which
flips a floor() at unpredictable scale factors). The ~2⁻¹⁶ relative
quantization error is orders below any meaningful cosine difference.

The pairwise dot has two implementations, both producing the SAME exact
integers over quantized vectors:

- ``dot`` — JVM ``zip_with/aggregate`` fold: zero serialization, stays in
  the join stage. MEASURED faster at this shape (dim 64, ~16k pairs at
  sf0.1: ~0.4 s vs ~1.0 s) — Arrow transfer of both arrays per pair
  dominates small-dim workloads.
- ``dot_rows`` — Arrow-batched ``pandas_udf`` rowwise NumPy product: pays
  per-pair array serialization once but vectorizes the arithmetic; the
  right choice once dim × pairs is large (≥ ~256-dim embeddings or ≥ 1e6
  candidate pairs), where interpreted per-element eval loses to BLAS.

``cosine_topk(use_arrow=...)`` selects; default JVM per the measurement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: component quantization factor — floor(x * QUANT) per component
QUANT_BITS = 16
QUANT = float(1 << QUANT_BITS)


def quantize(col: Column) -> Column:
    """array<float> → array<double> holding EXACT integer values
    floor(x·2¹⁶) — double because DuckDB's list arithmetic and Arrow agree
    on it, and every value/partial sum stays < 2⁵³ (exact)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * F.lit(QUANT)))


_DOT_ROWS_UDF = None


def dot_rows(a: Column, b: Column) -> Column:
    """Rowwise dot product of two quantized array columns — Arrow-batched
    pandas_udf, one einsum per batch. Inputs are integer-valued doubles, so
    the result is exact (no summation-order sensitivity). UDF construction
    is lazy: decorating at import time would demand a live SparkSession."""
    global _DOT_ROWS_UDF
    if _DOT_ROWS_UDF is None:

        @F.pandas_udf("double")
        def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
            A = np.vstack(x.to_numpy())
            B = np.vstack(y.to_numpy())
            return pd.Series(np.einsum("ij,ij->i", A, B))

        _DOT_ROWS_UDF = _udf
    return _DOT_ROWS_UDF(a, b)


# JVM-side float fold — kept for callers without cross-engine contracts
# (k-means distances) where staying inside codegen beats Arrow transfer.
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
    # try_divide: a zero-norm side degrades to NULL (DuckDB's divide-by-zero
    # semantics) instead of raising under ANSI mode
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    partition_col: str | None = None,
    use_arrow: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors per query row (self-matches excluded).

    ``queries`` is broadcast (it is the small side by construction); the scan
    over ``corpus`` is a single pass. With ``partition_col`` set, candidate
    pairs are additionally required to share that column — the IVF pruning.

    Scoring: cosine_ppm = floor(1e6·dotq/(‖q‖·‖c‖)) over QUANTIZED vectors
    (see module docstring); each side's squared norm is computed once, not
    per pair. ``use_arrow`` flips the pairwise stage to the NumPy
    pandas_udf — same exact integers, faster only at large dim × pairs.
    """
    pair_dot = dot_rows if use_arrow else dot
    part_q = [F.col(partition_col).alias("__part")] if partition_col else []
    q = queries.select(
        F.col(query_id).alias("query_id"), quantize(F.col(query_vec)).alias("__qv"), *part_q
    ).withColumn("__qn2", pair_dot(F.col("__qv"), F.col("__qv")))
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), quantize(F.col(corpus_vec)).alias("__cv"), *part_q
    ).withColumn("__cn2", pair_dot(F.col("__cv"), F.col("__cv")))
    if partition_col is not None:
        pairs = F.broadcast(q).join(c, on="__part").drop("__part")
    else:
        pairs = F.broadcast(q).crossJoin(c)
    # 1e6·dot exceeds 2^53, but both engines round the SAME mathematically
    # exact integer product to double (1e6 and dot are each exact), so the
    # floor is still engine-independent. try_divide: a zero-norm vector
    # degrades the pair to NULL (DuckDB divide-by-zero semantics) instead
    # of raising under ANSI mode.
    scored = pairs.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine_ppm",
        F.floor(
            F.try_divide(
                F.lit(1_000_000.0) * pair_dot(F.col("__qv"), F.col("__cv")),
                F.sqrt(F.col("__qn2")) * F.sqrt(F.col("__cn2")),
            )
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


#: hard cap on the driver-resident probe set of `scored_pairs_matmul`.
#: 64k probes × dim 4096 × 8 B ≈ 2 GiB — already generous; anything larger
#: is a mis-call (the probe contract is "small"), not a bigger machine.
MAX_PROBES = 65_536


def scored_pairs_matmul(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    partition_col: str | None = None,
    emit_partition: bool = False,
    max_probes: int = MAX_PROBES,
) -> DataFrame:
    """All (query, corpus) cosine scores via ONE BLAS matmul per Arrow batch.

    The probe set is materialized driver-side (it is small by the ANN probe
    contract — the same move Spark ML's ``approxNearestNeighbors`` makes)
    and closed over by a ``mapInPandas`` that scans the corpus once: each
    Arrow batch quantizes to a float64 matrix C and computes C·Qᵀ in one
    vectorized call. Compare the pair-join shape (`dot`/`dot_rows`): that
    materializes BOTH arrays per pair — |Q|·|C|·dim values shuffled or
    Arrow-shipped — where this ships each corpus vector exactly once and
    never builds pair arrays at all. At real embedding dims (768–4096) the
    pair join is quadratic in traffic; this stays linear in the corpus.

    Determinism: quantized components are exact integers in float64; the
    matmul's per-element products are exact; the sums stay < 2⁵³; the final
    1e6·dot/(‖q‖·‖c‖) uses the same correctly-rounded IEEE double ops in
    numpy, the JVM and DuckDB — bit-identical floors (module docstring).

    Output: (query_id long, neighbor_id long, cosine_ppm long[, __matched
    boolean when ``partition_col``][, __cpart long when ``emit_partition``])
    — self-pairs excluded, partitioning of the corpus preserved (no shuffle
    in this stage).
    """
    if emit_partition and partition_col is None:
        raise ValueError("emit_partition requires partition_col")
    part = [partition_col] if partition_col else []
    out_fields = (
        "query_id long, neighbor_id long, cosine_ppm long"
        + (", __matched boolean" if partition_col else "")
        + (", __cpart long" if emit_partition else "")
    )
    # bounded collect: take() fetches at most max_probes+1 rows, so an
    # oversized probe set raises BEFORE the driver materializes it — a
    # caller passing the corpus as probes must fail loudly, not OOM.
    probe_rows = queries.select(id_col, vec_col, *part).take(max_probes + 1)
    if len(probe_rows) > max_probes:
        raise ValueError(
            f"scored_pairs_matmul: probe set exceeds max_probes={max_probes} "
            f"— the probe side must be small (it becomes a driver-resident "
            f"matrix); swap the sides or use the pairwise path"
        )
    if not probe_rows:
        # empty probe set → empty relation with the contracted schema (the
        # lazy pairwise path degrades the same way)
        return queries.sparkSession.createDataFrame([], out_fields)
    qids = np.array([r[id_col] for r in probe_rows], dtype=np.int64)
    Q = np.floor(np.array([r[vec_col] for r in probe_rows], dtype=np.float64) * QUANT)
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    qparts = np.array([r[partition_col] for r in probe_rows]) if partition_col else None

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.floor(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64) * QUANT)
            cn = np.sqrt(np.einsum("ij,ij->i", C, C))
            # exact integer dots; 1e6·dot then the IEEE divide+floor —
            # the same double rounding every engine performs. A zero-norm
            # quantized vector makes the pair 0/0 = NaN; the lazy pairwise
            # path and the SQL oracle both cast that to NULL, so this path
            # must too — floor(NaN).astype(int64) would emit garbage.
            with np.errstate(invalid="ignore", divide="ignore"):
                raw = np.floor((1e6 * (C @ Q.T)) / np.outer(cn, qn))
            nids = pdf[id_col].to_numpy(dtype=np.int64)
            n, m = raw.shape
            flat = raw.ravel()
            finite = np.isfinite(flat)
            ppm = pd.array(
                np.where(finite, flat, 0).astype(np.int64), dtype="Int64"
            )
            ppm[~finite] = pd.NA
            cols = {
                "query_id": np.tile(qids, n),
                "neighbor_id": np.repeat(nids, m),
                "cosine_ppm": ppm,
            }
            if partition_col is not None:
                cparts = pdf[partition_col].to_numpy()
                cols["__matched"] = np.repeat(cparts, m) == np.tile(qparts, n)
                if emit_partition:
                    cols["__cpart"] = np.repeat(cparts.astype(np.int64), m)
            out = pd.DataFrame(cols)
            yield out[out["query_id"] != out["neighbor_id"]]

    return corpus.select(id_col, vec_col, *part).mapInPandas(score, out_fields)


def lsh_planes(n_planes: int, dim: int = 64, seed: int = 1234) -> tuple[tuple[int, ...], ...]:
    """``n_planes`` frozen Rademacher (±1) hyperplanes for
    ``dim``-component vectors, derived from a seeded RandomState. The
    planes are configuration (like a tokenizer's vocab): the seed is part
    of the banding config and must match on every engine that buckets the
    same corpus — `_lsh_oracle` embeds the same literals in SQL. ±1
    entries keep every projection an exact integer over quantized vectors,
    so the sign can never flip between engines.

    SIZING RULE (the part that keeps the bucket join linear at scale):
    a random non-similar pair collides in one band with probability
    2^-bits_per_band, so expected noise candidates are
    ``n_bands · 2^-bits · n(n-1)/2`` — QUADRATIC in corpus size for any
    fixed width. Size ``bits_per_band ≈ log2(n_docs)`` (+ a few bits of
    margin) so the noise floor stays O(n · n_bands) and candidate volume
    tracks the corpus's TRUE near-duplicate structure instead; recall at
    cosine θ is 1 − (1 − (1 − θ/π)^bits)^bands, so high-similarity pairs
    survive widening while noise dies exponentially. The MinHash text
    path gets this for free by hashing band slices to 64-bit keys
    (`lsh_candidate_pairs`); sign-LSH pays per plane, so the width is an
    explicit knob. See `tools/scale_probe.py` for the measured curves."""
    return tuple(
        tuple(int(x) for x in row)
        for row in np.random.RandomState(seed).choice((-1, 1), size=(n_planes, dim))
    )


#: the oracle-tier default banding (16 planes / 4-bit bands over dim 64) —
#: defined THROUGH lsh_planes so the constant and the sizing-rule path can
#: never diverge (the DuckDB oracle embeds these literals)
LSH_PLANES: tuple[tuple[int, ...], ...] = lsh_planes(16)


def scaled_planes_for(
    n_docs: int,
    n_bands: int = 4,
    margin_bits: int = 4,
    dim: int = 64,
    seed: int = 1234,
) -> tuple[tuple[int, ...], ...]:
    """The lsh_planes SIZING RULE as code, so production callers apply it
    instead of re-deriving it: bits_per_band = ⌈log₂(n_docs)⌉ +
    ``margin_bits``, planes = n_bands · bits_per_band. Keeps the random-
    collision floor (n_bands · 2^-bits · C(n,2)) at O(n · n_bands) —
    the linear regime the scale probe measures (9.4×/21.4× candidates at
    10×/20× corpus growth vs 100×/400× for any fixed width). Count (or
    estimate) the corpus once per index build; the returned planes feed
    :func:`hyperplane_bands` with the same ``n_bands``."""
    import math

    bits = max(1, math.ceil(math.log2(max(n_docs, 2)))) + margin_bits
    return lsh_planes(n_bands * bits, dim=dim, seed=seed)


def hyperplane_bands(
    vec_col: Column,
    planes: tuple[tuple[int, ...], ...] = LSH_PLANES,
    n_bands: int = 4,
) -> Column:
    """Banded sign-random-projection signature: bit_j = [v·plane_j ≥ 0]
    over the QUANTIZED vector (exact integer dots — engine-identical
    signs), packed into ``n_bands`` equal bands. Returns an array of
    structs (band_id, band_sig) ready to explode into LSH bucket keys:
    two vectors are candidates iff they share any band's packed bits —
    the same banding amplification the MinHash text path uses, tuned here
    for cosine similarity (collision prob per bit = 1 − θ/π).

    The default 16-plane/4-band config is the ORACLE-TIER width: 4-bit
    band keys keep the funnel's output non-trivial on tiny test corpora
    so the SQL twin can hash-check the machinery end-to-end. At corpus
    scale 4-bit keys mean 16 buckets per band — a quadratic pair
    generator, not an index. Production widths come from the sizing rule
    on `lsh_planes` (bits_per_band ≈ log2(n_docs)); the scale probe
    measures both regimes."""
    if len(planes) % n_bands != 0:
        raise ValueError(
            f"hyperplane_bands: n_bands={n_bands} must divide len(planes)="
            f"{len(planes)} — a floored band width would silently exclude "
            f"the trailing planes from every band (same guard as the "
            f"MinHash/SimHash banding)"
        )
    qv = quantize(vec_col)
    bits_per_band = len(planes) // n_bands
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    qv,
                    F.array(*[F.lit(float(c)) for c in plane]),
                    lambda x, p: x * p,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0
        ).cast("long")
        for plane in planes
    ]
    bands = []
    for b in range(n_bands):
        sig = F.lit(0).cast("long")
        for k in range(bits_per_band):
            sig = sig + bits[b * bits_per_band + k] * F.lit(1 << k)
        bands.append(F.struct(F.lit(b).alias("band_id"), sig.alias("band_sig")))
    return F.array(*bands)


def quantized_norms(
    corpus: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, __v quantized vector, __n2 exact squared norm) — the prepared
    side every cosine verify joins against. Built once per corpus and
    shared across candidate legs (the `embedding_near_dup` catalog entry
    reuses one for both its funnels)."""
    return corpus.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("__v")
    ).withColumn("__n2", dot(F.col("__v"), F.col("__v")))


def verify_cosine_pairs(
    cand: DataFrame, n: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """(id_a, id_b) candidates → exact quantized-cosine scored pairs with
    cosine ≥ ``threshold``; ``n`` is a :func:`quantized_norms` frame.
    Output (id_a, id_b, cosine_ppm) with cosine_ppm = floor(1e6·dot/norms)
    — the association the DuckDB oracle mirrors. try_divide: a zero-norm
    vector degrades its pairs to NULL (dropped by the threshold) instead
    of raising under ANSI mode. Linear in |candidates|: two hash joins
    against the norms side, no pair arrays materialized beyond the
    candidate set itself."""
    scored = (
        cand.join(
            n.select(
                F.col("vec_id").alias("id_a"),
                F.col("__v").alias("__va"), F.col("__n2").alias("__na2"),
            ),
            on="id_a",
        )
        .join(
            n.select(
                F.col("vec_id").alias("id_b"),
                F.col("__v").alias("__vb"), F.col("__n2").alias("__nb2"),
            ),
            on="id_b",
        )
        .withColumn("__dot", dot(F.col("__va"), F.col("__vb")))
        .withColumn("__norms", F.sqrt(F.col("__na2")) * F.sqrt(F.col("__nb2")))
    )
    return (
        scored.filter(F.try_divide(F.col("__dot"), F.col("__norms")) >= threshold)
        .select(
            "id_a", "id_b",
            F.floor(F.try_divide(F.lit(1_000_000.0) * F.col("__dot"), F.col("__norms")))
            .cast("long")
            .alias("cosine_ppm"),
        )
    )


def banded_candidate_pairs(
    corpus: DataFrame,
    planes: tuple[tuple[int, ...], ...],
    n_bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 sign-LSH band under the
    given plane set — the candidate stage of the embedding near-dup
    funnel, shared by :func:`near_dup_embeddings`, the oracle-tier
    catalog entry and the scale probe so all three measure the SAME
    plan. The only shuffle is on the (band_id, band_sig) key."""
    sigs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(hyperplane_bands(F.col(vec_col), planes=planes, n_bands=n_bands)).alias(
            "__band"
        ),
    ).select("vec_id", "__band.band_id", "__band.band_sig")
    return (
        sigs.alias("a")
        .join(sigs.alias("b"), on=["band_id", "band_sig"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )


def corpus_sized_planes(
    corpus: DataFrame,
    n_bands: int = 4,
    margin_bits: int = 4,
    vec_col: str = "embedding",
    n_docs: int | None = None,
    dim: int | None = None,
    seed: int = 1234,
) -> tuple[tuple[tuple[int, ...], ...], int, int]:
    """The production banding config FOR a corpus: measure (n_docs, dim)
    in one tiny aggregate job (or accept caller-supplied estimates — at
    100 TB the catalog already knows both) and apply the
    :func:`scaled_planes_for` sizing rule. Returns (planes, n_docs, dim)
    so callers can assert/log the chosen width. bits_per_band =
    ⌈log₂ n_docs⌉ + margin_bits — the measured-linear regime
    (`tools/scale_probe.py` growth curves in BASELINE.md)."""
    if n_docs is None or dim is None:
        row = corpus.agg(
            F.count(F.lit(1)).alias("n"),
            F.first(F.size(F.col(vec_col))).alias("d"),
        ).first()
        n_docs = int(row["n"]) if n_docs is None else n_docs
        if dim is None:
            dim = int(row["d"]) if row["d"] is not None else 0
    if dim <= 0:
        raise ValueError(
            "corpus_sized_planes: could not determine embedding dim (empty "
            "corpus or null vectors) — pass dim= explicitly"
        )
    planes = scaled_planes_for(
        n_docs, n_bands=n_bands, margin_bits=margin_bits, dim=dim, seed=seed
    )
    return planes, n_docs, dim


def near_dup_embeddings(
    corpus: DataFrame,
    n_bands: int = 4,
    margin_bits: int = 4,
    threshold: float = 0.85,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_docs: int | None = None,
    dim: int | None = None,
    seed: int = 1234,
    planes: tuple[tuple[int, ...], ...] | None = None,
    verify: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over a corpus — the
    PRODUCTION entry point, with the LSH band width sized to the corpus
    BY DEFAULT. Returns (id_a, id_b, cosine_ppm) with cosine ≥
    ``threshold`` (verified exactly on the quantized vectors), or the raw
    candidate pairs when ``verify=False`` (the scale probe's timing leg).

    Why this exists: the band width is the knob that decides whether the
    candidate join is linear or quadratic in corpus size. A fixed width
    has a random-collision floor of n_bands · 2^-bits · C(n,2) — the
    scale probe measures 100×/400× candidate growth at 10×/20× corpus
    growth for the 4-bit toy width vs 9.4×/21.4× for log-sized bands.
    This entry counts the corpus once (one aggregate job; pass
    ``n_docs``/``dim`` estimates to skip it — any catalog knows both)
    and applies the :func:`scaled_planes_for` rule, so a naive caller
    gets the measured-linear regime. The fixed-width
    :data:`LSH_PLANES` config remains ONLY the oracle-tier testing
    width (tiny corpora need coarse buckets for non-trivial funnels —
    `plans/catalog_ext.py:embedding_near_dup`); reaching it now requires
    explicitly passing ``planes=``.

    Recall contract: collision prob per bit for a pair at angle θ is
    1 − θ/π, so per-band collision decays with width — sized bands trade
    recall at MODERATE similarity for the linear candidate volume, while
    near-identical pairs (the actual duplicates; cosine → 1, per-bit
    prob → 1) survive any width. Hence the default ``threshold=0.85``:
    the verify tier of this entry targets duplicates, not moderate-
    similarity search (use `cosine_topk`/`knn_suite` for that).

    100 TB shape: one banding pass over the corpus (n_bands rows per
    vector), one equi-join shuffle on the band key, then the linear
    verify join — never corpus²."""
    if planes is None:
        planes, n_docs, dim = corpus_sized_planes(
            corpus,
            n_bands=n_bands,
            margin_bits=margin_bits,
            vec_col=vec_col,
            n_docs=n_docs,
            dim=dim,
            seed=seed,
        )
    cand = banded_candidate_pairs(
        corpus, planes, n_bands=n_bands, vec_col=vec_col, id_col=id_col
    )
    if not verify:
        return cand
    n = quantized_norms(corpus, vec_col=vec_col, id_col=id_col)
    return verify_cosine_pairs(cand, n, threshold=threshold)


def label_centroid_sums(
    corpus: DataFrame,
    partition_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-partition centroid as EXACT integers: (Σ quantized components,
    member count) per label — the rational sums/cnt is the mean, but kept
    unreduced so downstream distance comparisons stay integer-exact (see
    `multiprobe_labels`). Dim-agnostic: posexplode → groupBy(label, pos) →
    re-assemble, never one expression per dimension. One shuffle of
    |corpus|·dim skinny rows, the scale-safe shape for dim 768+."""
    exploded = corpus.select(
        F.col(partition_col).alias("label"),
        F.posexplode(quantize(F.col(vec_col))).alias("pos", "comp"),
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        F.sum(F.col("comp").cast("long")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    return per_dim.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda e: e["s"]
        ).alias("sums"),
        F.max("c").alias("cnt"),
    )


def multiprobe_labels(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The ``nprobe`` nearest label-centroids per probe → (query_id, label)
    candidate-partition pairs. Ranking is ENGINE-IDENTICAL, not merely
    close: every input is an exact integer in double (quantized component
    qᵢ, centroid sum sᵢ, count), and d² = Σ(qᵢ − sᵢ/cnt)² is computed as
    the same sequence of correctly-rounded IEEE ops in every engine — one
    divide per component, one subtract, one multiply, then a LEFT FOLD in
    array-position order (Spark ``F.aggregate``; the oracle mirrors it
    with DuckDB ``list_reduce``). Identical doubles in, identical doubles
    out — the comparison can't flip between engines. Ties break label
    ascending. Centroid set is one row per coarse partition, so the
    probe×centroid product broadcasts."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("__qv")
    )
    pairs = q.crossJoin(F.broadcast(centroids))
    # one divide per component (the docstring contract): the means array is
    # materialized first, then squared-diffs — Catalyst does not CSE inside
    # higher-order-function lambdas, so inlining s/cnt into the square would
    # execute every divide twice. Identical doubles either way (same
    # operands, correctly-rounded ops), so the DuckDB oracle needs no change.
    means = F.transform(
        F.col("sums"), lambda s: s.cast("double") / F.col("cnt").cast("double")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("__qv"), means, lambda qc, m: (qc - m) * (qc - m)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select("query_id", "label", d2.alias("__d2"))
    w = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(), F.col("label").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "label")
    )


def knn_suite(
    queries: DataFrame,
    corpus: DataFrame,
    k_brute: int = 10,
    k_ivf: int = 5,
    partition_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_arrow: bool = False,
    scoring: str = "matmul",
    probe_labels: DataFrame | None = None,
    k_multi: int = 5,
) -> DataFrame:
    """Both search strategies from ONE pass — one scan, one scored pair
    relation, one WindowExec.

    The ivf candidate set (pairs sharing the coarse partition) is a subset
    of the brute-force pair set, so scoring twice — once per strategy — is
    pure waste. And because ivf's ordering (cosine desc, id asc, restricted
    to partition-matching pairs) is the GLOBAL ordering restricted to a
    predicate, its rank is a running conditional count over the same sorted
    window: both ranks share one partition+order spec, so Catalyst computes
    them in a single WindowExec — one exchange on query_id, one sort, no
    second scan, no materialization. Each row then `inline`s into the
    strategies whose top-k it makes.

    Note the top-ks are NOT derivable from each other (a probe's in-
    partition top-5 may rank below its global top-10), which is why both
    need the full scored relation rather than one another's output.

    At 100 TB one would not run brute force at all — this suite exists to
    measure ivf against its exact baseline on the same scan.

    ``scoring='matmul'`` (default) scores via `scored_pairs_matmul` — one
    BLAS matmul per corpus batch against the resident probe matrix, the
    shape that stays linear in corpus traffic at real embedding dims.
    ``scoring='pairwise'`` keeps the broadcast-crossJoin column-expression
    path (fully lazy, no driver-resident probes); ``use_arrow`` selects its
    per-pair kernel.
    """
    if scoring == "matmul":
        if use_arrow:
            raise ValueError(
                "knn_suite: use_arrow selects the pairwise per-pair kernel — "
                "pass scoring='pairwise' with it (the default matmul path "
                "would silently ignore it and collect probes driver-side)"
            )
        scored = scored_pairs_matmul(
            queries,
            corpus,
            vec_col=vec_col,
            id_col=id_col,
            partition_col=partition_col,
            emit_partition=probe_labels is not None,
        )
    else:
        pair_dot = dot_rows if use_arrow else dot
        q = queries.select(
            F.col(id_col).alias("query_id"),
            quantize(F.col(vec_col)).alias("__qv"),
            F.col(partition_col).alias("__qp"),
        ).withColumn("__qn2", pair_dot(F.col("__qv"), F.col("__qv")))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            quantize(F.col(vec_col)).alias("__cv"),
            F.col(partition_col).alias("__cp"),
        ).withColumn("__cn2", pair_dot(F.col("__cv"), F.col("__cv")))
        scored = (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn(
                "cosine_ppm",
                F.floor(
                    F.try_divide(
                        F.lit(1_000_000.0) * pair_dot(F.col("__qv"), F.col("__cv")),
                        F.sqrt(F.col("__qn2")) * F.sqrt(F.col("__cn2")),
                    )
                ).cast("long"),
            )
            .select(
                "query_id", "neighbor_id", "cosine_ppm",
                (F.col("__qp") == F.col("__cp")).alias("__matched"),
                # multiprobe needs the pair's corpus partition — mirror the
                # matmul scorer's emit_partition contract
                *([F.col("__cp").cast("long").alias("__cpart")] if probe_labels is not None else []),
            )
        )
    if probe_labels is not None:
        # multiprobe membership: does the pair's corpus partition sit in the
        # probe's nprobe-nearest-centroid set? The set is tiny (|probes| ×
        # nprobe rows) — a broadcast left join adds the flag without
        # perturbing the scored relation's partitioning.
        mp = probe_labels.select(
            F.col("query_id").alias("__mq"), F.col("label").cast("long").alias("__mpl")
        )
        scored = scored.join(
            F.broadcast(mp),
            (F.col("query_id") == F.col("__mq")) & (F.col("__cpart") == F.col("__mpl")),
            "left",
        ).select(
            "query_id", "neighbor_id", "cosine_ppm", "__matched",
            F.col("__mpl").isNotNull().alias("__matched2"),
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_ppm").desc(), F.col("neighbor_id").asc()
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rank_cols = [
        F.row_number().over(w).alias("__rank_all"),
        # rank among partition-matching pairs = running count of matches
        # in the same global order — rides the same WindowExec
        F.sum(F.when(F.col("__matched"), 1).otherwise(0)).over(running).alias("__rank_ivf"),
        F.col("__matched"),
    ]
    if probe_labels is not None:
        rank_cols.append(
            F.sum(F.when(F.col("__matched2"), 1).otherwise(0)).over(running).alias("__rank_multi")
        )
        rank_cols.append(F.col("__matched2"))
    ranked = scored.select("query_id", "neighbor_id", "cosine_ppm", *rank_cols)
    legs = [
        F.when(
            F.col("__rank_all") <= k_brute,
            F.struct(F.lit("brute").alias("strategy"), F.col("__rank_all").alias("rank")),
        ),
        F.when(
            F.col("__matched") & (F.col("__rank_ivf") <= k_ivf),
            F.struct(F.lit("ivf").alias("strategy"), F.col("__rank_ivf").cast("int").alias("rank")),
        ),
    ]
    if probe_labels is not None:
        legs.append(
            F.when(
                F.col("__matched2") & (F.col("__rank_multi") <= k_multi),
                F.struct(
                    F.lit("ivf2").alias("strategy"), F.col("__rank_multi").cast("int").alias("rank")
                ),
            )
        )
    entries = F.array_compact(F.array(*legs))
    return ranked.select(
        "query_id", "neighbor_id", "cosine_ppm", F.inline(entries)
    ).select("strategy", "query_id", "neighbor_id", "cosine_ppm", "rank")


def evaluate_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k audit of ANY approximate top-k result set against its
    exact (brute-force) ground truth — the eval loop an ANN deployment
    tunes nprobe/nlist/planes against. Inputs are two (query, id)
    relations (extra columns ignored); returns one row per query:
    ``(query_col, n_exact, n_hit, recall_ppm)`` with recall_ppm =
    floor(1e6·|approx ∩ exact| / |exact|) — exact integers, so the audit
    itself is engine-portable and hash-stable like every other metric
    the engine emits. Queries present in ``exact`` but absent from
    ``approx`` (the worst failure: the index returned nothing) appear
    with n_hit = 0 rather than silently vanishing.

    Scale shape: one equi-join on (query, id) — both relations are
    top-k-sized (queries × k rows), so the join and the per-query
    aggregation ride result-sized relations, never the corpus. Compose:
    ``evaluate_recall(search_ivf_pq(...), cosine_topk(...))`` then
    ``.agg(avg)`` driver-side for the headline number."""
    # dedup both projections: a multiprobe index legitimately returns
    # the same id from two probes, and a duplicated (query, id) row on
    # either side would multiply join matches and inflate n_exact/n_hit
    a = (
        approx.select(F.col(query_col), F.col(id_col))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    e = exact.select(F.col(query_col), F.col(id_col)).distinct()
    joined = e.join(a, on=[query_col, id_col], how="left")
    return joined.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hit"),
        F.floor(
            (F.lit(1_000_000) * F.sum(F.coalesce(F.col("__hit"), F.lit(0))))
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("recall_ppm"),
    )
