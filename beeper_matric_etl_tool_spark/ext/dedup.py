"""Document deduplication family (SURVEY §2.12).

Tiers, cheapest first — a real pipeline runs them as a funnel:

1. **Exact** (`exact_dedup`): group by content fingerprint, keep the lowest
   id. One shuffle on the md5 key; at 100 TB the fingerprint (16 B) shuffles
   instead of the document (KBs) — group on the hash, not the text.
2. **N-gram Jaccard** (`jaccard_pairs`): exact set-overlap similarity on
   token shingles. Quadratic in candidates — only ever run *within blocks*
   (here: same `lang`; generally: LSH buckets from tier 3).
3. **MinHash + LSH** (`minhash_signatures` / `lsh_candidate_pairs`): linear-
   time near-dup at corpus scale. Shingle → k independent min-hashes →
   band the signature → exact-match join on (band, band-hash). Only
   documents sharing a band collide, so the join is an equi-join a hash
   shuffle handles; candidates are then verified with the exact Jaccard of
   tier 2. Implemented with built-in hash/array functions — no UDF, no
   driver-side loop, no spark.ml vector dependency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.text import exact_fingerprint, scaled_ratio, tokens
from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key


#: the engine's minhash/LSH defaults — THE single source for both the
#: function defaults below and the SQL oracle builder
#: (plans/catalog_ext.py:_minhash_band_cte), so a default change here
#: re-derives the oracle literals instead of silently desyncing them
MINHASH_NUM_HASHES = 32
MINHASH_BANDS = 8


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One surviving row per distinct content fingerprint (lowest id wins)."""
    with_fp = df.withColumn("__fp", exact_fingerprint(text_col))
    return latest_by_key(with_fp, keys=["__fp"], order_by=[F.col(id_col).asc()]).drop("__fp")


def soft_dedup_weights(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, dup_count, weight_ppm) — the DOWN-WEIGHTING alternative
    to `exact_dedup`'s hard drop (the SoftDeDup idea, public method):
    instead of keeping one copy per content fingerprint, keep every copy
    and hand the trainer a sampling/loss weight inversely proportional
    to its duplication count, so n copies of a document carry the same
    total mass as one unique document (Σ weight over a duplicate group
    = 1e6 − rounding < dup_count ppm). Hard dropping loses the signal
    that duplicated text is PRIOR-heavy; weighting preserves corpus
    coverage while removing the over-count — the knob for pipelines
    that want frequency-aware training rather than deduplication.

    weight_ppm = floor(1e6 / dup_count): exact integer, portable,
    order-independent. Every input row survives with its weight.

    Scale shape: the same fingerprint plan class as `exact_dedup` — one
    md5 per document, one map-side-combined fingerprint count agg, one
    fingerprint-keyed join back; shuffles carry (16-byte fp, id) pairs,
    never text."""
    with_fp = df.select(F.col(id_col), exact_fingerprint(text_col).alias("__fp"))
    counts = with_fp.groupBy("__fp").agg(
        F.count(F.lit(1)).alias("dup_count")
    )
    return (
        with_fp.join(counts, on="__fp")
        .select(
            id_col,
            "dup_count",
            F.expr("1000000 DIV dup_count").alias("weight_ppm"),
        )
    )


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of a token array."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """|a∩b| / |a∪b| over array-encoded sets."""
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / F.size(F.array_union(a, b)).cast("double")


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    block_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    allow_full_scan: bool = False,
) -> DataFrame:
    """All (id_a < id_b) pairs with shingle-Jaccard ≥ threshold, optionally
    blocked on ``block_col`` (quadratic within a block only).

    Without ``block_col`` the pair space is the full O(n²) cross join —
    never acceptable at corpus scale, so it requires an explicit
    ``allow_full_scan=True`` opt-in instead of degrading silently."""
    if block_col is None and not allow_full_scan:
        raise ValueError(
            "jaccard_pairs without block_col is a full O(n^2) cross join; "
            "pass LSH buckets as block_col, or opt in with allow_full_scan=True"
        )
    base = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        shingles(tokens(text_col), shingle_k).alias("__sh"),
    )
    a = base.select(
        *( [F.col(block_col)] if block_col else [] ),
        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"),
    )
    b = base.select(
        *( [F.col(block_col)] if block_col else [] ),
        F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"),
    )
    joined = a.join(b, on=block_col, how="inner") if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_sim", jaccard(F.col("__sha"), F.col("__shb")))
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
        .select("id_a", "id_b", _jaccard_ppm().alias("jaccard_ppm"))
    )


def _jaccard_ppm() -> Column:
    """Exact integer ppm of |__sha ∩ __shb| / |__sha ∪ __shb| — the
    repo-wide fixed-point rule (`ext.text.scaled_ratio`), shared by the
    blocked verifier and the LSH funnel's verify stage so the two scorers
    can never drift."""
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size(F.array_union(F.col("__sha"), F.col("__shb")))
    return scaled_ratio(inter, union)


def portable_hash60(col: Column) -> Column:
    """60-bit integer hash any engine reproduces: the first 15 hex chars of
    md5, parsed base-16. 15 chars keep the value < 2⁶⁰, inside SIGNED
    BIGINT range everywhere (DuckDB: ``CAST('0x'||substr(md5(x),1,15) AS
    BIGINT)``). xxhash64 is faster JVM-side but engine-private — use it
    when nothing downstream crosses engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = MINHASH_NUM_HASHES,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(id, signature) — signature[i] = min over shingles of a seeded hash.
    Seeding via salt concat keeps it one hash call per (shingle, i); the
    whole signature is one nested array expression.

    ``portable=False`` (default): seeded xxhash64, array<long> — the fast
    JVM path. ``portable=True``: md5 of ``"i:shingle"``, array<string>
    minima under lexicographic order — bit-identical in any engine with
    md5 (the DuckDB oracle story); ~2-3× the hash cost, same plan shape."""
    toks = tokens(text_col)
    sh = shingles(toks, shingle_k)
    if portable:
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(
                    sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s))
                )
            ),
        )
    else:
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(sh, lambda s: F.xxhash64(s, i))
            ),
        )
    return df.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = MINHASH_BANDS,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    num_hashes: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 LSH band.

    Explode each signature into ``bands`` (band_id, band_hash) keys and
    self-equi-join on them — the only shuffle is on the band key, so the
    operator scales with corpus size, not corpus². Rows per doc = bands,
    a constant fan-out.

    Bands must divide the signature length exactly — floor-divided band
    widths would silently drop the trailing hashes from every band,
    weakening recall with no warning (mirrors the simhash_candidate_pairs
    guard). When ``num_hashes`` is passed the check fires at plan time;
    either way an in-expression assert validates the ACTUAL signature
    length per row, so the default call cannot degrade silently.
    """
    rows = lsh_band_rows(
        signatures, bands, id_col, sig_col, num_hashes=num_hashes, portable=portable
    )
    a = rows.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = rows.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_band_rows(
    signatures: DataFrame,
    bands: int,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    num_hashes: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """(id, band_id, band_hash) — each signature exploded into its
    ``bands`` LSH bucket keys; the shared kernel behind the within-corpus
    self-join (:func:`lsh_candidate_pairs`) and the cross-corpus join
    (:func:`lsh_cross_candidates`). Carries the same in-expression
    signature-width assert as the callers' plan-time check; pass
    ``num_hashes`` to also fail at PLAN time when bands does not divide
    the signature length (shared guard for both callers)."""
    if num_hashes is not None and num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: a floored "
            f"band width would silently exclude the last "
            f"{num_hashes - bands * (num_hashes // bands)} signature hash(es) "
            f"from every band"
        )
    band_key = F.md5 if portable else F.xxhash64
    sig_size = F.size(F.col(sig_col))
    width_check = F.assert_true(
        sig_size % F.lit(bands) == 0,
        F.concat(
            F.lit(f"lsh_band_rows: bands={bands} must divide the "
                  f"signature length, got "),
            sig_size.cast("string"),
        ),
    )
    return signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                # assert_true yields NULL on pass (raises otherwise), so the
                # when() keeps the runtime width check inside the expression
                # tree where column pruning can't drop it
                lambda b: F.when(
                    width_check.isNull(),
                    band_key(
                        F.concat_ws(",", F.slice(
                            F.col(sig_col),
                            b * (F.size(F.col(sig_col)) / bands).cast("int") + 1,
                            (F.size(F.col(sig_col)) / bands).cast("int"),
                        ))
                    ),
                ),
            )
        ).alias("band_id", "band_hash"),
    )


def lsh_cross_candidates(
    new_sigs: DataFrame,
    ref_sigs: DataFrame,
    bands: int = MINHASH_BANDS,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    num_hashes: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Distinct (new_id, ref_id) pairs sharing ≥1 LSH band ACROSS two
    corpora — the candidate stage of incremental dedup (new batch vs the
    already-kept corpus). Same banded equi-join scaling as the self-join
    form: the only shuffle is on the band key, rows per doc = bands."""
    a = lsh_band_rows(
        new_sigs, bands, id_col, sig_col, num_hashes=num_hashes, portable=portable
    ).select(F.col(id_col).alias("new_id"), "band_id", "band_hash")
    b = lsh_band_rows(
        ref_sigs, bands, id_col, sig_col, num_hashes=num_hashes, portable=portable
    ).select(F.col(id_col).alias("ref_id"), "band_id", "band_hash")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .select("new_id", "ref_id")
        .distinct()
    )


def near_dedup_minhash(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = MINHASH_NUM_HASHES,
    bands: int = MINHASH_BANDS,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Full near-dup funnel: LSH candidates → exact-Jaccard verify → keep
    pairs ≥ threshold. Returns verified duplicate pairs (id_a < id_b) with
    the similarity as exact integer ppm — floor((1e6·|a∩b|)/|a∪b|), the
    repo-wide fixed-point rule; float round() is not reproducible across
    engines at decimal boundaries."""
    sigs = minhash_signatures(df, num_hashes, shingle_k, text_col, id_col, portable=portable)
    cands = lsh_candidate_pairs(sigs, bands, id_col, num_hashes=num_hashes, portable=portable)
    sh = df.select(F.col(id_col), shingles(tokens(text_col), shingle_k).alias("__sh"))
    verified = (
        cands.join(sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb")), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("__sha"), F.col("__shb")))
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
    )
    return verified.select("id_a", "id_b", _jaccard_ppm().alias("jaccard_ppm"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4


#: signature width of the PORTABLE simhash: 15 md5 hex chars = 60 bits
#: (the widest hex prefix whose value fits SIGNED BIGINT in every engine)
SIMHASH_BITS_PORTABLE = 60


def simhash_bits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """(id, bits array<int>[n_bits]) — classic SimHash: per-token hash,
    each bit position votes ±1, the sign of the vote sum is the signature
    bit. One explode + one groupBy (single shuffle on the id); the
    per-bit sums are columnar aggregates the codegen fuses into one pass.

    ``portable=True`` swaps xxhash64 for :func:`portable_hash60` (60-bit
    md5 prefix) so the WHOLE signature — and therefore candidates and
    hamming scores — is engine-reproducible; everything downstream of the
    hash is plain arithmetic in any SQL dialect."""
    if n_bits is None:
        n_bits = SIMHASH_BITS_PORTABLE if portable else SIMHASH_BITS
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
    token_hash = portable_hash60(F.col("__tok")) if portable else F.xxhash64("__tok")
    hashed = toked.withColumn("__h", token_hash)
    # r14: the vote/sign expressions are built as PARSED strings — the
    # Column-DSL form was ~n_bits × 8 py4j round trips per call (pure
    # driver-side composition chatter); the parsed trees are identical
    # (same shiftright/&/CASE algebra), so plans, results and the DuckDB
    # oracle replay are unchanged.
    votes = [
        F.expr(
            f"sum(case when (shiftright(__h, {j}) & 1) = 1 then 1 else -1 end)"
        ).alias(f"__v{j}")
        for j in range(n_bits)
    ]
    summed = hashed.groupBy(id_col).agg(*votes)
    bits = F.expr(
        "array(" + ",".join(
            f"case when __v{j} > 0 then 1 else 0 end" for j in range(n_bits)
        ) + ")"
    )
    return summed.select(F.col(id_col), bits.alias("bits"))


#: banding buckets above this row count take the sub-band path (see
#: `_with_sub_bands`). Per bucket of size g the direct join emits ~g²/2
#: candidates, so the cap bounds the worst direct bucket at ~32k pairs.
SIMHASH_SKEW_CAP = 256


def scaled_bands_for(
    n_docs: int, n_bits: int, max_hamming: int, margin_bits: int = 4
) -> int:
    """Corpus-sized BANDS for the pigeonhole banding — the
    `similarity.scaled_planes_for` sizing rule applied to hamming
    signatures, so production callers derive banding from a corpus
    estimate instead of hand-picking: a band's random-collision count is
    ~n²/2^width per band, so holding width ≥ ⌈log₂(n)⌉ + ``margin_bits``
    keeps expected random candidates at O(n · bands / 2^margin) — the
    linear regime (`tools/banding_probe.py` measures it). Recall needs
    ``bands ≥ max_hamming + 1`` (the pigeonhole guarantee) and banding
    needs ``bands | n_bits``.

    Returns the LARGEST divisor of ``n_bits`` whose band width clears the
    entropy floor — maximum recall headroom within the selective regime
    (candidate-row inflation is linear in bands; the n² hazard the floor
    guards against is the one that kills a 100 TB run). Raises when the
    two constraints cannot coexist at this width, naming the minimum
    signature width that would satisfy both — "widen the signature" is
    the only honest fix, and a silent clamp in either direction would
    surface as a recall hole or a quadratic candidate join at exactly
    the corpus size where neither is debuggable. Count (or estimate) the
    corpus once per index build, like the LSH plane rule."""
    import math

    need_width = max(1, math.ceil(math.log2(max(n_docs, 2)))) + margin_bits
    ok = [
        b
        for b in range(max_hamming + 1, n_bits + 1)
        if n_bits % b == 0 and n_bits // b >= need_width
    ]
    if not ok:
        raise ValueError(
            f"scaled_bands_for: no banding of n_bits={n_bits} has both "
            f"bands >= {max_hamming + 1} (recall for max_hamming="
            f"{max_hamming}) and band width >= {need_width} (selectivity "
            f"for ~{n_docs} docs with margin {margin_bits}) — widen the "
            f"signature to at least {(max_hamming + 1) * need_width} bits"
        )
    return max(ok)


def _hamming_expr(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _banded_rows(
    sigs: DataFrame, id_col: str, bands: int, width: int, keys: list[str]
) -> DataFrame:
    """(id_col, bits, *keys, band_id, band_value) — one row per band.

    Bits are INTERLEAVE-PERMUTED first (band-major: contiguous slices of
    the permuted array are the stride-``bands`` sets of the original), so
    every band — and every sub-band the skew guard later slices from the
    permuted remainder — draws from positions spread across the WHOLE
    signature. Signature families concentrate their entropy regionally
    (measured on the acoustic fingerprint: contiguous 16-bit slices of a
    20k-doc corpus grouped 35 % under one value, and even the contiguous
    sub-band fallback still produced 167M candidate pairs; the same
    corpus under interleaved slices: 5.9M). Correctness is unaffected:
    hamming is permutation-invariant and the pigeonhole guarantee holds
    for ANY fixed partition of the bits, so the verified pair set is
    identical — only the candidate count changes."""
    perm = [b + j * bands for b in range(bands) for j in range(width)]
    # ONE parsed expression instead of n_bits getItem() Column ops: each
    # Column op is a py4j round trip, and this builder runs per banded
    # funnel leg — measured r14 on multimodal_features' construction,
    # the getItem listcomp alone was ~6.5 s of driver-side chatter.
    # `bits[p]` parses to the same GetArrayItem node, so plans (and
    # results) are identical.
    permuted = F.expr("array(" + ",".join(f"bits[{p}]" for p in perm) + ")")
    return sigs.select(
        F.col(id_col),
        permuted.alias("bits"),
        *keys,
    ).select(
        F.col(id_col),
        F.col("bits"),
        *keys,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws("", F.slice(F.col("bits"), b * width + 1, width)),
            )
        ).alias("band_id", "band_value"),
    )


def _with_sub_bands(
    big: DataFrame, n_bits: int, width: int, sub_bands: int
) -> DataFrame:
    """Adds (sub_id, sub_value) by re-banding each row's REMAINING bits
    (everything outside its own band's slice) into ``sub_bands`` slices —
    the skew guard's second level. Pigeonhole again: a pair within
    ``max_hamming`` that agrees exactly on band b has ≤ max_hamming
    mismatches in the remaining bits, so over ``max_hamming + 1``
    covering sub-slices ≥ 1 agrees exactly — requiring (band AND
    sub-band) agreement for members of oversized buckets preserves total
    recall while breaking the bucket's n² candidate join into 2^sub_width
    sub-buckets keyed by HIGH-entropy bits (the bucket's members agree on
    the low-entropy slice by definition — their distinguishing bits are
    all in the remainder)."""
    rest = F.concat(
        F.slice(F.col("bits"), F.lit(1), F.col("band_id") * width),
        F.slice(
            F.col("bits"), F.col("band_id") * width + width + 1, F.lit(n_bits)
        ),
    )
    rest_len = n_bits - width
    sub_width = rest_len // sub_bands
    lengths = [sub_width] * (sub_bands - 1) + [rest_len - sub_width * (sub_bands - 1)]
    subs, pos = [], 1
    for si, ln in enumerate(lengths):
        subs.append(
            F.struct(
                F.lit(si).alias("sub_id"),
                F.concat_ws("", F.slice(F.col("__rest"), pos, ln)).alias("sub_value"),
            )
        )
        pos += ln
    return (
        big.withColumn("__rest", rest)
        .withColumn("__s", F.explode(F.array(*subs)))
        .select(*[c for c in big.columns], F.col("__s.sub_id"), F.col("__s.sub_value"))
    )


def simhash_candidate_pairs(
    sigs: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    bands: int = SIMHASH_BANDS,
    n_bits: int = SIMHASH_BITS,
    cache: bool = True,
    skew_cap: int = SIMHASH_SKEW_CAP,
) -> DataFrame:
    """(id_a < id_b, hamming) pairs with hamming distance ≤ max_hamming.

    Pigeonhole banding: with `bands` equal slices, any pair within
    hamming ≤ bands-1 must agree exactly on ≥1 slice — so candidates come
    from an equi-join on (band_id, band_value), linear in corpus size, and
    the full hamming distance is verified only on candidates.

    The guarantee REQUIRES max_hamming ≤ bands-1 and the bands to cover
    every bit; both are enforced — a silent partial result would read as
    "no near-duplicates" exactly when it matters. The signature width is
    taken from ``n_bits`` (pass :data:`SIMHASH_BITS_PORTABLE` when the
    signatures came from the portable hash).

    SKEW GUARD: equi-join linearity assumes band values spread. Real
    signature families have low-entropy regions — measured: the
    acoustic fingerprint's flux-plane bands grouped 35 % of a synthetic
    corpus under ONE 16-bit value, which turns that band's join into
    ~(0.35·n)² candidates. Buckets above ``skew_cap`` rows therefore
    re-band each member's REMAINING bits into max_hamming+1 sub-slices
    and join on (band, sub-band) — recall-preserving by the same
    pigeonhole argument (`_with_sub_bands`), and the sub-key is built
    from exactly the bits the bucket's members DON'T share. Cost when no
    bucket is oversized: one map-side-combined count over the banded
    rows. Sub-banding needs n_bits - width ≥ max_hamming + 1 remaining
    bits; narrower signatures fall back to the direct join.

    ``cache=True`` (default) localCheckpoints the pruned (id, bits)
    relation ONCE before banding: the self-join consumes the signatures
    as BOTH sides, and Catalyst does not reuse the unshuffled stage —
    without the checkpoint the whole upstream signature computation (the
    tokenize+vote aggregation here; the BMP decode in the image path,
    `ext/multimodal.py:image_near_dup_pairs`) executes twice, plan-pinned
    in tests. The knn_multiprobe/pmi precedent: one materialization of a
    multi-consumer expensive stage, opt-out for callers that cached
    upstream themselves (localCheckpoint is eager and this function
    stops being lazy under the default)."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding guarantees recall only for max_hamming <= bands-1 "
            f"(got max_hamming={max_hamming}, bands={bands}); raise `bands`"
        )
    if n_bits % bands != 0:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    width = n_bits // bands
    sub_bands = max_hamming + 1
    sigs = sigs.select(F.col(id_col), "bits")
    if cache:
        sigs = sigs.localCheckpoint(eager=True)
    banded = _banded_rows(sigs, id_col, bands, width, [])
    hamming = _hamming_expr("__ba", "__bb")

    def pair_up(rows: DataFrame, join_keys: list[str]) -> DataFrame:
        a = rows.select(
            F.col(id_col).alias("id_a"), F.col("bits").alias("__ba"), *join_keys
        )
        b = rows.select(
            F.col(id_col).alias("id_b"), F.col("bits").alias("__bb"), *join_keys
        )
        return (
            a.join(b, on=join_keys)
            .filter(F.col("id_a") < F.col("id_b"))
            # verify BEFORE the dedup so the distinct shuffles
            # (id, id, int) instead of two full bit arrays per candidate
            .select("id_a", "id_b", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )

    if n_bits - width < sub_bands:
        return pair_up(banded, ["band_id", "band_value"]).distinct()
    sizes = banded.groupBy("band_id", "band_value").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    banded = banded.join(sizes, on=["band_id", "band_value"])
    small = pair_up(
        banded.filter(F.col("__bn") <= skew_cap), ["band_id", "band_value"]
    )
    big = pair_up(
        _with_sub_bands(banded.filter(F.col("__bn") > skew_cap), n_bits, width, sub_bands),
        ["band_id", "band_value", "sub_id", "sub_value"],
    )
    return small.unionByName(big).distinct()


def simhash_cross_candidates(
    new_sigs: DataFrame,
    ref_sigs: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    bands: int = SIMHASH_BANDS,
    n_bits: int = SIMHASH_BITS,
    key_cols: tuple[str, ...] = (),
    cache: bool = True,
    skew_cap: int = SIMHASH_SKEW_CAP,
) -> DataFrame:
    """(doc_id, ref_id, hamming ≤ max_hamming) CROSS-CORPUS near-dup
    pairs: the incremental twin of :func:`simhash_candidate_pairs` — new
    batch on one side, an existing (usually persisted) signature
    relation on the other. Both sides band identically, candidates come
    from the new×ref equi-join on (band_id, band_value, *key_cols) —
    linear in batch + reference, never all-pairs — and the exact hamming
    is verified on candidates only. The pigeonhole recall guarantee
    (``max_hamming ≤ bands-1``, bands cover every bit) carries over
    verbatim and is enforced the same way, and so does the self-join
    form's SKEW GUARD: bucket sizes are counted over BOTH sides together
    (a pair's two rows share their bucket, so the classification is
    consistent), and members of buckets above ``skew_cap`` join on
    (band, sub-band of their remaining bits) instead — see
    `simhash_candidate_pairs` for the measured low-entropy-band hazard
    this guards against.

    ``key_cols`` narrows banding collisions to same-key rows — the media
    index passes ``("modality",)`` so an image signature can never band
    against an audio one. Unlike the self-join form there is no id
    ordering between the sides (the reference's id space is independent
    of the batch's); both sides' signatures are expected deduplicated
    per id. ``cache=True`` localCheckpoints the NEW side only — its
    upstream is typically an expensive decode/tokenize stage consumed
    once per band, while the reference side is a plain parquet scan the
    caller already persisted."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"banding guarantees recall only for max_hamming <= bands-1 "
            f"(got max_hamming={max_hamming}, bands={bands}); raise `bands`"
        )
    if n_bits % bands != 0:
        raise ValueError(f"bands={bands} must divide n_bits={n_bits}")
    width = n_bits // bands
    sub_bands = max_hamming + 1
    keys = list(key_cols)
    new_sigs = new_sigs.select(F.col(id_col), "bits", *keys)
    if cache:
        new_sigs = new_sigs.localCheckpoint(eager=True)

    a_rows = _banded_rows(new_sigs, id_col, bands, width, keys).withColumn(
        "__side", F.lit("n")
    )
    b_rows = _banded_rows(
        ref_sigs.select(F.col(id_col), "bits", *keys), id_col, bands, width, keys
    ).withColumn("__side", F.lit("r"))
    both = a_rows.unionByName(b_rows)
    hamming = _hamming_expr("__nb", "__rb")

    def pair_up(rows: DataFrame, join_keys: list[str]) -> DataFrame:
        a = rows.filter(F.col("__side") == "n").select(
            F.col(id_col).alias("__nid"), F.col("bits").alias("__nb"), *join_keys
        )
        b = rows.filter(F.col("__side") == "r").select(
            F.col(id_col).alias("__rid"), F.col("bits").alias("__rb"), *join_keys
        )
        return (
            a.join(b, on=join_keys)
            # verify BEFORE the dedup: the distinct shuffles ids + an int
            # instead of two full bit arrays per candidate
            .select("__nid", "__rid", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )

    if n_bits - width < sub_bands:
        out = pair_up(both, ["band_id", "band_value", *keys])
    else:
        sizes = both.groupBy("band_id", "band_value", *keys).agg(
            F.count(F.lit(1)).alias("__bn")
        )
        both = both.join(sizes, on=["band_id", "band_value", *keys])
        small = pair_up(
            both.filter(F.col("__bn") <= skew_cap),
            ["band_id", "band_value", *keys],
        )
        big = pair_up(
            _with_sub_bands(
                both.filter(F.col("__bn") > skew_cap), n_bits, width, sub_bands
            ),
            ["band_id", "band_value", "sub_id", "sub_value", *keys],
        )
        out = small.unionByName(big)
    return out.distinct().select(
        F.col("__nid").alias(id_col),
        F.col("__rid").alias("ref_id"),
        "hamming",
    )


# ---------------------------------------------------------------------------
# Duplicate clusters (connected components)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = the minimum node id reachable through the undirected pair
    graph — the step that turns verified near-dup PAIRS into duplicate
    CLUSTERS (pick one canonical doc per component; drop the rest).

    Min-label propagation WITH POINTER JUMPING, pure DataFrame ops per
    round: each node adopts the smallest of (its label, its neighbours'
    labels, its LABEL'S label). The third term is the pointer-jumping /
    path-doubling step — a label chain of length L halves every round, so
    convergence is O(log diameter) rounds instead of O(diameter): a
    10⁶-node templated-document CHAIN (the pathological near-dup shape a
    plain propagation cannot finish inside any reasonable round budget)
    converges in ~20 rounds. Soundness: a node's label is always a
    REACHABLE node id (labels start as self, and both the neighbour min
    and the label-of-label are reachable-through-reachable), labels only
    decrease, and at the fixpoint labels are equal across every edge and
    idempotent (label(label(u)) = label(u)) — which forces label =
    component minimum.

    Every round shuffles only the PAIR graph (post-LSH verified
    duplicates — a sliver of the corpus), never the corpus itself: at
    100 TB the corpus touches this computation exactly once, in the
    caller's final left join of labels back onto documents. Per round:
    one groupBy over the edges and two label-table joins (the second is
    the jump — pair-scale, label table is one row per node of the pair
    graph). Lineage is truncated with ``localCheckpoint`` each round so
    the plan stays O(1) deep; the loop's per-round driver action is a
    count on the pair-scale frontier, not a corpus scan.

    Raises ``RuntimeError`` if ``max_iterations`` rounds don't reach the
    fixpoint — a silently-partial clustering would under-deduplicate
    exactly when the graph is at its most pathological. With pointer
    jumping the default 50-round budget covers diameters up to ~2⁵⁰, so
    hitting the raise indicates a wiring bug, not a long chain.
    """
    half = pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    # lazy checkpoints (r13): round 1's count job reads both frames, so
    # it materializes them and truncates lineage in that same action —
    # two fewer up-front jobs per components call with identical blocks
    edges = (
        half.unionByName(half.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=False)

    for _ in range(max_iterations):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("d"), F.col("label").alias("__nl")),
                on="d",
            )
            .groupBy("s")
            .agg(F.min("__nl").alias("__nbr"))
        )
        # pointer jump: the label's own label (every label IS a node of
        # the pair graph — invariant above — so this join hits)
        jump = labels.select(F.col("node").alias("__jn"), F.col("label").alias("__jl"))
        stepped = (
            labels.join(
                nbr_min.select(F.col("s").alias("node"), "__nbr"), on="node", how="left"
            )
            .join(jump, on=F.col("label") == F.col("__jn"), how="left")
            .select(
                "node",
                "label",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("__nbr"), F.col("label")),
                    F.coalesce(F.col("__jl"), F.col("label")),
                ).alias("__new"),
            )
            # LAZY checkpoint + count in ONE job (r13): the count below
            # scans every partition, which materializes the checkpointed
            # blocks and truncates lineage in the same action — the old
            # eager checkpoint ran a separate materialization job first,
            # doubling the loop's job count for no work
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("__new") < F.col("label")).count()
        labels = stepped.select("node", F.col("__new").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        f"with pointer jumping that bounds the component diameter at ~2^"
        f"{max_iterations} — this indicates a wiring bug (e.g. labels fed "
        f"from a different graph), not a long chain; inspect the pair "
        f"graph before raising max_iterations"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Corpus-wide duplicate-cluster assignment: every document labeled with
    its cluster id (min doc id of its near-dup component; singletons label
    themselves) and an ``is_canonical`` survivor flag — deterministic
    lowest-id-wins, matching `exact_dedup`. `filter(is_canonical)` IS the
    deduplicated corpus. One corpus-side left join; all iteration happens on
    the pair graph inside :func:`connected_components`."""
    comp = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    return (
        docs.join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def dedup_against_reference(
    new_docs: DataFrame,
    reference: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = MINHASH_NUM_HASHES,
    bands: int = MINHASH_BANDS,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental dedup: drop rows of ``new_docs`` that duplicate the
    ALREADY-KEPT ``reference`` corpus — the operation a live pipeline runs
    per crawl snapshot instead of re-deduplicating 100 TB from scratch.
    Within-batch duplicates are the existing kernels' job (`exact_dedup`,
    `near_dedup_minhash` + components); this one only answers "is it new?".

    Returns ``(survivors, dropped)``:

    - survivors: the ``new_docs`` rows that are neither exact- nor
      near-duplicates of any reference row (all input columns kept);
    - dropped: (new id, ``ref_id`` witness, ``reason`` 'exact'|'near',
      ``jaccard_ppm`` — NULL for exact drops). One row per dropped doc,
      exact-reason wins — deterministic audit trail. The near-tier
      witness is the CLOSEST match (maximum verified Jaccard, ties to
      the smallest ref_id), so a threshold post-filter on
      ``jaccard_ppm`` sees the batch doc's true nearest reference —
      the same contract as the media index's min-(hamming, ref_id)
      witness (`ext/media_index.py`; unified r12 — the lowest-id
      witness this replaces could understate the true similarity).
      Exact-tier witnesses keep the smallest matching ref_id: every
      exact match is equally "closest", so the id is pure tiebreak.

    Scale shape: the reference is touched by three linear passes
    (fingerprints for the exact anti-join, banded signatures for the LSH
    candidate join, shingles for candidate rows only via semi-join) —
    never reference² and never reference × batch.

    ``portable=True`` swaps the minhash/band hashes for the md5 family
    (see :func:`minhash_signatures`) so the candidate set — and therefore
    the exact drop/survive decisions — is reproducible by any engine with
    md5 (the DuckDB-oracle story); ~2-3× the hash cost, same plan shape.

    Cost note: ``survivors`` and ``dropped`` SHARE unpersisted lineage
    (``exact_wit`` feeds both; the LSH candidate join feeds both) — a
    caller materializing BOTH frames re-runs the fingerprint join and the
    signature scans twice. Materialize one, or persist/localCheckpoint
    the pair first (curate() persists one stage up for the same reason).

    Steady state: the three reference passes re-derive fingerprints,
    signatures and shingles from raw text EVERY batch. A live deployment
    amortizes them with the persisted index
    (:mod:`~beeper_matric_etl_tool_spark.ext.dedup_index` —
    ``build_dedup_index`` / ``dedup_against_index`` / ``append_dedup_index``),
    which feeds the SAME core as this function, so the drop/survive
    decisions are bit-identical between the two modes.
    """
    ref_fp = reference.select(exact_fingerprint(text_col).alias("__fp"),
                              F.col(id_col).alias("__ref_id"))
    ref_sigs = minhash_signatures(
        reference, num_hashes, shingle_k, text_col, id_col, portable=portable
    )
    ref_sh = reference.select(
        F.col(id_col).alias("ref_id"), shingles(tokens(text_col), shingle_k).alias("__shb")
    )
    return dedup_against_frames(
        new_docs,
        ref_fp,
        ref_sigs,
        ref_sh,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        text_col=text_col,
        id_col=id_col,
        portable=portable,
    )


def dedup_against_frames(
    new_docs: DataFrame,
    ref_fp: DataFrame,
    ref_sigs: DataFrame,
    ref_sh: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = MINHASH_NUM_HASHES,
    bands: int = MINHASH_BANDS,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The incremental-dedup core over PRE-DERIVED reference frames — the
    shared engine behind :func:`dedup_against_reference` (frames derived
    lazily from raw reference text) and
    :func:`~beeper_matric_etl_tool_spark.ext.dedup_index.dedup_against_index`
    (frames read from the persisted index, no reference text scan).

    Frame contracts (column names are part of the interface):

    - ``ref_fp``:   (``__fp`` md5 hex, ``__ref_id``) — the exact-dup side;
    - ``ref_sigs``: (``id_col``, ``signature``) minhash signatures built
      with the SAME (num_hashes, shingle_k, portable) as passed here —
      mismatched configs change banding keys and therefore decisions,
      which is why the persisted index stores its config and validates it;
    - ``ref_sh``:   (``ref_id``, ``__shb`` shingle array) — consumed only
      for LSH candidates (semi-joined down before the verify join).
    """
    new_fp = new_docs.withColumn("__fp", exact_fingerprint(text_col))
    exact_wit = (
        new_fp.select(F.col(id_col), "__fp")
        .join(ref_fp, on="__fp")
        .groupBy(id_col)
        .agg(F.min("__ref_id").alias("ref_id"))
        .select(
            F.col(id_col),
            "ref_id",
            F.lit("exact").alias("reason"),
            F.lit(None).cast("long").alias("jaccard_ppm"),
        )
    )
    # The explicit repartition pins a TRUE HashPartitioning on the
    # post-exact batch. Without it, a union-shaped `new_docs` (the normal
    # multi-source ingest) trips a Spark planner edge: the LeftAnti join
    # is pushed through the Union, the resulting UnionExec claims its
    # children's hash partitioning while its actual RDD has the SUMMED
    # partition count, and the first downstream zip (sort-merge join /
    # no-exchange aggregate) dies with "Can't zip RDDs with unequal
    # numbers of partitions". Not an extra shuffle in practice: the
    # survivors anti-join below needs the batch hash-partitioned by
    # id_col anyway, so this exchange replaces the one EnsureRequirements
    # would have inserted there.
    after_exact = new_fp.join(
        exact_wit.select(id_col), on=id_col, how="left_anti"
    ).repartition(F.col(id_col))

    new_sigs = minhash_signatures(
        after_exact, num_hashes, shingle_k, text_col, id_col, portable=portable
    )
    cands = lsh_cross_candidates(
        new_sigs, ref_sigs, bands, id_col, num_hashes=num_hashes, portable=portable
    )
    new_sh = after_exact.select(
        F.col(id_col).alias("new_id"), shingles(tokens(text_col), shingle_k).alias("__sha")
    )
    cand_ref_sh = ref_sh.join(cands.select("ref_id").distinct(), on="ref_id", how="left_semi")
    near_wit = (
        cands.join(new_sh, on="new_id")
        .join(cand_ref_sh, on="ref_id")
        .withColumn("jaccard_sim", jaccard(F.col("__sha"), F.col("__shb")))
        .filter(F.col("jaccard_sim") >= F.lit(threshold))
        .withColumn("__jppm", _jaccard_ppm())
        .groupBy("new_id")
        .agg(
            # CLOSEST-match witness: min over (-jaccard, ref_id) structs
            # orders lexicographically — maximum similarity first,
            # smallest ref_id on ties (the media index's witness
            # contract, unified r12; candidates are distinct per
            # (new_id, ref_id) so the struct order is total)
            F.min(
                F.struct((-F.col("__jppm")).alias("nj"), F.col("ref_id"))
            ).alias("__w"),
        )
        .select(
            F.col("new_id").alias(id_col),
            F.col("__w.ref_id").alias("ref_id"),
            F.lit("near").alias("reason"),
            (-F.col("__w.nj")).alias("jaccard_ppm"),
        )
    )
    survivors = after_exact.drop("__fp").join(
        near_wit.select(id_col), on=id_col, how="left_anti"
    )
    dropped = exact_wit.unionByName(near_wit)
    return survivors, dropped
