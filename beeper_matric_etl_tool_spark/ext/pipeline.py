"""Composed training-data curation pipeline (SURVEY §2.12, the "a user of
the reference could switch" surface for LLM-corpus work).

`curate()` chains the individually-oracled stages into the standard
pretraining-corpus order — each stage is the SAME kernel the driver-checked
catalog query runs, so the composition adds no new semantics, only wiring:

0. normalization     — C4-style byte canonicalization (ext/text.py:
                       normalize_text), ON by default: it runs BEFORE
                       every fingerprint so curly-quote/NBSP/doubled-
                       space variants of the same document hash
                       together instead of sailing past exact AND
                       MinHash dedup
1. quality gate      — C4/Gopher rule battery (ext/quality.py)
2. PII scrub         — layered email/digit-run redaction (ext/quality.py)
3. exact dedup       — content-fingerprint lowest-id-wins (ext/dedup.py)
4. near-dup dedup    — MinHash+LSH pairs → connected components →
                       canonical survivors (ext/dedup.py)
5. incremental dedup — drop duplicates of the ALREADY-KEPT corpus, when a
                       reference is provided (ext/dedup.py:
                       dedup_against_reference) — the per-snapshot mode
6. semantic dedup    — SemDeDup over embeddings, when provided
                       (ext/semdedup.py)
7. source-mix sample — hash-threshold keep rates per source (the
                       deterministic, resumable, RNG-free sampler)
8. sequence packing  — deterministic pseudo-random order, fixed
                       token-budget bins (pack_by_budget below)

Every stage is LAZY — with ONE scoped exception: the near-dup components
labeling (`ext/dedup.py:dedup_clusters`, pointer jumping) is iterative
and must run its bounded convergence actions at curate() time, over the
fingerprint/pair relations only — never text, never the corpus. Every
OTHER stage (including the optional classifier/despan/fluency/dsir
stages — dsir rides `importance_resample(lazy=True)`, pinned zero-jobs
in tests) builds pure plans, so a caller materializes only the final
corpus (one data pass at 100 TB) or audits any intermediate.
`stage_report()` forces counts when the funnel numbers themselves are
the product.

Determinism contract: re-running curate() on the same input yields
byte-identical decisions — every stage keys off content hashes or ids,
never RNG or row order. That is what makes a 100 TB curation resumable
and its ablations reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.dedup import (
    dedup_against_reference,
    dedup_clusters,
    exact_dedup,
    near_dedup_minhash,
)
from beeper_matric_etl_tool_spark.ext.quality import (
    pii_columns,
    quality_signal_columns,
    quality_verdict_columns,
)
from beeper_matric_etl_tool_spark.ext.semdedup import semantic_dedup
from beeper_matric_etl_tool_spark.ext.text import token_count


#: the salt that decorrelates the mix-sampling hash from every OTHER
#: md5(doc_id)-derived decision in the engine — the train/val holdout
#: keys off the UNSALTED first hex digit, the packing shuffle off the
#: ':pack'-salted hash (PACK_SALT below): without a distinct salt here, a
#: 10% keep-rate would select exactly the holdout's '0'/'1' prefix range
#: — i.e. 100% of the kept corpus would be holdout-val. Independent
#: decisions need independent hash functions; a fixed salt per decision
#: is the deterministic way to get one.
MIX_SALT = ":mix"

#: the packing-shuffle salt (see MIX_SALT): distinct from both the
#: unsalted holdout hash and the mix salt, so export order is independent
#: of every other hash-derived decision. tests/test_properties.py's
#: pack-order oracle references this constant.
PACK_SALT = ":pack"


def mix_hex_threshold(rate: float) -> str:
    """A keep rate as the engine's 6-hex-char threshold: floor(rate·16⁶)
    in lowercase hex. rate ≥ 1.0 → 'zzzzzz', a sentinel ABOVE the hex
    alphabet so the strict compare keeps every row (a threshold of
    'ffffff' would silently drop the ~2⁻²⁴ sliver of exact-prefix docs);
    rate ≤ 0.0 → '000000' (drop everything)."""
    if rate >= 1.0:
        return "zzzzzz"
    if rate <= 0.0:
        return "000000"
    import math

    return format(int(math.floor(rate * 16**6)), "06x")


def mix_keep(
    id_col: Column | str,
    source_col: Column | str,
    rates: dict[str, float],
    salt: str = MIX_SALT,
) -> Column:
    """The hash-threshold source-mix keep decision: keep iff
    substr(md5(id || salt),1,6) < the source's rate as a 6-hex-char
    threshold (:func:`mix_hex_threshold`). Lexicographic compare on
    lowercase hex is exact and engine-portable. Unknown sources get
    threshold '000000' — drop everything, loudly visible in the funnel
    rather than silently kept. See :data:`MIX_SALT` for why the hash is
    salted."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    src = F.col(source_col) if isinstance(source_col, str) else source_col
    if not rates:
        # no configured source ⇒ every row's threshold is '000000' (drop
        # all) — short-circuit rather than build a VOID-typed empty map
        return F.lit(False)
    thresh = F.create_map(
        *[
            x
            for s, rate in rates.items()
            for x in (F.lit(s), F.lit(mix_hex_threshold(rate)))
        ]
    )
    h = F.substring(F.md5(F.concat(idc.cast("string"), F.lit(salt))), 1, 6)
    return h < F.coalesce(thresh[src], F.lit("000000"))


#: the epoch-upsampling salt — a THIRD independent hash decision (see
#: MIX_SALT): the fractional-copy coin must be independent of both the
#: holdout split and the mix keep decision, or "rate 1.25" would hand the
#: extra epoch to exactly the docs the 25%-mix-rate sources keep.
EPOCH_SALT = ":epoch"


def epoch_copies(
    id_col: Column | str,
    source_col: Column | str,
    rates: dict[str, float],
    salt: str = EPOCH_SALT,
) -> Column:
    """Number of training copies per document under temperature-style
    source mixing with rates ABOVE 1 allowed (the upsampling half that
    :func:`mix_keep` cannot express): ``floor(rate)`` guaranteed copies,
    plus one more iff the salted hash clears the FRACTIONAL part's
    threshold — so a source at rate 2.25 emits every doc twice and a
    deterministic, content-stable quarter of them three times, and the
    expected token mix matches the requested rate exactly. rate ≤ 1
    degenerates to mix_keep's semantics (0 or 1 copies, same hash rule,
    different salt). Unknown sources get 0 copies — dropped loudly in
    the audit, never silently kept."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    src = F.col(source_col) if isinstance(source_col, str) else source_col
    if not rates:
        # no configured source ⇒ zero copies everywhere (the mix_keep
        # empty-map rule, same VOID-map hazard)
        return F.lit(0).cast("int")
    import math

    base = F.create_map(
        *[
            x
            for s, rate in rates.items()
            for x in (F.lit(s), F.lit(int(math.floor(rate))))
        ]
    )
    frac = F.create_map(
        *[
            x
            for s, rate in rates.items()
            for x in (F.lit(s), F.lit(mix_hex_threshold(rate - math.floor(rate))))
        ]
    )
    h = F.substring(F.md5(F.concat(idc.cast("string"), F.lit(salt))), 1, 6)
    extra = F.when(h < F.coalesce(frac[src], F.lit("000000")), 1).otherwise(0)
    return (F.coalesce(base[src], F.lit(0)) + extra).cast("int")


def mix_epochs(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = EPOCH_SALT,
) -> DataFrame:
    """Materialize :func:`epoch_copies` as training examples: one output
    row per (document, copy), with ``copy_id`` in 0..n_copies-1 —
    (id, copy_id) is the stable training-example key a downstream
    shuffle/packing stage works from. Zero-copy documents disappear (the
    audit view is :func:`epoch_copies` itself, or the corpus_composition
    dim='epoch' leg). Scale shape: pure column fan-out (sequence →
    filter → explode) at the row's location, no shuffle; the data-volume
    multiplier IS the requested epoch mix."""
    n = epoch_copies(id_col, source_col, rates, salt=salt)
    # sequence(0, -1) would produce a DESCENDING [0, -1] in Spark, so
    # clamp the end at 0 and length-filter instead of branching on types
    copies = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))), lambda c: c < n
    )
    return df.withColumn("copy_id", F.explode(copies))


#: the quota-sampling salt — a FOURTH independent hash decision (see
#: MIX_SALT): the per-stratum ranking that carves fixed-size eval sets
#: must be independent of the holdout split, the mix keep and the epoch
#: coin, or "100 en eval docs" would preferentially pick the docs those
#: decisions already touched.
QUOTA_SALT = ":quota"


def sample_quota(
    df: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = QUOTA_SALT,
    two_phase: bool = False,
) -> DataFrame:
    """EXACTLY min(quota, |stratum|) rows per stratum — the fixed-size
    stratified sample an eval-set carve or a human-review draw needs,
    where hash-THRESHOLD sampling (:func:`mix_keep`) cannot serve: a
    rate keeps a binomially-varying count, a quota keeps a guaranteed
    one. Selection ranks each stratum by the ':quota'-salted md5 of the
    stable id — deterministic, engine-portable, independent of input
    order and of every other hash decision (salt convention above).
    Adding documents to a stratum can displace previously-sampled ones
    (quota semantics, not reservoir semantics — the sample IS the top-N
    of the hash order, whatever the corpus); docs whose stratum has no
    quota entry get quota 0 and are dropped loudly, mirroring mix_keep.

    Scale shape: one window per stratum over a PRUNED projection — the
    sort carries (stratum, hash, id), never text or embeddings, and the
    rank filter discards past-quota rows at the exchange that follows.
    Spark has no rank-pushdown partial top-k for windows, so by default a
    dominant stratum means one task sorts that stratum's (hash, id)
    pairs; at 16 B/row that is ~1.6 GB per 100 M docs — acceptable where
    a text-bearing sort would not be. ``two_phase=True`` is the
    refinement for when a stratum outgrows that window: phase 1 takes
    each (input partition, stratum)'s LOCAL top-quota under a window
    keyed by `spark_partition_id()` — the dominant stratum's sort spreads
    over all input partitions instead of one task — and phase 2 re-ranks
    only the surviving candidates (≤ quota·n_input_partitions per
    stratum, a bounded final sort). The global top-quota of a stratum is
    contained in the union of its per-partition top-quotas, so the two
    forms return IDENTICAL rows (pinned in tests); the result does not
    depend on the input partitioning, only phase-1's load spreading
    does."""
    from pyspark.sql import Window

    if not quotas:
        # an empty quota map means every stratum has quota 0 — return the
        # typed empty frame instead of letting F.create_map() build a
        # VOID-typed map that detonates at analysis (found by the
        # hypothesis equivalence property)
        return df.filter(F.lit(False))
    quota_map = F.create_map(
        *[x for s, q in quotas.items() for x in (F.lit(s), F.lit(int(q)))]
    )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    stratum_quota = F.coalesce(quota_map[F.col(strata_col)], F.lit(0))
    if two_phase:
        wl = Window.partitionBy(F.spark_partition_id(), strata_col).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("__quota_lrk", F.row_number().over(wl))
            .filter(F.col("__quota_lrk") <= stratum_quota)
            .drop("__quota_lrk")
        )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__quota_rk", F.row_number().over(w))
        .filter(F.col("__quota_rk") <= stratum_quota)
        .drop("__quota_rk")
    )


#: the token-budget carve salt — a SIXTH independent hash decision (see
#: MIX_SALT): token-budget membership must not correlate with the doc-count
#: quota, the mix keep, the epoch coin, the holdout or the cluster split.
TOKQUOTA_SALT = ":tokq"


def sample_token_quota(
    df: DataFrame,
    budgets: dict[str, int],
    n_toks_col: str = "n_toks",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = TOKQUOTA_SALT,
    two_phase: bool = False,
) -> DataFrame:
    """Per-stratum TOKEN-budget sampling — the unit a pretraining mixture
    is actually specified in ("30 B tokens of code, 5 B of es"), where
    :func:`sample_quota`'s doc counts cannot serve: documents vary 100×
    in length, so a doc quota's token mass is whatever it happens to be.
    Keeps each stratum's docs in ':tokq'-salted-hash order while the
    EXCLUSIVE running token total is below the budget — so the budget is
    filled greedily and the crossing document is the last one kept
    (guaranteeing ≥1 doc per non-empty stratum with a positive budget,
    and overshoot bounded by one document). Deterministic, portable,
    resumable: the kept set is a hash-prefix of the stratum, so growing
    the corpus can displace docs but never reorder the prefix rule.
    Strata without a budget entry get budget 0 and are dropped loudly,
    mirroring mix_keep/sample_quota.

    Scale shape: one window per stratum over a PRUNED (stratum, hash,
    id, n_toks) projection. ``two_phase=True`` spreads a dominant
    stratum: phase 1 keeps each (input partition, stratum)'s LOCAL
    budget-prefix — sound because a doc's local exclusive cumsum never
    exceeds its global one, so the global prefix survives phase 1 — and
    phase 2 re-ranks survivors only. Any candidate whose true
    predecessors include a phase-1 casualty necessarily sees ≥ budget
    candidate-token mass ahead of it (the casualty's own partition
    already contributed a full budget of candidates), so phase 2 drops
    it exactly as the single-window form would: the two forms return
    IDENTICAL rows (pinned in tests)."""
    from pyspark.sql import Window

    if not budgets:
        return df.filter(F.lit(False))
    budget_map = F.create_map(
        *[x for s, b in budgets.items() for x in (F.lit(s), F.lit(int(b)))]
    )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    stratum_budget = F.coalesce(
        budget_map[F.col(strata_col)], F.lit(0)
    ).cast("long")
    toks = F.col(n_toks_col).cast("long")
    if two_phase:
        wl = (
            Window.partitionBy(F.spark_partition_id(), strata_col)
            .orderBy(h.asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        df = df.withColumn(
            "__tq_lcum", F.coalesce(F.sum(toks).over(wl), F.lit(0))
        ).filter(F.col("__tq_lcum") < stratum_budget).drop("__tq_lcum")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn(
            "__tq_cum", F.coalesce(F.sum(toks).over(w), F.lit(0))
        )
        .filter(F.col("__tq_cum") < stratum_budget)
        .drop("__tq_cum")
    )


def _spread_partitions(df: DataFrame) -> int:
    """Default partition count for the spread forms' explicit range
    exchange (r13). The count must stay EXPLICIT — both consumers of the
    shared exchange must observe one immutable layout, so AQE coalescing
    is off the table for these plans — but the old default
    (``spark.sql.shuffle.partitions`` verbatim) made sense only when that
    conf is data-scaled: on a plain 200-partition session every spread
    invocation paid 200 tasks per stage even for kilobyte relations
    (measured r13: corpus_composition = 4,740 tasks at sf0.01 under the
    grading driver's default session). The spread relations are pruned
    (id, score, strata) triples, so per-core parallelism is the floor
    that matters locally, while on a size-tuned cluster session the
    operator's shuffle conf stays the ceiling:

        min(spark.sql.shuffle.partitions, max(2 × defaultParallelism, 16))

    — scale-adaptive both ways: a 200-partition local[8] session drops to
    16-wide exchanges; a production session whose shuffle conf is sized
    to the data (guide §2.2) keeps it. Callers needing a specific layout
    pass ``partitions`` explicitly, as before."""
    sess = df.sparkSession
    conf_parts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    cores = sess.sparkContext.defaultParallelism
    return max(1, min(conf_parts, max(2 * cores, 16)))


def _spread_ranked(
    df: DataFrame,
    score_col: str,
    ascending: bool,
    strata_col: str | None,
    id_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Exact per-stratum rank WITHOUT a single-task stratum sort — the
    distributed-selection core the ``spread=True`` percentile operators
    share. Returns the PRUNED relation (strata?, id, score, __rank, __n):
    ``__rank`` is row_number under (score asc|desc nulls-per-Spark, id
    asc) within the stratum, ``__n`` the stratum size — bit-identical to
    what ``Window.partitionBy(stratum)`` would produce, built from plans
    that spread a dominant stratum over every task:

    1. range-partition the pruned (stratum, score, id) triples on the
       FULL sort key — a dominant stratum spans many contiguous range
       partitions instead of hashing into one;
    2. count rows per (range partition, stratum) — a map-side-combined
       agg whose output is ≤ partitions × strata rows;
    3. prefix-sum those counts per stratum in partition order (a window
       over the TINY counts relation) → each range partition's starting
       offset within its stratum, plus the stratum total;
    4. broadcast the offsets back and add each row's partition-LOCAL
       rank (a window keyed (partition, stratum) — balanced by
       construction, since range partitions are size-balanced by the
       sampler) to its partition offset.

    Global rank = offset + local rank is exact because range partition i
    holds exactly the sort-order predecessors of partition i+1.
    Correctness REQUIRES the counts branch and the ranked branch to
    observe identical range boundaries — guaranteed because both
    consumers share one canonical exchange that Spark's exchange-reuse
    cache materializes exactly once. RangePartitioning's boundary
    sampler is NOT instance-independent (its seed varies per execution),
    so with ``spark.sql.exchange.reuse=false`` two materializations
    could disagree and produce silently wrong global ranks; the
    constructor therefore REFUSES to build the plan when reuse is
    disabled (fail-loud beats silent corruption). ``partitions``
    defaults to :func:`_spread_partitions` (scale-adaptive, r13); the
    explicit partition count also keeps AQE from re-coalescing the range
    exchange under a different layout per consumer. NULL group values are first-class:
    the offsets join back through eqNullSafe compares, so a NULL
    stratum ranks exactly as the window form's NULL partition would
    (a bare name-list join would silently drop those rows)."""
    _require_exchange_reuse(df, "_spread_ranked")
    sc_ = F.col(score_col)
    order = [sc_.asc() if ascending else sc_.desc(), F.col(id_col).asc()]
    grp = [strata_col] if strata_col is not None else []
    pruned = df.select(*grp, id_col, score_col)
    n_parts = int(partitions) if partitions is not None else _spread_partitions(df)
    strata_exprs = [F.col(c) for c in grp]
    rp = pruned.repartitionByRange(n_parts, *strata_exprs, *order)
    withpid = rp.withColumn("__pid", F.spark_partition_id())
    counts = withpid.groupBy("__pid", *grp).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    woff = (
        Window.partitionBy(*grp)
        .orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "__pid",
        *grp,
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(Window.partitionBy(*grp)).alias("__n"),
    )
    wloc = Window.partitionBy("__pid", *grp).orderBy(*order)
    return (
        _join_back_nullsafe(withpid, offs, grp)
        .withColumn("__rank", F.row_number().over(wloc) + F.col("__off"))
        .select(*grp, id_col, score_col, "__rank", "__n")
    )


def _require_exchange_reuse(df: DataFrame, op: str) -> None:
    """The spread forms' two consumers of one range exchange MUST see one
    materialization (module functions' docstrings) — refuse to compose a
    silently-rank-corrupting plan when the cache is off."""
    reuse = str(
        df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
    ).lower()
    if reuse != "true":
        raise ValueError(
            f"{op}: spark.sql.exchange.reuse is disabled — the counts and "
            f"ranked branches would each re-sample range boundaries and "
            f"can disagree, corrupting global ranks silently; re-enable "
            f"exchange reuse (the Spark default) to use spread=True"
        )


def _join_back_nullsafe(
    withpid: DataFrame, offs: DataFrame, grp: list[str]
) -> DataFrame:
    """Broadcast-join per-partition offsets back onto the range-partitioned
    rows on (__pid, *grp) with NULL-SAFE group compares. A name-list join
    compiles to plain EqualTo, which never matches NULL keys — rows in a
    NULL stratum would silently vanish from the ranked relation (the one
    place the window form and the spread form could diverge). The offs
    side's key columns are renamed before the join and dropped after, so
    the output schema is exactly the name-list join's."""
    offs_r = offs.select(
        F.col("__pid").alias("__o_pid"),
        *[F.col(c).alias(f"__o_g{i}") for i, c in enumerate(grp)],
        *[c for c in offs.columns if c != "__pid" and c not in grp],
    )
    cond = F.col("__pid") == F.col("__o_pid")
    for i, c in enumerate(grp):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__o_g{i}"))
    return withpid.join(F.broadcast(offs_r), on=cond).drop(
        "__o_pid", *[f"__o_g{i}" for i in range(len(grp))]
    )


def _spread_prefix(
    df: DataFrame,
    weight_col: str | list[str],
    order: list[Column],
    grp: list[str],
    partitions: int | None = None,
    out_col: str | list[str] = "__prefix",
) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum — `_spread_ranked`'s sibling for
    running-total operators (token packing): appends ``out_col`` = the
    sum of ``weight_col`` over all rows strictly BEFORE this one in the
    per-group ``order``, bit-identical to the single-window form for
    integer weights (long addition is association-free; float weights
    would expose summation-order ulps and are not used here), with no
    single-task group stage:

    range-partition on (group, order) → per-(partition, group) weight
    totals (tiny, map-side combined) → per-group exclusive prefix of
    those totals in partition order (window over the tiny relation) →
    broadcast offsets back, local exclusive cumsum + offset. The FULL
    row set rides the two exchanges (range + the window's (partition,
    group) hash) — the price of spreading vs the window form's one
    exchange into one-task-per-group; at corpus scale the second
    balanced exchange is cheap and the single task is the wall.

    Same two invariants as `_spread_ranked`: the offsets join back
    null-safely (a NULL group value accumulates its own prefix instead
    of silently dropping), and composition refuses when
    spark.sql.exchange.reuse is off (the sums and cumsum branches must
    observe one boundary sample).

    ``weight_col``/``out_col`` also accept equal-length LISTS: all the
    running totals then ride ONE range exchange and one offsets
    broadcast instead of re-partitioning per weight — the form
    `threshold_sweep` uses for its tp/fp cumulative pair."""
    _require_exchange_reuse(df, "_spread_prefix")
    weights = [weight_col] if isinstance(weight_col, str) else list(weight_col)
    outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if not weights or len(weights) != len(outs):
        raise ValueError(
            f"_spread_prefix: need >=1 weight column with matching out "
            f"columns, got {len(weights)} weights / {len(outs)} outs"
        )
    n_parts = int(partitions) if partitions is not None else _spread_partitions(df)
    grp_exprs = [F.col(c) for c in grp]
    rp = df.repartitionByRange(n_parts, *grp_exprs, *order)
    withpid = rp.withColumn("__pid", F.spark_partition_id())
    sums = withpid.groupBy("__pid", *grp).agg(
        *[F.sum(w).alias(f"__wsum{i}") for i, w in enumerate(weights)]
    )
    woff = (
        Window.partitionBy(*grp)
        .orderBy(F.col("__pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sums.select(
        "__pid",
        *grp,
        *[
            F.coalesce(F.sum(f"__wsum{i}").over(woff), F.lit(0)).alias(
                f"__woff{i}"
            )
            for i in range(len(weights))
        ],
    )
    wloc = (
        Window.partitionBy("__pid", *grp)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = _join_back_nullsafe(withpid, offs, grp)
    for i, (w, o) in enumerate(zip(weights, outs)):
        joined = joined.withColumn(
            o,
            F.coalesce(F.sum(w).over(wloc), F.lit(0))
            + F.col(f"__woff{i}"),
        )
    # the name-keyed join moved the keys to the front — restore the
    # caller's column order (an observable schema for positional
    # consumers), appending only the out columns
    return joined.select(*df.columns, *outs)


def _rank_le_boundary(
    score: Column, id_: Column, b_score: Column, b_id: Column, ascending: bool
) -> Column:
    """score-then-id composite "sorts at or before the boundary row",
    replicating Spark's window order null placement exactly (asc = nulls
    FIRST, desc = nulls LAST) so the boundary-compare gate and the
    window-rank gate keep identical rows even on null scores."""
    both = score.isNotNull() & b_score.isNotNull()
    if ascending:
        strictly = (score.isNull() & b_score.isNotNull()) | (
            both & (score < b_score)
        )
    else:
        strictly = (b_score.isNull() & score.isNotNull()) | (
            both & (score > b_score)
        )
    return strictly | (score.eqNullSafe(b_score) & (id_ <= b_id))


def _require_strata_or_optin(
    op: str, strata_col: str | None, spread: bool, allow_single_partition: bool
) -> None:
    """The fail-loud contract `pack_by_budget` established, extended to
    the percentile tier: a stratum-less WINDOW form funnels the whole
    corpus through ONE rank task."""
    if strata_col is None and not spread and not allow_single_partition:
        raise ValueError(
            f"{op}: strata_col=None with spread=False runs the rank window "
            f"in a SINGLE task over the whole dataset; pass strata_col, "
            f"spread=True (the distributed-rank form, which needs no "
            f"stratum to spread), or allow_single_partition=True for "
            f"corpora small enough to rank serially"
        )


def sample_top_fraction(
    df: DataFrame,
    score_col: str,
    keep_ppm: int,
    ascending: bool = True,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    spread: bool = False,
    allow_single_partition: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Keep EXACTLY floor(n · keep_ppm/1e6) best-scoring rows (per
    stratum when ``strata_col`` is set) — the data-dependent percentile
    gate a score threshold cannot express: "keep the most fluent 80% of
    each language" holds regardless of how the batch's score
    distribution drifts, where a fixed ``score ≤ cutoff`` keeps 50% of
    one crawl and 95% of the next. ``ascending=True`` keeps the LOWEST
    scores (the NLL/perplexity convention: low = fluent);
    ``ascending=False`` keeps the highest (classifier-probability
    convention). Deterministic: ties break on the stable id, and the
    kept count is an exact integer — no approximate percentile sketch,
    so re-runs and engines agree row for row.

    Two plan shapes, IDENTICAL rows (pinned in tests):

    ``spread=False`` — the window form: one pruned per-stratum window
    (rank + count share an exchange; the sort carries (stratum, score,
    id), never text). A dominant stratum single-tasks its sort — fine up
    to ~100 M rows/stratum of 16 B pairs, a wall past it — so the
    stratum-less variant must be opted into via
    ``allow_single_partition`` (`pack_by_budget`'s fail-loud contract).
    Note the keep count is ∝ n: candidate-pruning two-phase tricks
    (`sample_quota`) cannot bound this sort, which is why the scale form
    is a distributed RANK, not a pruned window.

    ``spread=True`` — the scale form (:func:`_spread_ranked`): exact
    ranks from a range-partitioned sort + per-partition offsets (no
    single-task stage anywhere, stratum optional), then the per-stratum
    BOUNDARY row (rank == floor(n·keep_ppm/1e6)) — one row per stratum —
    broadcasts back and the gate is a map-only composite compare on the
    full frame: the corpus itself never shuffles. Costs one extra
    derivation of the pruned triples (rank path) vs the window form;
    buys sort spreading and a shuffle-free gate. The eshuf/two-phase
    probes' template measures both regimes in tools/scale_probe.py."""
    if not (0 <= keep_ppm <= 1_000_000):
        raise ValueError(
            f"sample_top_fraction: keep_ppm={keep_ppm} outside [0, 1e6]"
        )
    _require_strata_or_optin(
        "sample_top_fraction", strata_col, spread, allow_single_partition
    )
    score = F.col(score_col)
    if spread:
        ranked = _spread_ranked(
            df, score_col, ascending, strata_col, id_col, partitions
        )
        k = F.floor(
            (F.col("__n") * F.lit(int(keep_ppm))) / F.lit(1_000_000)
        ).cast("long")
        bounds = ranked.filter(F.col("__rank") == k).select(
            *(
                [F.col(strata_col).alias("__tf_key")]
                if strata_col is not None
                else []
            ),
            F.col(score_col).alias("__tf_bscore"),
            F.col(id_col).alias("__tf_bid"),
        )
        cond = (
            F.col(strata_col).eqNullSafe(F.col("__tf_key"))
            if strata_col is not None
            else F.lit(True)
        )
        keep = _rank_le_boundary(
            score,
            F.col(id_col),
            F.col("__tf_bscore"),
            F.col("__tf_bid"),
            ascending,
        )
        # inner join: a stratum whose k = 0 has no boundary row and is
        # dropped whole — exactly the window form's rank ≤ 0 = nothing
        return (
            df.join(F.broadcast(bounds), on=cond, how="inner")
            .filter(keep)
            .drop("__tf_key", "__tf_bscore", "__tf_bid")
        )
    order = [score.asc() if ascending else score.desc(), F.col(id_col).asc()]
    if strata_col is not None:
        wrank = Window.partitionBy(strata_col).orderBy(*order)
        wall = Window.partitionBy(strata_col)
    else:
        wrank = Window.orderBy(*order)
        wall = Window.partitionBy()
    k = F.floor(
        (F.count(F.lit(1)).over(wall) * F.lit(int(keep_ppm)))
        / F.lit(1_000_000)
    ).cast("long")
    return (
        df.withColumn("__tf_rk", F.row_number().over(wrank))
        .withColumn("__tf_k", k)
        .filter(F.col("__tf_rk") <= F.col("__tf_k"))
        .drop("__tf_rk", "__tf_k")
    )


def score_buckets(
    df: DataFrame,
    score_col: str,
    cuts_ppm: tuple[int, ...] = (333_333, 666_666),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    ascending: bool = True,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    out_col: str = "score_bucket",
    spread: bool = False,
    allow_single_partition: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Label every row with its score-percentile bucket — CCNet's
    head/middle/tail split (per language when ``strata_col`` is set):
    rank rows by score (``ascending=True`` = best-first for NLL), bucket
    by exact integer percentile rank·1e6 DIV n against ``cuts_ppm``.
    Default thirds; any monotone cut list works (len(labels) =
    len(cuts_ppm)+1). Unlike a filter, ALL rows survive with a label —
    the form downstream mixture builders consume (e.g. upsample 'head',
    downsample 'tail' via `mix_epochs`/`sample_quota` keyed on the
    bucket). Deterministic (id tie-break), exact integers, no percentile
    sketch — two engines agree on every label.

    Two plan shapes, IDENTICAL labels (pinned in tests):

    ``spread=False`` — the `sample_top_fraction` window pair (rank +
    count over one partitioning) plus a CASE: one exchange keyed by the
    stratum, dominant stratum single-tasks its sort (and the stratum-less
    variant needs ``allow_single_partition``, the fail-loud contract).
    Candidate pruning can never help here — EVERY row keeps a label, so
    the scale fix is spreading the rank, not bounding it.

    ``spread=True`` — the scale form: exact ranks from
    :func:`_spread_ranked` (range-partitioned sort + offsets, no
    single-task stage, stratum optional), then ONE tiny per-stratum agg
    extracts the boundary (score, id) at each cut rank
    k_j = ((cut_j+1)·n − 1) DIV 1e6 — the last rank whose percentile ≤
    cut_j — and the label is a map-only CASE of composite compares
    against the broadcast boundaries: the corpus itself never shuffles.
    An empty bucket (k_j = 0, or two cuts collapsing to one rank on a
    tiny stratum) has a NULL/duplicate boundary and falls through to the
    next label, exactly as the window form's first-when-wins CASE does."""
    if len(labels) != len(cuts_ppm) + 1:
        raise ValueError(
            f"score_buckets: {len(labels)} labels need "
            f"{len(labels) - 1} cuts, got {len(cuts_ppm)}"
        )
    if any(b <= a for a, b in zip(cuts_ppm, cuts_ppm[1:])) or not all(
        0 < c < 1_000_000 for c in cuts_ppm
    ):
        # ties would silently shadow a label (the earlier when() wins),
        # so cuts must STRICTLY increase
        raise ValueError(
            f"score_buckets: cuts_ppm={cuts_ppm} must be strictly "
            f"inside (0, 1e6) and strictly increasing"
        )
    _require_strata_or_optin(
        "score_buckets", strata_col, spread, allow_single_partition
    )
    score = F.col(score_col)
    if spread:
        ranked = _spread_ranked(
            df, score_col, ascending, strata_col, id_col, partitions
        )
        # boundary rank per cut: (r·1e6) DIV n ≤ c  ⟺  r ≤ ((c+1)·n − 1)
        # DIV 1e6 — exact long algebra ((c+1)·n ≤ 1e6·9.2e12 fits int64).
        # One map-side-combined agg: ≤ #strata rows out, each carrying
        # len(cuts) boundary structs (max of ≤1 matching struct per cut)
        bnd_aggs = [
            F.max(
                F.when(
                    F.col("__rank")
                    == F.expr(
                        f"(({int(cut)} + 1) * __n - 1) DIV 1000000"
                    ).cast("long"),
                    F.struct(
                        F.col(score_col).alias("s"), F.col(id_col).alias("i")
                    ),
                )
            ).alias(f"__sb_b{j}")
            for j, cut in enumerate(cuts_ppm)
        ]
        if strata_col is not None:
            bounds = ranked.groupBy(
                F.col(strata_col).alias("__sb_key")
            ).agg(*bnd_aggs)
            cond = F.col(strata_col).eqNullSafe(F.col("__sb_key"))
        else:
            bounds = ranked.groupBy().agg(*bnd_aggs)
            cond = F.lit(True)
        bucket = None
        for j, label in zip(range(len(cuts_ppm)), labels):
            b = F.col(f"__sb_b{j}")
            in_bucket = b.isNotNull() & _rank_le_boundary(
                score, F.col(id_col), b["s"], b["i"], ascending
            )
            bucket = (
                F.when(in_bucket, label)
                if bucket is None
                else bucket.when(in_bucket, label)
            )
        bucket = bucket.otherwise(labels[-1])
        drop_cols = [f"__sb_b{j}" for j in range(len(cuts_ppm))] + (
            ["__sb_key"] if strata_col is not None else []
        )
        # left join: bounds has one row per stratum by construction (it
        # aggregates the total ranked relation), so this is effectively
        # inner; left keeps the contract "ALL rows survive with a label"
        # robust even for a pathological empty-bounds corner
        return (
            df.join(F.broadcast(bounds), on=cond, how="left")
            .withColumn(out_col, bucket)
            .drop(*drop_cols)
        )
    order = [score.asc() if ascending else score.desc(), F.col(id_col).asc()]
    if strata_col is not None:
        wrank = Window.partitionBy(strata_col).orderBy(*order)
        wall = Window.partitionBy(strata_col)
    else:
        wrank = Window.orderBy(*order)
        wall = Window.partitionBy()
    # rank is a 32-bit int: the ×1e6 product overflows at rank ≥ 2148
    # without the BIGINT cast (ANSI crash / silent head-mislabeling)
    pct = F.expr(
        "(CAST(__sb_rk AS BIGINT) * 1000000) DIV __sb_n"
    )
    bucket = None
    for cut, label in zip(cuts_ppm, labels):
        cond = pct <= F.lit(int(cut))
        bucket = (
            F.when(cond, label) if bucket is None else bucket.when(cond, label)
        )
    bucket = bucket.otherwise(labels[-1])
    return (
        df.withColumn("__sb_rk", F.row_number().over(wrank))
        .withColumn("__sb_n", F.count(F.lit(1)).over(wall))
        .withColumn(out_col, bucket)
        .drop("__sb_rk", "__sb_n")
    )


#: the per-epoch training-order salt — a SEVENTH independent hash
#: decision (see MIX_SALT): the epoch permutation must not correlate
#: with any keep/drop/split decision, or "docs that survived the mix"
#: would cluster at one end of the training order.
EPOCH_SHUFFLE_SALT = ":eshuf"

#: the hash-prefix width the epoch shuffle orders and shards by — 16⁶
#: distinct values; shard assignment divides this space evenly.
_ESHUF_SPACE = 16**6


def epoch_shuffle_key(
    id_col: Column | str = "doc_id",
    epoch: int = 0,
    salt: str = EPOCH_SHUFFLE_SALT,
) -> Column:
    """The deterministic per-epoch global shuffle key: md5(id ‖ ':eshuf'
    ‖ epoch). Ordering a corpus by (this, id) IS the epoch's training
    permutation — uniform (so any contiguous slice is an unbiased
    sample), reproducible on any engine/cluster/retry, and DIFFERENT
    per epoch (the epoch number is inside the hash, so consecutive
    epochs are independent permutations — the convergence property
    epoch shuffling exists for)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(c.cast("string"), F.lit(salt), F.lit(str(int(epoch)))))


def epoch_shard(
    id_col: Column | str = "doc_id",
    epoch: int = 0,
    n_shards: int = 64,
    salt: str = EPOCH_SHUFFLE_SALT,
) -> Column:
    """Which of ``n_shards`` output shards a document belongs to in the
    epoch's global order: the first 6 hex digits of the shuffle key,
    scaled — shard = v·n_shards DIV 16⁶ — so shard boundaries are FIXED
    hash ranges (deterministic regardless of data, unlike
    repartitionByRange's sampled boundaries) and every shard receives a
    contiguous slice of the permutation: shard i's rows ALL precede
    shard i+1's, which is what lets a trainer stream shard directories
    in name order and read the exact global permutation."""
    if n_shards < 1:
        raise ValueError(f"epoch_shard: n_shards={n_shards} must be >= 1")
    if n_shards > _ESHUF_SPACE:
        raise ValueError(
            f"epoch_shard: n_shards={n_shards} exceeds the 16^6 hash-prefix "
            f"space — shards would be empty by construction"
        )
    v = F.conv(
        F.substring(epoch_shuffle_key(id_col, epoch, salt), 1, 6), 16, 10
    ).cast("long")
    # 16^6 = 2^24: dividing by a power of two is EXACT in IEEE doubles,
    # so floor(double /) here equals integer DIV on every engine
    return F.floor(
        (v * F.lit(int(n_shards))) / F.lit(_ESHUF_SPACE)
    ).cast("long")


def shuffle_epoch(
    df: DataFrame,
    epoch: int = 0,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = EPOCH_SHUFFLE_SALT,
) -> DataFrame:
    """Attach the epoch's training order: ``eshard`` (zero-padded string,
    hive-partition-friendly) + ``ekey`` (the full shuffle key), with the
    frame hash-partitioned on eshard and locally sorted by (ekey, id).
    The epoch's GLOBAL permutation is (eshard asc, ekey asc, id asc) —
    materialized with NO global sort: shard assignment is a fixed hash
    range (so no range-boundary sampling job either), the per-shard sort
    is partition-local, and re-runs/retries reproduce it bit for bit.
    Export through `export_epoch` to get one directory per shard that a
    trainer streams in name order.

    Scale shape: one hash-partition exchange on eshard + a local sort —
    the same cost as any bucketed write; shard sizes are balanced by the
    uniform key (±binomial noise), never by a hot data key, so there is
    no skew to mitigate by construction."""
    pad = len(str(max(n_shards - 1, 0)))
    out = df.withColumn(
        "eshard",
        F.lpad(
            epoch_shard(id_col, epoch, n_shards, salt).cast("string"),
            pad,
            "0",
        ),
    ).withColumn("ekey", epoch_shuffle_key(id_col, epoch, salt))
    return out.repartition(n_shards, "eshard").sortWithinPartitions(
        "eshard", "ekey", id_col
    )


def export_epoch(
    df: DataFrame,
    path: str,
    epoch: int = 0,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> None:
    """Write one epoch's deterministically-shuffled corpus: hive layout
    ``eshard=<k>/`` with rows in (ekey, id) order inside each shard —
    the trainer contract: reading shard directories in name order yields
    the epoch's exact global permutation, identical on every re-run.
    Uses the sinks family's indexed writer (local-path contract, sorted
    row groups)."""
    from beeper_matric_etl_tool_spark.sinks import write_indexed

    shuffled = shuffle_epoch(df, epoch=epoch, n_shards=n_shards, id_col=id_col)
    write_indexed(
        shuffled,
        path,
        partition_by=("eshard",),
        sort_within=(F.col("ekey"), F.col(id_col)),
    )


#: the cluster-level holdout salt — a FIFTH independent hash decision
#: (see MIX_SALT): the leakage-safe split keys off the near-dup CLUSTER
#: id, and must be independent of the per-doc holdout (unsalted), the
#: mix keep, the epoch coin and the quota rank, or holding out "every
#: cluster whose hash starts 0/1" would correlate with the docs those
#: decisions already singled out.
CLUSTER_SPLIT_SALT = ":splitc"


def cluster_split(
    cluster_col: Column | str = "cluster_id",
    salt: str = CLUSTER_SPLIT_SALT,
    val_digits: tuple[str, ...] = ("0", "1"),
) -> Column:
    """'train'/'val' keyed on the salted md5 of the near-dup CLUSTER id —
    the leakage-safe form of the per-doc holdout: two near-duplicate
    documents hash to the SAME cluster, so they land in the SAME split,
    and a val document can never have a train-side near-twin (the classic
    eval-contamination leak the per-doc hash cannot prevent). val_digits
    over the first hex char sets the val fraction in 1/16 steps (default
    2/16 = 12.5%, matching the per-doc holdout's fraction)."""
    c = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    bucket = F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 1)
    return F.when(bucket.isin(*val_digits), "val").otherwise("train")


def split_by_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    salt: str = CLUSTER_SPLIT_SALT,
    val_digits: tuple[str, ...] = ("0", "1"),
) -> DataFrame:
    """Attach ``cluster_id`` and the leakage-safe ``split`` to ``docs``
    by joining the connected-components labeling (`ext/dedup.py:
    dedup_clusters` output, or any (id, cluster) relation) and hashing
    the CLUSTER id (:func:`cluster_split`). Docs absent from ``clusters``
    are treated as singletons (cluster_id = own id) — components
    labelings are total over their input, so absence means the doc was
    never near-dup-analyzed, and a singleton label is the decision the
    labeling would have made. Scale shape: one equi-join on the id key
    (both sides key-partitioned, AQE picks the strategy; the clusters
    side is two longs per doc), then pure column algebra — no extra
    shuffle beyond the join."""
    lab = clusters.select(
        F.col(id_col),
        F.col(cluster_col).alias("__cs_cluster"),
    )
    # the singleton fallback casts the id to long (components labelings
    # emit long cluster ids) — a non-numeric string id would cast to
    # NULL and silently route every unlabeled doc to 'train' (NULL hash
    # → otherwise branch), so the cast failure raises instead
    own = F.col(id_col).cast("long")
    fallback = F.when(
        F.col(id_col).isNotNull() & own.isNull(),
        F.raise_error(
            F.lit(
                "split_by_cluster: id_col is not castable to long — the "
                "singleton fallback needs numeric ids to stand in as "
                "cluster ids; pre-map string ids or provide a total "
                "clusters relation"
            )
        ).cast("long"),
    ).otherwise(own)
    return (
        docs.join(lab, on=id_col, how="left")
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("__cs_cluster"), fallback),
        )
        .drop("__cs_cluster")
        .withColumn(
            "split",
            cluster_split("cluster_id", salt=salt, val_digits=val_digits),
        )
    )


def pack_by_budget(
    df: DataFrame,
    token_col: str,
    budget: int = 2048,
    partition_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
    shuffle: bool = True,
    allow_single_partition: bool = False,
    spread: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed token-budget bins via an exclusive running
    sum — every row's ``pack_id`` is a pure function of the ordered prefix,
    so packing is deterministic and resumable (the `doc_packing` catalog
    mechanism, generalized).

    ``shuffle=True`` orders by md5(id) instead of id: the deterministic
    pseudo-random GLOBAL order a pretraining export needs — consecutive
    ids (which correlate with crawl time / source) land in different
    packs, with no engine RNG and no reshuffle on resume. The hash is
    order-key only; ties are impossible (ids are unique) so the total
    order, and therefore every pack assignment, is exact. The hash is
    SALTED (':pack') for the same reason the mix hash is (MIX_SALT): the
    unsalted md5(id) order would sort every holdout-val document (the
    '0'/'1' prefix range of the SAME hash) into the first ~1/8 of packs.

    An EMPTY ``partition_cols`` funnels the whole dataset through ONE
    window task (Spark's single-partition Window path) — fine for a toy
    corpus, a wall at scale — so it must be opted into explicitly via
    ``allow_single_partition`` (the same fail-loud contract as
    ``jaccard_pairs``' ``allow_full_scan``). Even WITH partition_cols,
    a dominant source runs its cumsum in one task; ``spread=True`` is
    the scale form (:func:`_spread_prefix`): the same pack assignments
    (pinned in tests — integer token weights make the split-and-offset
    sums exact) from a range-partitioned local cumsum + broadcast
    per-partition offsets, no single-task stage with or without
    partition_cols. The hash ORDER is unchanged, so spread is a plan
    choice, never a semantics choice."""
    if not partition_cols and not allow_single_partition and not spread:
        raise ValueError(
            "pack_by_budget: empty partition_cols runs the prefix-sum window "
            "in a SINGLE task over the whole dataset; pass partition_cols "
            "(e.g. the source/language column), spread=True (the distributed "
            "prefix-sum form), or allow_single_partition=True "
            "for corpora small enough to pack serially"
        )
    order = (
        [
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(PACK_SALT))).asc(),
            F.col(id_col).asc(),
        ]
        if shuffle
        else [F.col(id_col).asc()]
    )
    if spread:
        out = _spread_prefix(
            df, token_col, order, list(partition_cols), partitions
        )
        return out.withColumn(
            "pack_id", F.floor(F.col("__prefix") / F.lit(budget)).cast("long")
        ).drop("__prefix")
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("pack_id", F.floor(prior / F.lit(budget)).cast("long"))


#: stage-audit columns curate() adds via select('*', ...) — an input frame
#: already carrying any of these would yield ambiguous-reference
#: AnalysisExceptions deep in the funnel, so the collision is rejected up
#: front with a clear error instead.
CURATE_RESERVED_COLUMNS = (
    "n_tokens", "ttr_ppm", "dup3_ppm", "stop_hits", "mean_len_x100",
    "dup_line_ppm", "dup_line_char_ppm", "dup_para_ppm", "dup_para_char_ppm",
    "top2gram_ppm", "symbol_ppm", "bullet_line_ppm", "ellipsis_line_ppm",
    "alpha_word_ppm",
    "len_ok", "ttr_ok", "rep_ok", "stop_ok", "avglen_ok",
    "rep_line_ok", "rep_para_ok", "top2_ok", "symbol_ok", "bullet_ok",
    "ellipsis_ok", "alpha_ok", "keep",
    "n_emails", "n_digit_runs", "n_tokens_packed", "pack_id",
    "n_span_tokens_removed", "nll_ppm", "n_boilerplate_paras_removed",
    "quality_prob", "dsir_score_ppm", "dup_window_ppm",
)


class CurationStages(dict):
    """The per-stage DataFrames of one :func:`curate` run — a plain
    ``dict[str, DataFrame]`` (full backward compatibility) plus the
    cleanup hook a long-lived driver needs: :meth:`release` unpersists
    every stage curate() pinned, so batch-after-batch curation doesn't
    accumulate MEMORY_AND_DISK cache entries until session end."""

    def __init__(self, stages: dict[str, DataFrame], persisted: list[DataFrame]):
        super().__init__(stages)
        self._persisted = persisted

    def release(self) -> None:
        """Unpersist every stage frame curate() persisted (idempotent)."""
        for df in self._persisted:
            df.unpersist()
        self._persisted = []

    def __enter__(self) -> "CurationStages":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def curate(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    mix_rates: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "lang",
    minhash_threshold: float = 0.7,
    semdedup_k: int = 8,
    semdedup_threshold_ppm: int = 950_000,
    pack_budget: int = 2048,
    pack_spread: bool = True,
    embedding_id_col: str = "vec_id",
    persist_intermediates: bool = True,
    reference_docs: DataFrame | None = None,
    reference_index: str | None = None,
    reference_exclude_batch: int | None = None,
    portable: bool = False,
    lang_col: str | None = "lang",
    boilerplate_min_docs: int | None = None,
    span_k: int | None = None,
    span_min_count: int = 2,
    span_keep_one: bool = True,
    max_dup_window_ppm: int | None = None,
    dup_window_k: int = 8,
    dup_window_min_count: int = 2,
    max_nll_ppm: int | None = None,
    nll_keep_ppm: int | None = None,
    nll_spread: bool = True,
    nll_lm_order: int = 1,
    nll_reference: DataFrame | None = None,
    normalize: bool = True,
    clf_weights: list[float] | None = None,
    clf_feature_stats: dict[str, tuple[float, float]] | None = None,
    clf_threshold: float = 0.5,
    dsir_target: DataFrame | None = None,
    dsir_min_score_ppm: int = 0,
    dsir_dim: int | None = None,
    checkpoint_stages: bool = False,
) -> "CurationStages":
    """Run the full curation funnel; returns the per-stage DataFrames:

    ``normalize=True`` (the default) first rewrites ``text_col`` through
    :func:`ext.text.normalize_text` — control-char strip, curly-quote/
    NBSP canonicalization, whitespace collapse — so byte-variant copies
    of one document share a content fingerprint and MinHash shingles.
    Without it, two documents differing only in an NBSP would survive
    BOTH dedup stages (the exact failure the canonicalizer exists to
    prevent). The stage is idempotent (pinned in tests), pure codegen
    column algebra, and zero-shuffle; pass ``normalize=False`` only for
    corpora already canonicalized upstream, where byte fidelity of the
    output text matters more than dedup strength. Every downstream
    stage — including the ``quality`` audit columns — sees the
    normalized text.

    - ``quality``:     docs + signal/verdict columns (audit surface)
    - ``scrubbed``:    quality survivors with ``text`` PII-scrubbed (+ audit
                       counts ``n_emails``/``n_digit_runs``)
    - ``classified``:  (only when ``clf_weights`` is set) the LEARNED
                       quality filter (`ext/classifier.py`) after the
                       heuristic gate — the CCNet/fastText-classifier
                       shape: score = sigmoid of the frozen weights over
                       the SAME signal battery the gate computed
                       (rescaled in place, standardized under
                       ``clf_feature_stats`` when given — pass the
                       training-time stats, never refit on the batch),
                       keep iff ≥ ``clf_threshold``; survivors carry
                       ``quality_prob``. Pure column algebra over
                       existing columns — no second tokenization, no
                       shuffle, nothing batch-dependent: the stage is
                       deterministic given (weights, stats)
    - ``deboilerplated``: (only when ``boilerplate_min_docs`` is set)
                       corpus-level boilerplate-PARAGRAPH removal
                       (`ext/text.py:remove_boilerplate_paragraphs`):
                       every paragraph appearing in >= that many
                       DISTINCT documents (site footers, license
                       blocks) is cut from every document, text
                       rebuilt in order, emptied docs dropped,
                       ``n_boilerplate_paras_removed`` audit column.
                       Runs BEFORE span removal (paragraph-level
                       before token-level cuts — a removed footer
                       should not first be shredded into hot spans)
                       and before the dedup fingerprints, for the same
                       reason the despan stage does
    - ``despanned``:   (only when ``span_k`` is set) corpus-level
                       duplicate-SPAN removal (`ext/text.py:
                       remove_duplicate_spans`, keep_one defaults True —
                       the Lee-et-al policy): every >=span_min_count-
                       occurrence k-token window cut except its
                       canonical copy, text rebuilt, emptied docs
                       dropped, ``n_span_tokens_removed`` audit column.
                       Runs BEFORE exact dedup on purpose: span removal
                       changes content fingerprints, and deduping the
                       cleaned text is what collapses templated docs
                       that differ only in their boilerplate
    - ``novel``:       (only when ``max_dup_window_ppm`` is set) the
                       duplicated-window-fraction DROP gate
                       (`ext/text.py:ngram_duplication_scores`): docs
                       whose corpus-wide duplicated k-token-window
                       fraction exceeds the ceiling are removed WHOLE —
                       the mostly-boilerplate-page filter, where the
                       despan stage would rewrite; sub-k docs carry no
                       signal and pass; ``dup_window_ppm`` audit column.
                       Runs after despan (scores reflect the cleaned
                       text) and before the fluency gates
    - ``fluent``:      (only when ``max_nll_ppm`` is set) unigram-LM
                       perplexity ceiling (`ext/search.py:
                       unigram_nll_scores` in its lazy_stats form — the
                       stage launches no jobs at composition): docs whose
                       mean token NLL exceeds the ceiling (gibberish,
                       OOV soup) drop; survivors carry ``nll_ppm``.
                       The model trains on the batch AFTER span removal
                       (so duplicated boilerplate cannot drag the
                       vocabulary distribution), or on ``nll_reference``
                       when given — the frozen-trusted-corpus mode whose
                       cutoff is batch-invariant. ``nll_keep_ppm``
                       (mutually exclusive) is the PERCENTILE form:
                       keep the most fluent fraction PER SOURCE
                       (:func:`sample_top_fraction` over the same
                       scores — CCNet's head-fraction selection, robust
                       to score-distribution drift across crawls).
                       ``nll_lm_order=2`` scores BOTH gate forms under
                       the interpolated bigram LM instead
                       (`ext/search.py:bigram_nll_scores`, lazy_stats
                       form): word order enters the score, so scrambled
                       or looped text with a fluent-looking token
                       MULTISET — invisible to the unigram model by
                       construction — gets caught
    - ``exact``:       after exact dedup (lowest id per content fingerprint)
    - ``near``:        after MinHash near-dup components (canonical only)
    - ``incremental``: after dropping exact/near duplicates of the
                       ALREADY-KEPT corpus — the per-snapshot mode of a
                       live pipeline. Reference forms (mutually
                       exclusive): ``reference_docs`` (raw corpus frame,
                       derived tables computed in-flight) or
                       ``reference_index`` (path to a persisted
                       `ext/dedup_index.py` index — the steady-state
                       mode: no reference-text scan, derivation config
                       read from the index's own _META.json). Identity
                       when neither is given. Runs after the
                       within-batch stages so the reference comparison
                       sees the smallest possible batch.
    - ``semantic``:    after SemDeDup (identity when ``embeddings`` is None)
    - ``dsir``:        (only when ``dsir_target`` is set) DSIR importance
                       resampling toward the trusted target corpus
                       (`ext/embed.py:importance_resample`): keep docs
                       scoring ≥ ``dsir_min_score_ppm`` under the hashed
                       bucket-distribution log-ratio weights; survivors
                       carry ``dsir_score_ppm``. Runs after every dedup
                       stage (duplicates would bias the batch's own
                       bucket distribution) and before the mix sampler
    - ``sampled``:     after source-mix sampling (identity when
                       ``mix_rates`` is None)
    - ``packed``:      final corpus with ``pack_id`` (hash-shuffled order,
                       per-source bins)

    All lazily composed — materialize only what you need. Stage kernels
    are the driver-oracled ones; see the module docstring.

    ``portable=True`` runs the near-dup and incremental stages on the md5
    hash family instead of xxhash64 — every dedup decision then
    reproducible by any engine with md5 (the oracle story; the
    `quality_filter` driver row replays this whole funnel in DuckDB SQL).
    ~2-3× the minhash cost, identical plan shape.

    ``lang_col`` (default ``"lang"``) keys the quality gate's stopword
    floor on each document's OWN language inventory (see
    :func:`quality_signal_columns`) — pass ``None`` for English-only
    scoring of a corpus without a language column (a named-but-missing
    column raises instead of silently penalizing non-English docs).

    The returned :class:`CurationStages` is a plain dict of stage frames
    plus ``release()`` (also a context manager) to unpersist what
    ``persist_intermediates=True`` pinned — call it when the batch is
    exported, or curate many batches inside ``with curate(...) as stages:``.

    ``checkpoint_stages=True`` (r13) truncates lineage at the stage
    frames downstream consumers re-derive — ``scrubbed`` (tokenize +
    signal battery + PII regex pass), ``near`` (the whole minhash/LSH/
    verify/components subtree) and, since r14, EVERY optional-stage
    output (deboilerplated/despanned/novel/fluent) — with a LAZY
    ``localCheckpoint``: no job runs at composition (the laziness
    contract holds), but a consumer that unions many stage frames gets
    a plan of small trees instead of eight copies of the full funnel.
    Measured r13 on the `quality_filter` suite (8 legs): Catalyst
    planning alone was ~2 min of DRIVER time at ANY data size
    (12.5k-line physical plan, 90 re-derived scans); with checkpointing
    the plan collapses and each stage's work executes once. The r14
    extension attacks the same cost at COMPOSITION time: Catalyst
    analysis runs eagerly per DataFrame op, so with despan/fluency
    stages enabled merely BUILDING the funnel burned ~36 s of driver
    time on re-embedded subtrees; with per-stage cuts it is ~1 s.
    Price: checkpointed partitions live on executors and their lineage
    is gone, so a lost executor fails the query instead of recomputing
    (acceptable for a query-sized funnel; leave False for fault-critical
    long pipelines). When set, ``persist_intermediates`` is ignored for
    the checkpointed frames (the checkpoint already pins its RDD).
    """
    reserved = [c for c in docs.columns if c in CURATE_RESERVED_COLUMNS]
    if reserved:
        raise ValueError(
            f"curate: input columns {reserved} collide with the stage-audit "
            f"columns the funnel adds ({', '.join(CURATE_RESERVED_COLUMNS)}); "
            f"rename them before curating"
        )
    if lang_col is not None and lang_col not in docs.columns:
        raise ValueError(
            f"curate: lang_col={lang_col!r} is not an input column — the "
            f"quality gate's stopword floor is scored per-language (see "
            f"quality_signal_columns); pass lang_col=None for English-only "
            f"scoring of a lang-less corpus"
        )
    # pure argument validation lives BEFORE any stage is composed: raising
    # after persist() marks would leak pinned cache-manager entries with
    # no release handle (the CurationStages is never returned)
    if max_nll_ppm is not None and nll_keep_ppm is not None:
        raise ValueError(
            "curate: pass max_nll_ppm (fixed cutoff) OR nll_keep_ppm "
            "(per-source percentile — the CCNet head-fraction form), "
            "not both: two fluency gates in sequence would make the "
            "realized keep rate depend on their interaction"
        )
    if max_dup_window_ppm is not None:
        # the gate's operator validates k/min_count too, but it composes
        # AFTER persist marks — the fail-before-persist contract wants
        # these raises up here with the other pure argument validation
        if not 0 <= max_dup_window_ppm <= 1_000_000:
            raise ValueError(
                f"curate: max_dup_window_ppm={max_dup_window_ppm} is not a "
                f"ppm fraction in [0, 1e6]"
            )
        if dup_window_k < 2 or dup_window_min_count < 2:
            raise ValueError(
                f"curate: dup_window_k={dup_window_k} / "
                f"dup_window_min_count={dup_window_min_count} — both must "
                f"be >= 2 (at 1 every token/window is 'duplicated')"
            )
    if nll_lm_order not in (1, 2):
        raise ValueError(
            f"curate: nll_lm_order={nll_lm_order} — the fluency gate "
            f"scores under the unigram (1) or interpolated bigram (2) LM"
        )
    if clf_weights is not None:
        from beeper_matric_etl_tool_spark.ext.classifier import (
            QUALITY_FEATURE_NAMES,
        )

        # shape checks belong HERE, with the other pure argument
        # validation — the classifier stage composes after
        # scrubbed.persist(), and raising past a persist mark would leak
        # a pinned cache-manager entry with no release handle
        if len(clf_weights) != len(QUALITY_FEATURE_NAMES) + 1:
            raise ValueError(
                f"curate: {len(clf_weights)} clf_weights for "
                f"{len(QUALITY_FEATURE_NAMES)} features — expected "
                f"intercept + one per feature "
                f"({', '.join(QUALITY_FEATURE_NAMES)})"
            )
        if clf_feature_stats is not None:
            missing = [
                c for c in QUALITY_FEATURE_NAMES if c not in clf_feature_stats
            ]
            if missing:
                raise ValueError(
                    f"curate: clf_feature_stats lacks {missing} — pass the "
                    f"stats dict feature_stats() returned at training time"
                )
    if normalize:
        from beeper_matric_etl_tool_spark.ext.text import normalize_text

        docs = docs.withColumn(text_col, normalize_text(text_col))
    signals = quality_signal_columns(text_col, lang_col=lang_col)
    quality = docs.select(
        "*", *[c.alias(name) for name, c in signals.items()]
    ).select("*", *[c.alias(name) for name, c in quality_verdict_columns().items()])

    pii = pii_columns(text_col)
    # persist `scrubbed`, the stage every downstream consumer re-derives
    # from: it carries the expensive part (one tokenization + regex pass),
    # and the dedup chain reads it four times (minhash signatures, shingle
    # verify, component corpus side, canonical semi-join). Downstream
    # frames recompute only cheap hashes/windows over the cached blocks.
    # persist() is lazy, so curate() launches no jobs; the default
    # MEMORY_AND_DISK level spills to executor disk under pressure and the
    # cache entry stays pinned until unpersist or session end — a
    # long-lived driver curating many batches should pass
    # persist_intermediates=False (or unpersist the stage frames) and
    # accept the recompute. (Persisting `exact` instead would be
    # marginally tighter but trips a Catalyst plan-normalization
    # NoSuchElementException on this quality+PII+window shape — cache the
    # stage below it.)
    scrub_order = [c for c in quality.columns if c != "keep"] + [
        "n_emails",
        "n_digit_runs",
    ]
    scrubbed = (
        quality.filter(F.col("keep"))
        .drop("keep")
        .select(
            "*",
            pii["scrubbed"].alias("__scrubbed"),
            pii["n_emails"].alias("n_emails"),
            pii["n_digit_runs"].alias("n_digit_runs"),
        )
        .drop(text_col)
        .withColumnRenamed("__scrubbed", text_col)
        # restore the input's column order — the drop+rename workaround
        # would otherwise move text_col to the end, an observable schema
        # change for positional consumers (union, table writers)
        .select(*scrub_order)
    )
    persisted: list[DataFrame] = []
    if checkpoint_stages:
        # lazy lineage cut: planning of every downstream leg starts from
        # this RDD scan; the subtree executes once, at the first action
        scrubbed = scrubbed.localCheckpoint(eager=False)
    elif persist_intermediates:
        scrubbed = scrubbed.persist()
        persisted.append(scrubbed)

    def _stage_cut(frame: DataFrame) -> DataFrame:
        # r14: under checkpoint_stages, cut lineage at EVERY optional-stage
        # output, not just scrubbed/near. Composing the funnel analyzes each
        # new frame EAGERLY (Catalyst analysis runs per DataFrame op), and
        # with despan/novel/fluent subtrees re-embedding their inputs the
        # analysis cost of the post-fluent stages grew super-linearly —
        # measured: 36 s of pure DRIVER time constructing a 6-row funnel
        # (span_k + bigram fluency), zero jobs. A lazy localCheckpoint
        # converts the frame to an RDD-scan leaf immediately, so every
        # downstream analysis starts shallow; the stage's subtree still
        # executes exactly once, at the first action. Same fault-tolerance
        # trade as the scrubbed/near cuts (docstring above).
        return frame.localCheckpoint(eager=False) if checkpoint_stages else frame

    opt_stages: dict[str, DataFrame] = {}
    dedup_input = scrubbed
    if clf_weights is not None:
        from beeper_matric_etl_tool_spark.ext.classifier import (
            predict_proba,
            quality_features_from_signals,
        )

        # the learned filter reads the SAME signal battery the heuristic
        # gate already computed (columns carried through `scrubbed`), so
        # this stage is pure column algebra over existing columns — no
        # second tokenization pass, no shuffle. Standardization happens
        # inline under the caller's frozen training-time stats
        # (clf_feature_stats); raw features when None (weights trained
        # raw). CCNet shape: heuristic gate first, learned filter second.
        feats = quality_features_from_signals()
        cols = list(feats)
        # shape validation happened in the argument block up top (before
        # any persist mark) — here the stats/weights are known well-formed
        if clf_feature_stats is not None:

            def _z(c: str) -> Column:
                mean, std = clf_feature_stats[c]
                if std <= 0.0:
                    return F.lit(0.0)
                return (feats[c] - F.lit(mean)) / F.lit(std)

            z_cols = {f"__clf_{c}": _z(c) for c in cols}
        else:
            z_cols = {f"__clf_{c}": feats[c] for c in cols}
        prob = predict_proba(clf_weights, [f"__clf_{c}" for c in cols])
        classified = (
            dedup_input.withColumns(z_cols)
            .withColumn("quality_prob", prob)
            .filter(F.col("quality_prob") >= F.lit(float(clf_threshold)))
            .drop(*z_cols.keys())
        )
        opt_stages["classified"] = classified
        dedup_input = classified
    if boilerplate_min_docs is not None:
        from beeper_matric_etl_tool_spark.ext.text import (
            remove_boilerplate_paragraphs,
        )

        boiler_out = remove_boilerplate_paragraphs(
            dedup_input,
            min_docs=boilerplate_min_docs,
            id_col=id_col,
            text_col=text_col,
        )
        replaced_b = dedup_input.drop(text_col).join(
            boiler_out.filter(F.length("cleaned_text") > 0).select(
                F.col(id_col),
                F.col("cleaned_text").alias(text_col),
                F.col("n_removed").alias("n_boilerplate_paras_removed"),
            ),
            on=id_col,
        )
        deboilerplated = replaced_b.select(
            *[c for c in dedup_input.columns], "n_boilerplate_paras_removed"
        )
        # persist for the same reason as the despan stage: the
        # paragraph-fingerprint shuffles feed every downstream stage and
        # the plan carries no window (the documented persist hazard does
        # not apply)
        deboilerplated = _stage_cut(deboilerplated)
        if not checkpoint_stages and persist_intermediates:
            deboilerplated = deboilerplated.persist()
            persisted.append(deboilerplated)
        opt_stages["deboilerplated"] = deboilerplated
        dedup_input = deboilerplated
    if span_k is not None:
        from beeper_matric_etl_tool_spark.ext.text import remove_duplicate_spans

        span_out = remove_duplicate_spans(
            dedup_input,
            k=span_k,
            min_count=span_min_count,
            keep_one=span_keep_one,
            id_col=id_col,
            text_col=text_col,
        )
        replaced = dedup_input.drop(text_col).join(
            span_out.filter(F.length("cleaned_text") > 0).select(
                F.col(id_col),
                F.col("cleaned_text").alias(text_col),
                F.col("n_removed").alias("n_span_tokens_removed"),
            ),
            on=id_col,
        )
        # restore the input column order (text back in place), audit last
        despanned = replaced.select(
            *[c for c in dedup_input.columns], "n_span_tokens_removed"
        )
        # persist: the span-removal subtree (two fingerprint shuffles +
        # rebuild) feeds every downstream stage; its plan carries no
        # window, so the documented quality+PII+window persist hazard
        # does not apply here
        despanned = _stage_cut(despanned)
        if not checkpoint_stages and persist_intermediates:
            despanned = despanned.persist()
            persisted.append(despanned)
        opt_stages["despanned"] = despanned
        dedup_input = despanned
    if max_dup_window_ppm is not None:
        from beeper_matric_etl_tool_spark.ext.text import (
            ngram_duplication_scores,
        )

        # the DROP form of window-level dedup (RefinedWeb/Dolma shape):
        # a page that is mostly copied-from-elsewhere is removed whole,
        # where the despan stage would surgically rewrite it — gate on
        # the corpus-wide duplicated-window fraction. Docs shorter than
        # k windows carry no signal (dup_window_ppm NULL) and pass.
        # Fully lazy (fingerprint aggs only — no eager collect), so the
        # funnel's zero-jobs composition contract holds.
        dup_scores = ngram_duplication_scores(
            dedup_input,
            k=dup_window_k,
            min_count=dup_window_min_count,
            id_col=id_col,
            text_col=text_col,
        )
        novel = dedup_input.join(
            dup_scores.filter(
                F.col("dup_ppm").isNull()
                | (F.col("dup_ppm") <= max_dup_window_ppm)
            ).select(F.col(id_col), F.col("dup_ppm").alias("dup_window_ppm")),
            on=id_col,
        ).select(*dedup_input.columns, "dup_window_ppm")
        novel = _stage_cut(novel)
        if not checkpoint_stages and persist_intermediates:
            novel = novel.persist()
            persisted.append(novel)
        opt_stages["novel"] = novel
        dedup_input = novel
    def _fluency_scores(frame: DataFrame) -> DataFrame:
        # the gate's LM, by nll_lm_order: 1 = unigram (token-frequency
        # fluency), 2 = Jelinek-Mercer interpolated bigram — word ORDER
        # enters the score, so scrambled/looped text the unigram model
        # loves scores badly (the reason CCNet-style gates use real LMs).
        # Both ride their lazy_stats plan forms: zero jobs at
        # composition, the funnel's contract. Evidence caveat: a doc
        # with <2 tokens (bigram) or 0 tokens (unigram) produces NO
        # score row. The quality gate's length floor removes such docs
        # from the RAW input, but despan/deboilerplate run after it and
        # REWRITE text — a doc cut down to 0-1 tokens re-enters that
        # class. Both gate forms therefore LEFT-join the scores and PASS
        # no-evidence docs (nll_ppm NULL), mirroring the dup_window
        # NULL-pass rule: absence of evidence never silently drops
        if nll_lm_order == 2:
            from beeper_matric_etl_tool_spark.ext.search import (
                bigram_nll_scores,
            )

            return bigram_nll_scores(
                frame,
                text_col=text_col,
                id_col=id_col,
                lazy_stats=True,
                reference=nll_reference,
            )
        from beeper_matric_etl_tool_spark.ext.search import unigram_nll_scores

        return unigram_nll_scores(
            frame,
            text_col=text_col,
            id_col=id_col,
            lazy_stats=True,
            reference=nll_reference,
        )

    if nll_keep_ppm is not None:
        # the PERCENTILE form of the fluency gate (CCNet keeps the most
        # fluent fraction per language, not a fixed-score head): rank by
        # the same LM score, keep the best nll_keep_ppm per source —
        # robust to score-distribution drift across crawls, where a
        # fixed cutoff keeps 50% of one batch and 95% of the next
        scores = _fluency_scores(dedup_input)
        scored = dedup_input.join(
            scores.select(F.col(id_col), F.col("score_ppm").alias("nll_ppm")),
            on=id_col,
            how="left",
        )
        # no-evidence docs (NULL nll_ppm) bypass the percentile gate and
        # rejoin unconditionally below — they must NOT enter the ranked
        # population (NULLs sort first under asc and would eat quota as
        # fake "most fluent" rows)
        no_evidence = scored.filter(F.col("nll_ppm").isNull())
        # nll_spread=True (default) ranks through the distributed
        # range-partition form — no single-task dominant-stratum sort
        # inside the flagship funnel (the round-7 scale gap); identical
        # rows either way (pinned in tests), still zero jobs at
        # composition (the range sampler runs at execution, not here).
        # Price: the pruned (source, nll, id) rank path re-derives the
        # LM scoring at execution — bounded by one extra pass over the
        # persisted dedup_input cache, never a second tokenize-from-disk
        fluent = sample_top_fraction(
            scored.filter(F.col("nll_ppm").isNotNull()),
            "nll_ppm",
            keep_ppm=nll_keep_ppm,
            ascending=True,  # low NLL = fluent
            strata_col=source_col,
            id_col=id_col,
            spread=nll_spread,
        ).unionByName(no_evidence)
        fluent = _stage_cut(fluent)
        opt_stages["fluent"] = fluent
        dedup_input = fluent
    if max_nll_ppm is not None:
        # nll_reference switches the LM to the frozen-reference mode
        # (CCNet shape: a trusted corpus scores the batch, so the cutoff
        # is batch-invariant); None self-scores the batch. LEFT join +
        # NULL-pass: a doc despanned below the LM's evidence floor has
        # no score row and passes with nll_ppm NULL (see _fluency_scores)
        scores = _fluency_scores(dedup_input)
        fluent = dedup_input.join(
            scores.select(
                F.col(id_col), F.col("score_ppm").alias("nll_ppm")
            ),
            on=id_col,
            how="left",
        ).filter(
            F.col("nll_ppm").isNull() | (F.col("nll_ppm") <= max_nll_ppm)
        )
        fluent = _stage_cut(fluent)
        opt_stages["fluent"] = fluent
        dedup_input = fluent

    exact = exact_dedup(dedup_input, text_col=text_col, id_col=id_col)

    near_pairs = near_dedup_minhash(
        exact, threshold=minhash_threshold, text_col=text_col, id_col=id_col,
        portable=portable,
    )
    # dedup_clusters returns only (id, cluster_id, is_canonical) — recover
    # the full rows by semi-joining the canonical ids back onto `exact`
    canonical = (
        dedup_clusters(exact.select(id_col), near_pairs, id_col=id_col)
        .filter(F.col("is_canonical"))
        .select(id_col)
    )
    near = exact.join(canonical, on=id_col, how="left_semi")
    if checkpoint_stages:
        # second lineage cut: every post-dedup stage (incremental/
        # semantic identity, mix sampling, packing) re-derives `near`,
        # whose plan carries the minhash/LSH/verify subtree
        near = near.localCheckpoint(eager=False)

    if reference_docs is not None and reference_index is not None:
        raise ValueError(
            "curate: pass reference_docs OR reference_index, not both — "
            "the index stores its own derivation config, which would "
            "silently override this call's (portable, threshold hashes)"
        )
    if reference_index is not None:
        from beeper_matric_etl_tool_spark.ext.dedup_index import dedup_against_index

        # config (num_hashes/bands/shingle_k/portable/columns) comes from
        # the index's _META.json — the steady-state per-snapshot mode:
        # reference text is never rescanned (see ext/dedup_index.py).
        # reference_exclude_batch is the streaming replay hook: a re-run
        # micro-batch hides its own half-committed index partition so its
        # decisions match the first attempt bit for bit
        incremental, _incr_dropped = dedup_against_index(
            near,
            docs.sparkSession,
            reference_index,
            threshold=minhash_threshold,
            exclude_batch=reference_exclude_batch,
        )
    elif reference_docs is not None:
        incremental, _incr_dropped = dedup_against_reference(
            near,
            reference_docs,
            threshold=minhash_threshold,
            text_col=text_col,
            id_col=id_col,
            portable=portable,
        )
    else:
        incremental = near

    if embeddings is not None:
        decisions, _edges = semantic_dedup(
            embeddings.join(
                incremental.select(F.col(id_col).alias(embedding_id_col)),
                on=embedding_id_col,
                how="left_semi",
            ),
            k=semdedup_k,
            threshold_ppm=semdedup_threshold_ppm,
            id_col=embedding_id_col,
        )
        # anti-join on the DROPPED ids: a doc with no embedding row has no
        # semantic evidence against it and must survive this stage
        semantic = incremental.join(
            decisions.filter(~F.col("keep")).select(
                F.col(embedding_id_col).alias(id_col)
            ),
            on=id_col,
            how="left_anti",
        )
    else:
        semantic = incremental

    if dsir_target is not None:
        # DSIR importance resampling toward the trusted target domain
        # (ext/embed.py) — runs AFTER every dedup stage (duplicates would
        # bias the batch's own bucket distribution) and BEFORE the mix
        # sampler (the mix shapes source proportions of the docs DSIR
        # already judged target-like). The source distribution is the
        # surviving batch itself — per the method, resampling is relative
        # to what this batch looks like; survivors carry dsir_score_ppm.
        from beeper_matric_etl_tool_spark.ext.embed import (
            DEFAULT_DIM,
            importance_resample,
        )

        dsir = importance_resample(
            semantic,
            dsir_target,
            text_col=text_col,
            dim=dsir_dim if dsir_dim is not None else DEFAULT_DIM,
            min_score_ppm=dsir_min_score_ppm,
            lazy=True,  # curate() launches no jobs — see the laziness contract
            id_col=id_col,
        )
        post_stages = {"dsir": dsir}
        mix_input = dsir
    else:
        post_stages = {}
        mix_input = semantic

    if mix_rates is not None:
        sampled = mix_input.filter(mix_keep(id_col, source_col, mix_rates))
    else:
        sampled = mix_input

    # pack_spread=True (default): the distributed prefix sum — a
    # dominant source no longer single-tasks its cumsum; identical
    # pack_ids either way (pinned in tests, and the quality_filter
    # driver row hashes them through this very path)
    packed = pack_by_budget(
        sampled.withColumn("n_tokens_packed", token_count(text_col)),
        token_col="n_tokens_packed",
        budget=pack_budget,
        partition_cols=(source_col,),
        id_col=id_col,
        spread=pack_spread,
    )

    return CurationStages(
        {
            "quality": quality,
            "scrubbed": scrubbed,
            **opt_stages,
            "exact": exact,
            "near": near,
            "incremental": incremental,
            "semantic": semantic,
            **post_stages,
            "sampled": sampled,
            "packed": packed,
        },
        persisted,
    )


def export_corpus(
    stages: dict[str, DataFrame],
    path: str,
    partition_by: tuple[str, ...] = ("lang",),
    sort_within: tuple | None = None,
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Materialize the curated corpus ONCE — the terminal action of the
    funnel — and collect the export audit as a side effect of that same
    job via ``df.observe`` (the zero-extra-jobs route the stage_report
    docstring describes): returns {'rows', 'total_tokens'} measured on
    exactly the rows written.

    Layout is the engine's index layout (sinks.write_indexed): hive
    partitions on ``partition_by`` (default the pack partition key, so a
    trainer reads one source/language without touching the rest) and rows
    sorted by ``sort_within``. The default sort is (pack_id, md5(id ||
    PACK_SALT), id) — the SAME total order pack_by_budget assigned packs
    with — so a pack's documents are contiguous in the row groups, in
    their salted shuffle order, and two exports of the same corpus are
    row-order-identical (sorting by pack_id alone would leave within-pack
    order to the shuffle, breaking byte-level rerun reproducibility)."""
    from pyspark.sql import Observation

    from beeper_matric_etl_tool_spark.sinks import write_indexed

    if sort_within is None:
        sort_within = (
            F.col("pack_id"),
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(PACK_SALT))),
            F.col(id_col),
        )
    obs = Observation("corpus_export")
    packed = stages["packed"].observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum("n_tokens_packed"), F.lit(0)).alias("total_tokens"),
    )
    write_indexed(packed, path, partition_by=partition_by, sort_within=sort_within)
    got = obs.get
    return {"rows": int(got["rows"]), "total_tokens": int(got["total_tokens"])}


def stage_report(
    stages: dict[str, DataFrame], single_pass: bool = False
) -> dict[str, int]:
    """Force the funnel counts — (stage → surviving rows). The ``quality``
    entry reports its keep-count so every number means 'rows flowing to
    the next stage'.

    Cost contract: the default form runs ONE Spark job per stage (N
    actions); each job re-executes its stage's lineage above curate()'s
    `scrubbed` cache. ``single_pass=True`` instead unions the stages'
    id-projections under a stage tag and counts them in ONE groupBy job —
    the scheduler launches once, and every stage's scan below the cache
    boundary is a cache read. At 100 TB prefer single_pass, or better:
    skip the dedicated report entirely and attach
    ``df.observe(Observation(...), F.count(F.lit(1)))`` to the one frame
    you are already materializing for export — survivor counts then cost
    zero extra jobs (the observe route can't audit EVERY stage in one
    action: mid-funnel stages feed multiple downstream consumers, and a
    CollectMetrics node above a multiply-scanned subtree double-counts).
    """
    if single_pass:
        parts = []
        for name, df in stages.items():
            if name == "quality":
                df = df.filter(F.col("keep"))
            parts.append(df.select(F.lit(name).alias("__stage")))
        unioned = parts[0]
        for p in parts[1:]:
            unioned = unioned.unionByName(p)
        counted = {
            r["__stage"]: r["n"]
            for r in unioned.groupBy("__stage").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # empty stages produce no group row — report the zero explicitly
        return {name: counted.get(name, 0) for name in stages}
    out: dict[str, int] = {}
    for name, df in stages.items():
        if name == "quality":
            out[name] = df.filter(F.col("keep")).count()
        else:
            out[name] = df.count()
    return out


def pack_first_fit_decreasing(
    df: DataFrame,
    token_col: str,
    budget: int = 2048,
    partition_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
    n_shards: int = 1,
    allow_single_partition: bool = False,
) -> DataFrame:
    """Bin-packing twin of :func:`pack_by_budget` for trainers that CAP
    sequences at the budget and pad the remainder: first-fit-decreasing
    — sort the group's documents by length descending, place each into
    the first bin with room — the classic 11/9·OPT-bounded heuristic
    that beats arrival-order first-fit exactly when small docs arrive
    before large ones (pinned in tests). `pack_by_budget` minimizes
    nothing and overflows bins (prefix-sum semantics, zero waste, packs
    can exceed budget); THIS packer never overflows (a doc longer than
    the budget gets a flagged singleton bin) and minimizes padding — the
    right choice when the training collator truncates at budget.

    Adds ``pack_key`` (string, unique per (partition values, shard,
    bin)) and ``pack_oversize`` (boolean singleton flag).

    Scale shape: FFD is inherently sequential, so each (partition_cols,
    shard) GROUP ships to one task via ``applyInPandas`` — the
    documented group-local escape hatch (`ext/grouped.py` policy), made
    safe by bounding group size: ``n_shards`` splits each partition
    group by a salted id-hash so a group holds ~|group|/n_shards rows
    regardless of source skew; size it so a shard's (id, token_count)
    rows fit one task comfortably (the shipped columns are pruned to
    id + count + keys — never text). Sharding costs packing quality
    only at shard boundaries (≤ one underfull bin per shard).

    The default ``partition_cols=()``/``n_shards=1`` would ship the
    ENTIRE corpus's (id, count) rows to ONE applyInPandas task, so —
    like :func:`pack_by_budget`'s identical hazard — it must be opted
    into explicitly via ``allow_single_partition=True`` (toy corpora
    only)."""
    if n_shards < 1:
        raise ValueError(f"pack_first_fit_decreasing: n_shards={n_shards} < 1")
    if not partition_cols and n_shards == 1 and not allow_single_partition:
        raise ValueError(
            "pack_first_fit_decreasing: empty partition_cols with n_shards=1 "
            "ships the whole dataset's (id, token_count) rows to a SINGLE "
            "applyInPandas task; pass partition_cols (e.g. the source/"
            "language column), n_shards > 1, or allow_single_partition=True "
            "for corpora small enough to pack serially"
        )
    import pandas as pd

    shard = (
        F.pmod(
            F.xxhash64(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(PACK_SALT)))
            ),
            F.lit(n_shards),
        )
        if n_shards > 1
        else F.lit(0)
    )
    keys = [*partition_cols, "__shard"]
    slim = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("__tok"),
        *[F.col(c) for c in partition_cols],
        shard.cast("int").alias("__shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__tok", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        # '|' and '%' in partition values are percent-escaped so two
        # distinct (values, shard, bin) tuples can never collide into
        # one pack_key
        prefix = "|".join(
            str(pdf.iloc[0][c]).replace("%", "%25").replace("|", "%7C")
            for c in keys
        )
        fills: list[int] = []
        bin_ids: list[int] = []
        oversize: list[bool] = []
        for t in pdf["__tok"]:
            t = int(t)
            if t > budget:
                # sentinel ABOVE budget: the singleton stays permanently
                # full even against zero-token docs (fill+0 <= budget
                # would otherwise admit them into a truncated bin)
                fills.append(budget + 1)
                bin_ids.append(len(fills) - 1)
                oversize.append(True)
                continue
            for i, f in enumerate(fills):
                if f + t <= budget:
                    fills[i] = f + t
                    bin_ids.append(i)
                    oversize.append(False)
                    break
            else:
                fills.append(t)
                bin_ids.append(len(fills) - 1)
                oversize.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "pack_key": [f"{prefix}|{b}" for b in bin_ids],
                "pack_oversize": oversize,
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    packed = slim.groupBy(*keys).applyInPandas(
        pack, f"{id_col} {id_type}, pack_key string, pack_oversize boolean"
    )
    return df.join(packed, on=id_col)


def pack_token_sequences(
    packed: DataFrame,
    encoded: DataFrame,
    id_col: str = "doc_id",
    pack_cols: tuple[str, ...] = ("lang", "pack_id"),
) -> DataFrame:
    """Assemble the trainer-ready sequences: one row per pack carrying
    the concatenated ``token_ids`` of its documents in the pack's
    deterministic order (the PACK_SALT-salted hash order
    `pack_by_budget` assigned bins with — so the emitted byte stream is
    rerun-identical), plus the attention-mask bookkeeping a collator
    needs: ``doc_ids`` (documents in order) and ``doc_lens`` (piece
    count per document; cumulative sums are the cross-document
    attention boundaries).

    ``packed`` is the funnel's final stage (or any frame carrying
    ``pack_cols`` + id_col); ``encoded`` is `ext/bpe.py:bpe_encode_ids`'
    output. Documents without an encoding row are dropped from the
    sequence (they had no text to encode) — audit via comparing
    ``size(doc_ids)`` against the pack's member count.

    Scale shape: one join on id (ids + token arrays, no text), one
    groupBy per pack; a pack's payload is budget-bounded by
    construction, so per-group state is small regardless of corpus
    size."""
    order = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(PACK_SALT))
    )
    joined = packed.select(
        *[F.col(c) for c in pack_cols], F.col(id_col), order.alias("__ord")
    ).join(encoded.select(F.col(id_col), "token_ids"), on=id_col)
    member = F.struct(
        F.col("__ord"), F.col(id_col).alias("__id"), F.col("token_ids").alias("__t")
    )
    members = F.array_sort(F.collect_list(member))
    return (
        joined.groupBy(*[F.col(c) for c in pack_cols])
        .agg(
            F.flatten(F.transform(members, lambda s: s["__t"])).alias(
                "token_ids"
            ),
            F.transform(members, lambda s: s["__id"]).alias("doc_ids"),
            F.transform(members, lambda s: F.size(s["__t"])).alias("doc_lens"),
        )
        .withColumn("n_pieces", F.size("token_ids"))
    )


def packing_waste(
    packed: DataFrame, token_col: str, budget: int, key_col: str = "pack_key"
) -> dict[str, int]:
    """Padding-waste audit of a capped packing: {'n_packs',
    'total_tokens', 'waste_ppm'} where waste = padded capacity not
    covered by tokens (oversize singleton packs count their own fill as
    capacity — they are truncated, not padded). One aggregation job."""
    agg = (
        packed.groupBy(key_col)
        .agg(
            F.sum(F.col(token_col).cast("long")).alias("__fill"),
            F.max(F.col("pack_oversize").cast("int")).alias("__over"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("__fill").alias("total_tokens"),
            F.sum(
                F.when(F.col("__over") == 1, F.col("__fill")).otherwise(
                    F.lit(budget)
                )
            ).alias("__capacity"),
        )
        .first()
    )
    cap = agg["__capacity"] or 0
    tot = agg["total_tokens"] or 0
    return {
        "n_packs": agg["n_packs"],
        "total_tokens": tot,
        "waste_ppm": int((1_000_000 * (cap - tot)) // cap) if cap else 0,
    }


#: token-count histogram bucket edges for :func:`corpus_report` — the
#: length distribution a data card publishes; the last bucket is open.
REPORT_HIST_EDGES = (0, 50, 100, 200, 500, 1000, 2000, 5000)


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> dict:
    """The corpus DATA CARD in one aggregation pass: per-language (or
    whole-corpus when ``lang_col`` is None) document/token/char totals,
    per-quality-rule failure counts, PII mention volume, exact-duplicate
    document count, and a token-length histogram — the release-notes
    numbers every dataset card publishes, computed the way the engine
    computes everything else (exact integers, deterministic, no
    sampling).

    Returns ``{lang: {...}, "_corpus": {...}}`` (documents with a NULL
    language group under the Python key ``None`` — the rollup's
    grouping flag keeps them distinct from the grand total) where each
    entry carries
    ``n_docs``, ``total_tokens``, ``total_chars``, ``exact_dup_docs``
    (docs minus distinct content fingerprints — WITHIN the group),
    ``rule_failures`` ({rule: n_failing}), ``pii`` ({emails,
    digit_runs}) and ``token_hist`` ({"0-49": n, ..., "5000+": n}).
    ``_corpus`` sums the additive metrics across groups; its
    ``exact_dup_docs`` is recomputed globally in the same job (a
    fingerprint duplicated ACROSS languages is invisible to within-group
    distinct counts, so the global number is NOT the sum).

    Scale shape: ONE job — a rollup(lang) over a projection where every
    metric is column algebra (the quality battery, regexp counts, CASE
    bucket sums); the one non-trivial aggregate is the EXACT
    count_distinct(md5), which Spark executes with a partial-distinct
    expand — still map-side combined, and no shuffle key ever carries
    text (fingerprints only). The result is #langs × #metrics scalars —
    driver-bounded."""
    from beeper_matric_etl_tool_spark.ext.quality import (
        pii_columns,
        quality_signal_columns,
        quality_verdict_columns,
        rule_failure_aggs,
        verdict_rules,
    )
    from beeper_matric_etl_tool_spark.ext.text import token_count

    sig = quality_signal_columns(text_col, lang_col=lang_col)
    pii = pii_columns(text_col)
    lang = (
        F.col(lang_col) if lang_col is not None else F.lit("_corpus")
    ).alias("__lang")
    base = docs.select(
        lang,
        F.md5(F.col(text_col)).alias("__fp"),
        token_count(text_col).alias("__n_toks"),
        F.length(F.col(text_col)).alias("__n_chars"),
        pii["n_emails"].alias("__emails"),
        pii["n_digit_runs"].alias("__digits"),
        *[c.alias(n) for n, c in sig.items()],
    ).select("*", *[c.alias(n) for n, c in quality_verdict_columns().items()])
    rules = verdict_rules()
    edges = list(REPORT_HIST_EDGES)
    buckets: list[tuple[str, Column]] = []
    for lo, hi in zip(edges, edges[1:]):
        buckets.append(
            (
                f"{lo}-{hi - 1}",
                F.sum(
                    F.when(
                        F.col("__n_toks").between(lo, hi - 1), 1
                    ).otherwise(0)
                ),
            )
        )
    buckets.append(
        (
            f"{edges[-1]}+",
            F.sum(F.when(F.col("__n_toks") >= edges[-1], 1).otherwise(0)),
        )
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_toks").alias("total_tokens"),
        F.sum("__n_chars").alias("total_chars"),
        F.count_distinct("__fp").alias("__uniq_fp"),
        F.sum("__emails").alias("__pii_emails"),
        F.sum("__digits").alias("__pii_digits"),
        *rule_failure_aggs(rules, prefix="__fail_"),
        *[b.alias(f"__hist_{i}") for i, (_, b) in enumerate(buckets)],
        # distinguishes the rollup GRAND-TOTAL row (grouping=1) from a
        # genuine NULL-language group row (grouping=0) — without it the
        # two collide on the same dict key and whichever collects last
        # wins, silently dropping null-lang docs from the breakdown
        F.grouping("__lang").alias("__is_total"),
    ]
    # grouping sets: per-language rows AND the global row in the SAME
    # job — the global distinct-fingerprint count cannot be summed from
    # the per-language ones (cross-language duplicates), so it must be
    # its own grouping, not client-side addition
    rolled = base.rollup("__lang").agg(*aggs).collect()
    out: dict = {}
    for row in rolled:
        key = "_corpus" if row["__is_total"] == 1 else row["__lang"]
        out[key] = {
            "n_docs": int(row["n_docs"]),
            "total_tokens": int(row["total_tokens"] or 0),
            "total_chars": int(row["total_chars"] or 0),
            "exact_dup_docs": int(row["n_docs"]) - int(row["__uniq_fp"]),
            "rule_failures": {
                r: int(row[f"__fail_{r}"]) for r in rules
            },
            "pii": {
                "emails": int(row["__pii_emails"] or 0),
                "digit_runs": int(row["__pii_digits"] or 0),
            },
            "token_hist": {
                name: int(row[f"__hist_{i}"])
                for i, (name, _) in enumerate(buckets)
            },
        }
    return out


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) — the dataset VERSIONING audit between two corpus
    snapshots (r13): 'added' (id only in the new snapshot), 'removed'
    (only in the old), 'changed' (same id, different content), else
    'unchanged'. The delta a dataset card, a retrain decision, or an
    incremental re-index consumes — e.g. `delete_from_*_index` the
    removed ids, `append_*` the added ones, both for the changed.

    Shape at 100 TB: one full-outer equi-join on the id whose shuffle
    carries (id, 16-byte md5 fingerprint), never text — content
    equality is decided fingerprint-to-fingerprint, so two snapshots
    of a 100 TB lake compare at the cost of their id+hash projection."""
    from beeper_matric_etl_tool_spark.ext.text import exact_fingerprint

    o = old.select(F.col(id_col), exact_fingerprint(text_col).alias("__ofp"))
    n = new.select(F.col(id_col), exact_fingerprint(text_col).alias("__nfp"))
    return (
        o.join(n, on=id_col, how="full_outer")
        .select(
            F.col(id_col),
            F.when(F.col("__ofp").isNull(), F.lit("added"))
            .when(F.col("__nfp").isNull(), F.lit("removed"))
            .when(F.col("__ofp") != F.col("__nfp"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )
