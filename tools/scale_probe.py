#!/usr/bin/env python
"""Scale-growth probe: how do representative operators behave when the
events table grows 10×?

The bench tier (sf0.1) cannot answer "what happens at 100×" directly, but
the GROWTH CURVE between 1× and 10× on identical hardware separates the
three cost regimes that matter for the 100 TB design point:

- flat        → per-query constant dominates (scheduler, not compute);
                the operator ships to a big cluster as-is
- sub-linear  → map-side combine / top-k pruning absorbing the growth
- super-linear → a real scale hazard (would get worse at 1000×)

Synthesis: each 10× table is the real table unioned 10 times with
disjoint id ranges, no driver-side row generation. Copies are
DECORRELATED where replication would manufacture duplicates the base
corpus doesn't have: events day-shift their timestamps, document texts
are per-copy consonant-rotated (so copy 3 of doc X is NOT a near-dup of
copy 5 — replicated verbatim text would show the candidate-pair count
growing quadratically because the corpus genuinely became 90% duplicates,
measuring the synthesis instead of the operator), and embeddings rotate
their component order per copy (norm-preserving, decorrelates cosine).

Probed operators (one per cost regime the 100 TB design cares about):
- keyset_topk / latest_by_key / hourly_rollup — the r1 trio (flat /
  sub-linear expected: top-k pruning and map-side combine absorb growth)
- interval_join — bin-bucketed range join; candidate pairs grow ~linearly
  with events when session structure is preserved
- decontaminate 8-gram equi-join — train side grows 10×, the val
  (benchmark) side is held at base size as in a real pipeline
- embedding LSH near-dup — banded sign-projection bucket join; candidate
  generation must track corpus size, never corpus²

Usage: python tools/scale_probe.py [sf_dir]     (default /root/testdata/sf0.1)
Prints one JSON line: {"probe": {...}, "factor": 10, "rows": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from beeper_matric_etl_tool_spark import get_spark  # noqa: E402
from beeper_matric_etl_tool_spark.operators.dedup import latest_by_key_agg  # noqa: E402
from beeper_matric_etl_tool_spark.operators.pagination import keyset_page  # noqa: E402
from beeper_matric_etl_tool_spark.sources.tables import table  # noqa: E402

FACTOR = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))


def grown(events, factor: int):
    """events × factor with disjoint ids and day-shifted event times."""
    span = events.agg(F.max("event_id")).first()[0] + 1
    copies = [
        events.select(
            (F.col("event_id") + F.lit(i * span)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def grown_documents(docs, factor: int):
    """documents × factor, texts decorrelated by per-copy consonant
    rotation (translate is bijective per copy → copy i's shingle space is
    disjoint from copy j's wherever a rotated consonant appears, so
    near-dup structure WITHIN each copy is preserved while cross-copy
    false duplicates are not manufactured)."""
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    consonants = "bcdfghjklmnpqrstvwz"
    copies = []
    for i in range(factor):
        rot = consonants[i % len(consonants):] + consonants[: i % len(consonants)]
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * span)).alias("doc_id"),
                F.translate(F.col("text"), consonants, rot).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def grown_embeddings(emb, factor: int):
    """embeddings × factor, vectors decorrelated by rotating component
    order per copy (norm-preserving; rotation changes every hyperplane
    projection, so copies land in different LSH buckets instead of
    stacking 10 deep in the same ones)."""
    span = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])
    copies = []
    for i in range(factor):
        k = i % dim
        rotated = (
            F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            )
            if k
            else F.col("embedding")
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * span)).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def probe_ops(events):
    """The three regimes' representatives, as (name, dataframe) pairs."""
    topk = keyset_page(
        events, order_col="ts", tie_col="event_id", limit=50,
        predicate=F.col("user_id") == F.lit(12),
    )
    latest = latest_by_key_agg(
        events.withColumn("__ord", F.coalesce(F.unix_millis("ts"), F.lit(-(2 ** 63)))),
        keys=["user_id"], max_order_cols=["__ord", "event_id"],
    )
    hourly = events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"),
    )
    return {"keyset_topk": topk, "latest_by_key": latest, "hourly_rollup": hourly}


def probe_interval_join(events):
    """Sessions of users 0-4 (30-min gap rule) range-joined against ALL
    events — the `range_join_sessions` shape, reduced to a count so the
    timing measures the join, not result materialization."""
    from beeper_matric_etl_tool_spark.operators import windows as xwin
    from beeper_matric_etl_tool_spark.operators.rangejoin import interval_join

    intervals = xwin.sessionized(
        events.filter(F.col("user_id") < 5), "ts", "30 minutes", ["user_id"],
        F.count(F.lit(1)).alias("__n"),
    ).select(F.col("user_id").alias("owner_id"), "session_start", "session_end")
    pairs = interval_join(
        events.select("event_id", "ts", "user_id"), intervals,
        ts_col="ts", start_col="session_start", end_col="session_end",
    )
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


def probe_decontaminate(docs, val_grams):
    """8-gram overlap of the (grown) train side against a FIXED val-side
    distinct-gram set — benchmarks don't grow with the corpus."""
    from beeper_matric_etl_tool_spark.ext import dedup as xdedup
    from beeper_matric_etl_tool_spark.ext import text as xtext

    grams = docs.select(
        "doc_id", F.explode(xdedup.shingles(xtext.tokens("text"), k=8)).alias("gram")
    )
    return (
        grams.join(F.broadcast(val_grams), on="gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping_grams"))
        .agg(F.count(F.lit(1)).alias("n_contaminated"), F.sum("n_overlapping_grams").alias("n_hits"))
    )


def probe_lsh_near_dup(emb, n_docs=None, dim=None):
    """Banded sign-projection candidate generation + count — the
    embedding near-dup funnel without the verify stage (which is linear
    in candidates, i.e. measures the same curve twice).

    ``n_docs=None`` runs the oracle-tier toy width (16 planes, 4-bit
    band keys — the motivating quadratic counter-example) via the shared
    candidate kernel; with ``n_docs`` the candidates come THROUGH the
    production entry point `near_dup_embeddings(verify=False)` — the
    default path a naive caller gets, which applies the
    `scaled_planes_for` sizing rule (bits_per_band ≈ log2(n) + 4), so
    this probe measures the entry point itself, not a re-derivation of
    its rule."""
    from beeper_matric_etl_tool_spark.ext.similarity import (
        LSH_PLANES,
        banded_candidate_pairs,
        near_dup_embeddings,
    )

    if n_docs is None:
        pairs = banded_candidate_pairs(emb, planes=LSH_PLANES, n_bands=4)
    else:
        pairs = near_dup_embeddings(emb, n_docs=n_docs, dim=dim, verify=False)
    return pairs.agg(F.count(F.lit(1)).alias("n_candidates"))


def probe_incremental_dedup(batch, reference):
    """Incremental dedup cost vs REFERENCE size (the batch is fixed — a
    crawl snapshot doesn't grow because the corpus did). The reference is
    touched by linear passes only (fingerprints, banded signatures,
    candidate-semi-joined shingles), so runtime should track the reference
    factor at worst — a super-linear curve here would mean a batch x
    reference join leaked in.

    Probe tier runs 16 hashes / 4 bands (half the production default) and
    counts only the dropped relation — the timing target is the curve, and
    the signature pass is single-task at the bench tier anyway (the
    single-row-group storage floor, BASELINE.md)."""
    from beeper_matric_etl_tool_spark.ext.dedup import dedup_against_reference

    _survivors, dropped = dedup_against_reference(
        batch, reference, num_hashes=16, bands=4
    )
    return dropped.agg(F.count(F.lit(1)).alias("n_dropped"))


def probe_incremental_dedup_indexed(spark, batch, idx_path):
    """The steady-state twin of `probe_incremental_dedup`: probe the SAME
    fixed batch against a PERSISTED dedup index (ext/dedup_index.py)
    instead of re-deriving reference fingerprints/signatures/shingles
    from raw text. Decisions are bit-identical (dropped counts must match
    the from-scratch leg); the timing difference IS the amortization the
    index buys — the reference text scan and its minhash pass drop out
    of every batch."""
    from beeper_matric_etl_tool_spark.ext.dedup_index import dedup_against_index

    _survivors, dropped = dedup_against_index(batch, spark, idx_path)
    return dropped.agg(F.count(F.lit(1)).alias("n_dropped"))


def probe_semdedup_pairs(emb, k: int):
    """SemDeDup's cost driver: the number of WITHIN-CLUSTER pairs the
    threshold stage must score (the threshold filter is linear in this
    count, so it IS the curve). k-means with ``k`` clusters, then the
    cluster-scoped self-join counted. The paper's sizing rule — k grows
    with the corpus so expected cluster size stays constant — is exactly
    what the two regimes below measure."""
    from beeper_matric_etl_tool_spark.ext.clustering import kmeans

    assignments, _ = kmeans(emb, k=k, iterations=2)
    # assignments are total over emb's ids — joining emb back on would add
    # a corpus-scale shuffle to the timed plan without changing a row
    clustered = assignments.select("vec_id", "cluster_id")
    a = clustered.select(F.col("vec_id").alias("id_a"), "cluster_id")
    b = clustered.select(F.col("vec_id").alias("id_b"), "cluster_id")
    return (
        a.join(b, on="cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def probe_duplicate_spans(docs):
    """Duplicate-SPAN removal's cost drivers: the window-fingerprint
    count pass + the hot-position semi-join + the per-doc rebuild — all
    designed linear. A shared 10-token sentence is planted on every 4th
    doc (planting scales WITH the corpus, so the hot mass is a constant
    fraction at every factor); the consonant rotation keeps base texts
    decorrelated across copies. Returns (n_docs, tokens_removed) — the
    removed fraction should stay ~flat while time tracks the factor."""
    from beeper_matric_etl_tool_spark.ext.text import remove_duplicate_spans

    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" probe footer sentence shared across many documents here"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = remove_duplicate_spans(planted, k=8, min_count=2)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed").alias("tokens_removed"),
    )


def probe_novelty(docs):
    """Duplicated-window fraction scoring
    (`ext/text.py:ngram_duplication_scores`): the span remover's
    fingerprint-count pass + per-doc rollups, no rebuild. Same planted
    footer as the spans probe (constant hot fraction at every factor);
    dup-window mass should track the corpus while time stays ~linear."""
    from beeper_matric_etl_tool_spark.ext.text import ngram_duplication_scores

    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" probe footer sentence shared across many documents here"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = ngram_duplication_scores(planted, k=8, min_count=2)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dup_windows").alias("dup_mass"),
    )


def probe_unigram_nll(docs):
    """Perplexity-filter scoring: one tokenize+explode pass + three
    (doc,term)-sized exchanges (plan-audited in ext/search.py). Expect
    ~linear. Returns (n_docs, checksum) — the checksum pins that grown
    runs actually scored every doc."""
    from beeper_matric_etl_tool_spark.ext.search import unigram_nll_scores

    return unigram_nll_scores(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_ppm").alias("checksum"),
    )


def probe_bpe_training(docs, n_merges: int = 3):
    """BPE merge training's claim: after the one corpus word-count pass,
    iterations are WORD-VOCABULARY-sized. The consonant-rotated copies
    make each copy's words NEW vocabulary entries, so vocab grows with
    the factor — the probe measures that even then training stays
    ~linear (the corpus pass + vocab-sized loop), never corpus-
    superlinear. Returns the learned merge list length via a count
    column."""
    from beeper_matric_etl_tool_spark.ext.bpe import train_bpe_merges

    merges = train_bpe_merges(docs, n_merges=n_merges)
    return docs.sparkSession.createDataFrame(
        [(len(merges),)], "n_merges int"
    ).agg(F.max("n_merges").alias("n_merges"))


def probe_bpe_encode(docs, n_merges: int = 3):
    """bpe_encode_ids' claim: Python segmentation cost rides the
    DISTINCT-word relation (vocab grows with the rotated copies), the
    per-document reassembly is two (id, position)-keyed aggregations —
    corpus-linear, never vocabulary × corpus. Checksums pin full
    coverage and the exact piece mass."""
    from beeper_matric_etl_tool_spark.ext.bpe import (
        bpe_encode_ids,
        train_bpe_merges,
    )

    merges = train_bpe_merges(docs, n_merges=n_merges)
    encoded, _vocab = bpe_encode_ids(docs, merges)
    return encoded.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_pieces").alias("piece_checksum"),
    )


def probe_classifier_train(docs, iterations: int = 3):
    """Trainable quality filter (`ext/classifier.py`): every training
    iteration is ONE corpus-linear aggregation of d+1 long sums (map-side
    combined), plus the one-time count + feature-stats passes — so total
    cost should track iterations × corpus, never iterations × corpus².
    Labels are the deterministic lang=='en' proxy (present at every
    factor); returns (n_rows, w0_q16) driver-side — the fitted intercept
    frozen to the 2⁻¹⁶ grid, pinning that training actually converged on
    the grown corpus rather than short-circuiting."""
    from beeper_matric_etl_tool_spark.ext.classifier import (
        feature_stats,
        quality_features,
        standardize,
        train_logreg,
    )

    feats = quality_features("text", lang_col="lang")
    base = docs.select(
        F.col("doc_id"),
        (F.col("lang") == "en").cast("double").alias("label"),
        *[c.alias(name) for name, c in feats.items()],
    )
    cols = list(feats.keys())
    stats = feature_stats(base, cols)
    std = standardize(base, stats)
    w = train_logreg(std, cols, "label", iterations=iterations, lr=0.5)
    return std.count(), int(round(w[0] * (1 << 16)))


def probe_dsir(docs, target):
    """DSIR importance resampling (`ext/embed.py:importance_resample`):
    two bounded bucket-total aggregations (dim·n_partitions longs on the
    exchange regardless of corpus size) + one map-only scoring pass —
    expect ~linear. The target (trusted reference) is FIXED at base size
    as in a real pipeline; returns (n_kept, score checksum of survivors)."""
    from beeper_matric_etl_tool_spark.ext.embed import importance_resample

    kept = importance_resample(docs.select("doc_id", "text"), target, dim=64)
    row = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("dsir_score_ppm").alias("checksum"),
    ).first()
    return int(row["n_kept"]), int(row["checksum"] or 0)


def probe_embed_documents(docs):
    """Hashed-feature embedder (`ext/embed.py:embed_documents`): one
    map-only pass, the count vector folds at the row and is referenced
    twice (norm + scale) — expect flat-to-linear. Checksum sums the
    first component over the corpus (deterministic; pins full coverage)."""
    from beeper_matric_etl_tool_spark.ext.embed import embed_documents

    emb = embed_documents(docs.select("doc_id", "text"), dim=64)
    return emb.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.floor(F.element_at("embedding", 1).cast("double") * 1e6).cast(
                "long"
            )
        ).alias("checksum"),
    )


def timed_fn(fn):
    """(seconds, value) for EAGER probes (driver-side collects inside the
    callable) — one warm call, one timed call, mirroring `timed_value`."""
    fn()  # warm
    t0 = time.perf_counter()
    v = fn()
    return round(time.perf_counter() - t0, 4), v


def probe_corpus_report(docs):
    """The one-rollup data card (`ext/pipeline.py:corpus_report`): every
    metric is column algebra over one projection + a rollup(lang) agg
    (exact count_distinct is the only expand) — expect ~linear, output
    size constant."""
    from beeper_matric_etl_tool_spark.ext.pipeline import corpus_report

    rep = corpus_report(docs)
    return rep["_corpus"]["n_docs"], rep["_corpus"]["exact_dup_docs"]


def probe_top_fraction(docs):
    """Exact percentile gate (`sample_top_fraction`): per-stratum rank +
    count windows over a pruned (lang, score, id) projection — the
    sample_quota sort shape with a data-dependent k. Expect ~n log n;
    kept counts scale exactly with the corpus (the semantics)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_top_fraction
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    kept = sample_top_fraction(
        base, "n_toks", keep_ppm=750_000, strata_col="lang"
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_toks").alias("membership_checksum"),
    )


def probe_top_fraction_spread(docs):
    """The percentile gate's SCALE form (spread=True): range-partitioned
    distributed rank + broadcast boundary compare — no single-task
    stratum sort, the corpus never shuffles for the gate itself. The
    checksum must EQUAL probe_top_fraction's at every factor (identical
    kept set, different plan); the growth curve prices the extra pruned
    rank pass against the window form's dominant-stratum sort."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_top_fraction
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    kept = sample_top_fraction(
        base, "n_toks", keep_ppm=750_000, strata_col="lang", spread=True
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_toks").alias("membership_checksum"),
    )


def probe_transcripts(events):
    """Transcript assembly (`ext/transcripts.py:assemble_transcripts`):
    two user-partitioned windows + one (user, session) group, per-session
    arrays bounded at max_turns BEFORE collection. Expect ~linear in
    events — day-shifted copies add SESSIONS per user, not session
    length, and the windows spread across users. The checksum pins
    session membership and transcript content mass."""
    from beeper_matric_etl_tool_spark.ext.transcripts import assemble_transcripts

    out = assemble_transcripts(events, max_turns=8)
    return out.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_tokens").alias("token_mass"),
        F.sum(F.length("transcript")).alias("char_mass"),
    )


def probe_auc(docs):
    """Exact AUC (`ext/classifier.py:evaluate_auc`, spread form): one
    corpus-sized (lang, score) count agg, then everything rides the
    score-distinct relation. Expect ~linear wall; the u2 VALUE grows
    ~quadratically (it is a concordant-pair count) while the compute
    does not — that separation is the point of the rank-sum form."""
    from beeper_matric_etl_tool_spark.ext.classifier import evaluate_auc
    from beeper_matric_etl_tool_spark.ext.quality import (
        quality_signal_columns,
        quality_verdict_columns,
    )

    sig = quality_signal_columns("text", lang_col="lang")
    labeled = docs.select(
        "doc_id", "lang", *(c.alias(n) for n, c in sig.items())
    ).select("lang", "ttr_ppm", quality_verdict_columns()["keep"].alias("__keep"))
    out = evaluate_auc(labeled, "ttr_ppm", "__keep", strata_col="lang", spread=True)
    return out.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("u2").alias("u2_mass"),
        F.sum("auc_ppm").alias("auc_sum"),
    )


def probe_select_threshold(docs):
    """Threshold selection (`ext/classifier.py:select_threshold`, spread
    form): the same corpus-sized (lang, score) count agg as the AUC
    probe, then the sweep + struct-argmax ride the score-distinct
    relation. Expect ~linear wall (the feature battery dominates); the
    chosen cuts' checksum pins the argmax across growth."""
    from beeper_matric_etl_tool_spark.ext.classifier import select_threshold
    from beeper_matric_etl_tool_spark.ext.quality import (
        quality_signal_columns,
        quality_verdict_columns,
    )

    sig = quality_signal_columns("text", lang_col="lang")
    labeled = docs.select(
        "doc_id", "lang", *(c.alias(n) for n, c in sig.items())
    ).select(
        "lang", "ttr_ppm", quality_verdict_columns()["keep"].alias("__keep")
    )
    out = select_threshold(
        labeled, "ttr_ppm", "__keep", strata_col="lang", spread=True
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("threshold").alias("thr_sum"),
        F.sum("tp").alias("tp_mass"),
        F.sum("f1_ppm").alias("f1_sum"),
    )


def probe_sweep_only(docs):
    """The threshold sweep PROPER, isolated (round-10 BASELINE ask): the
    r9 select_threshold growth row is dominated by the quality-feature
    battery feeding it, so this probe feeds a PRECOMPUTED integer score
    (one pmod-of-hash column — negligible next to the sweep) straight
    into select_threshold. What the curve then shows is exactly the
    sweep machinery: one corpus-sized (stratum, score) count agg, the
    multi-weight `_spread_prefix` range exchange carrying the tp/fp
    cumulatives, the totals join-back, and the struct-argmax — all on
    the score-distinct relation. The hash score keeps per-stratum score
    cardinality HIGH (up to 100k distinct), so the score-distinct
    relation actually grows with the corpus instead of saturating."""
    from beeper_matric_etl_tool_spark.ext.classifier import select_threshold

    labeled = docs.select(
        "lang",
        F.pmod(F.xxhash64("text"), F.lit(100_000)).alias("score"),
        (F.length("text") % 2 == 0).alias("__keep"),
    )
    out = select_threshold(
        labeled, "score", "__keep", strata_col="lang", spread=True
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("threshold").alias("thr_sum"),
        F.sum("tp").alias("tp_mass"),
        F.sum("f1_ppm").alias("f1_sum"),
    )


def probe_transcript_repair(spark, events):
    """Transcript-repair cost shape (round 10): the claim to pin is
    "rewrite I/O ∝ drift size, detection ∝ corpus" — so time three
    repairs over the same NDJSON source: FULL drift (empty target —
    detection + corpus-sized rewrite), ONE-key drift (detection + one
    bucket rewritten), and NO drift (detection only — the steady-state
    watchdog pass). one_drift should sit near detect_only (the rewrite
    adds one bucket), far under full_drift; all three grow ~linearly
    with the corpus because detection is a per-key count+checksum agg."""
    import shutil
    import tempfile

    from beeper_matric_etl_tool_spark.streaming.reconcile import (
        _session_upsert,
        repair_transcripts,
    )

    work = tempfile.mkdtemp(prefix="probe-repair-")
    try:
        src = os.path.join(work, "src")
        wire = events.select(
            F.to_json(
                F.struct(
                    F.col("event_id").cast("string").alias("event_id"),
                    F.lit("!r").alias("room_id"),
                    F.concat(
                        F.lit("@u"), F.col("user_id").cast("string")
                    ).alias("sender"),
                    F.col("event_type").alias("event_type"),
                    F.unix_millis(F.col("ts")).alias("timestamp"),
                    F.lit(False).alias("is_encrypted"),
                    F.col("props").alias("content"),
                    F.lit(None).cast("string").alias("relates_to"),
                )
            ).alias("value")
        )
        wire.repartition(8).write.mode("overwrite").text(src)
        tgt = os.path.join(work, "tgt")

        t0 = time.time()
        n_full = repair_transcripts(spark, src, tgt).count()
        full_sec = time.time() - t0

        ghost = spark.createDataFrame(
            [("@u1", 1, 2, 1, 1, 1, "@u1 chat: ghost")],
            "sender string, session_start_ms long, session_end_ms long, "
            "n_events long, n_turns long, n_tokens long, transcript string",
        )
        _session_upsert(ghost, tgt)
        t0 = time.time()
        n_one = repair_transcripts(spark, src, tgt).count()
        one_sec = time.time() - t0

        t0 = time.time()
        n_zero = repair_transcripts(spark, src, tgt).count()
        detect_sec = time.time() - t0
        return {
            "full_drift_sec": round(full_sec, 3), "full_keys": n_full,
            "one_drift_sec": round(one_sec, 3), "one_keys": n_one,
            "detect_only_sec": round(detect_sec, 3), "zero_keys": n_zero,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_calibration(docs):
    """Reliability bins over REAL classifier probabilities
    (`ext/classifier.py:calibration_bins` on predict_proba output — the
    oracle tier bins an exact-integer pseudo-prob instead, so this probe
    closes the eval tier's growth table for the float-sigmoid path): the
    feature battery + sigmoid is pure column algebra feeding ONE
    map-side-combined groupBy of ≤ strata·n_bins output rows. Expect
    ~linear wall; bin COUNTS grow ~FACTOR× while the relation stays
    bins-sized. Weights are a FROZEN literal vector (training growth is
    probe_classifier_train's subject), so the probe is deterministic."""
    from beeper_matric_etl_tool_spark.ext.classifier import (
        QUALITY_FEATURE_NAMES,
        calibration_bins,
        predict_proba,
        quality_features_from_signals,
    )
    from beeper_matric_etl_tool_spark.ext.quality import (
        quality_signal_columns,
        quality_verdict_columns,
    )

    sig = quality_signal_columns("text", lang_col="lang")
    base = docs.select("lang", *(c.alias(n) for n, c in sig.items()))
    feats = quality_features_from_signals()
    labeled = base.select(
        "lang",
        *(c.alias(n) for n, c in feats.items()),
        quality_verdict_columns()["keep"].alias("__keep"),
    )
    w = [0.25, 1.5, 2.0, -3.0, 1.0, -0.5, -1.0]
    probs = labeled.withColumn(
        "__p", predict_proba(w, list(QUALITY_FEATURE_NAMES))
    )
    out = calibration_bins(probs, "__p", "__keep", n_bins=10, strata_col="lang")
    return out.agg(
        F.count(F.lit(1)).alias("n_bins_rows"),
        F.sum("n").alias("n_docs"),
        F.sum("n_pos").alias("n_pos"),
        F.sum(F.col("bin") * F.col("n")).alias("bin_mass"),
    )


def probe_pmi(docs):
    """PMI collocations (`ext/search.py:pmi_collocations`): bigram-count
    agg (map-side combined) + vocabulary joins + TakeOrderedAndProject.
    Expect ~linear in tokens; the consonant rotation grows the bigram
    vocabulary per copy, so the count relation grows with the corpus —
    the honest regime (a verbatim union would dedupe into base-sized
    counts and measure nothing)."""
    from beeper_matric_etl_tool_spark.ext.search import pmi_collocations

    out = pmi_collocations(docs, min_count=5, k=20)
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("rank") * F.col("pmi_ppm")).alias("order_checksum"),
    )


def probe_dense_batch(docs):
    """Batch dense retrieval (`ext/search.py:dense_hash_topk_batch`):
    8 queries scored in one corpus pass — per-doc vector folds once
    below the broadcast join, local-rank prune bounds the per-query
    sort. Expect ~linear in the corpus (the 8× query fan-out rides the
    same scan); the pooled (row count, Σ rank·doc_id) checksum pins the
    per-query orderings."""
    from beeper_matric_etl_tool_spark.ext.search import dense_hash_topk_batch

    spark = docs.sparkSession
    qsets = [
        (0, "the data model"), (1, "alpha of the"), (2, "and to a"),
        (3, "in is that"), (4, "by for with"), (5, "stream batch join"),
        (6, "of of of"), (7, "table scan index"),
    ]
    queries = spark.createDataFrame(qsets, "query_id long, text string")
    out = dense_hash_topk_batch(docs, queries, k=10)
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("rank") * F.col("doc_id")).alias("order_checksum"),
    )


def probe_pack_spread(docs):
    """Token packing in its scale form (pack_by_budget spread=True): the
    distributed exclusive prefix sum — range exchange + tiny offsets +
    local cumsum, no single-task dominant-source stage. Expect ~linear;
    the (pack count, Σ pack_id) checksum pins assignment semantics
    against the window form's SQL-oracled replay (doc_packing)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import pack_by_budget
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    packed = pack_by_budget(
        base, "n_toks", budget=2048, partition_cols=("lang",), spread=True
    )
    return packed.agg(
        F.count_distinct("lang", "pack_id").alias("n_packs"),
        F.sum("pack_id").alias("assignment_checksum"),
    )


def probe_score_buckets_spread(docs):
    """CCNet head/middle/tail bucketing in its scale form (spread=True):
    the same distributed rank, boundaries at the cut ranks, map-only
    CASE labeling. Output is corpus-sized (every row keeps a label), so
    expect ~linear; the label-mass checksum pins the full labeling
    against the window form's semantics."""
    from beeper_matric_etl_tool_spark.ext.pipeline import score_buckets
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    labeled = score_buckets(
        base, "n_toks", strata_col="lang", spread=True
    )
    return labeled.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("score_bucket") == "head", F.col("doc_id"))
        ).alias("head_checksum"),
        F.count_if(F.col("score_bucket") == "middle").alias("n_middle"),
    )


def probe_token_quota(docs):
    """Token-budget stratified sampling (`sample_token_quota`,
    two-phase): the dominant-stratum refinement's cumsum windows over a
    pruned (lang, hash, id, n_toks) projection. Budgets are FIXED, so
    kept token mass stays ~constant while the corpus grows — the flat
    output that makes the curve the sort cost, not the result."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_token_quota
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    kept = sample_token_quota(
        base,
        {"en": 2000, "es": 800, "fr": 500, "de": 700, "zh": 300},
        two_phase=True,
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_toks").alias("kept_tokens"),
    )


def probe_epoch_shuffle(docs):
    """Deterministic epoch shuffle (`shuffle_epoch`): one hash exchange
    + a partition-local sort — the bucketed-write shape, expect ~n log n
    at worst. The checksum sums shard ids over all docs (pins full
    coverage and the fixed-hash-range shard assignment)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import shuffle_epoch

    out = shuffle_epoch(docs.select("doc_id"), epoch=1, n_shards=16)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("eshard").cast("long")).alias("shard_checksum"),
    )


def probe_bigram_nll(docs):
    """Interpolated bigram-LM scoring (`ext/search.py:bigram_nll_scores`):
    one tokenize pass, transition relation via a zero-shuffle array zip,
    then (doc,bigram)/vocabulary-keyed exchanges — expect ~linear (the
    bigram vocabulary grows faster than the unigram one, but both ride
    map-side combine). Checksum pins full coverage."""
    from beeper_matric_etl_tool_spark.ext.search import bigram_nll_scores

    return bigram_nll_scores(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_ppm").alias("checksum"),
    )


def probe_quota_sample(docs):
    """Exact-quota stratified sampling: the per-stratum window sort over
    a pruned (lang, hash, id) projection. Expect ~n log n — the flat
    quota means output stays constant while the sort input grows."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_quota
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    out = sample_quota(base, {"en": 100, "es": 40, "fr": 25, "de": 60, "zh": 30})
    return out.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_toks").alias("membership_checksum"),
    )


def probe_quota_two_phase(docs):
    """The dominant-stratum refinement (sample_quota two_phase=True):
    phase-1 local top-quota spreads the big stratum's sort over all
    input partitions, phase-2 re-ranks ≤ quota·n_partitions candidates.
    The checksum must EQUAL probe_quota_sample's at every factor —
    scale-measured proof the refinement changes the plan, not the
    sample."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_quota
    from beeper_matric_etl_tool_spark.ext.text import token_count

    base = docs.select("doc_id", "lang", token_count("text").alias("n_toks"))
    out = sample_quota(
        base,
        {"en": 100, "es": 40, "fr": 25, "de": 60, "zh": 30},
        two_phase=True,
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_toks").alias("membership_checksum"),
    )


def probe_media_curation(docs):
    """Media curation funnel growth (round 10): payload count scales with
    the corpus. AUDIO-only corpus on purpose — the saw generator's
    32768-wide slope space keeps every family distinct at any probed
    scale, while the image/video gradient multipliers live in 8-bit
    space and would alias past ~256 families, manufacturing spurious
    exact-duplicate groups (quadratic pair blowup the real funnel would
    never see on distinct media). family = doc_id // 4 is a 4-member
    near-dup clique (two exact copies each of an original and a
    re-leveled edit — a 200-sample window touching ~2 of the 33 bins, so
    orig-edit hamming stays well inside the tightened threshold
    while measured cross-family distances concentrate ≥ 7). A small
    fraction of genuinely-close slope families may still merge — that is
    the operator's real semantics on real media, reported as observed.
    Probes the funnel end to end through the production entry point:
    JVM dispatch, one PCM decode per payload, banding, pointer-jumping
    components, decision assembly. Expected: wall ~linear in docs;
    keep ≈ clusters ≈ docs/4, near_dup ≈ 3/4."""
    import pandas as pd

    from beeper_matric_etl_tool_spark.ext import multimodal as xmm

    def gen(it):
        for pdf in it:
            payloads = [
                xmm.make_saw_wav(
                    3300, int(d) // 4, (1022, 1222) if int(d) % 2 else None
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.select("doc_id").mapInPandas(gen, "doc_id long, payload binary")
    out = xmm.curate_media(media, audio_max_hamming=8)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("decision") == "keep").cast("long")).alias("n_keep"),
        F.sum((F.col("decision") == "drop:near_dup").cast("long")).alias(
            "n_near_dup"
        ),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )


def probe_video_hash(docs, n_frames: int):
    """Video decode-cost linearity (round 10): the growth dimension is
    MEDIA BYTES per doc, not doc count — the same 768 videos at
    ``n_frames`` frames each (24 vs 240 → 10× the decoded bytes).
    Expected: decode+hash wall grows far sub-10× (the signature stays 64
    bits and banding work is constant per doc; only the frame walk
    scales), pinning 'pixels never shuffle' with a measured curve."""
    import pandas as pd

    from beeper_matric_etl_tool_spark.ext import multimodal as xmm

    def gen(it):
        for pdf in it:
            payloads = [
                xmm.make_gradient_avi(
                    40, 16, n_frames, (int(d) // 4) % 200,
                    20 if int(d) % 2 else None,
                    (n_frames * 3 // 8, n_frames * 6 // 8) if int(d) % 2 else None,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = (
        docs.select("doc_id")
        .filter(F.col("doc_id") < 768)
        .mapInPandas(gen, "doc_id long, payload binary")
    )
    pairs = xmm.video_near_dup_pairs(media, max_hamming=15, bands=16)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("hamming").alias("ham_sum"),
    )


def probe_media_index(spark, docs):
    """Media-index steady-state shape (round 10): a FIXED 240-doc probe
    batch against an index built from the whole corpus — the growth
    dimension is INDEX SIZE, the claim is that probe cost is dominated by
    the batch's own decode + a signature-column scan of the index, so
    wall grows far sub-linearly while the index grows 10×. Audio corpus
    (distinct saw slopes — the media_curation probe's aliasing argument);
    batch = re-leveled edits of the first 240 indexed clips, so every
    probe row actually matches (the candidate path is exercised, not
    short-circuited by empty band buckets)."""
    import shutil
    import tempfile

    import pandas as pd

    from beeper_matric_etl_tool_spark.ext import multimodal as xmm
    from beeper_matric_etl_tool_spark.ext.media_index import (
        build_media_index,
        media_dedup_against_index,
    )

    def gen(edit):
        def inner(it):
            for pdf in it:
                payloads = [
                    xmm.make_saw_wav(3300, int(d), (1022, 1222) if edit else None)
                    for d in pdf["doc_id"]
                ]
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        return inner

    work = tempfile.mkdtemp(prefix="probe-midx-")
    try:
        idx = os.path.join(work, "idx")
        corpus = docs.select("doc_id").mapInPandas(
            gen(False), "doc_id long, payload binary"
        )
        t0 = time.perf_counter()
        build_media_index(corpus, idx)
        build_sec = round(time.perf_counter() - t0, 4)

        batch = (
            docs.select("doc_id").filter(F.col("doc_id") < 240)
            .mapInPandas(gen(True), "doc_id long, payload binary")
        )
        media_dedup_against_index(batch, spark, idx, max_hamming=8)[1].count()  # warm
        t0 = time.perf_counter()
        _, dropped = media_dedup_against_index(batch, spark, idx, max_hamming=8)
        n_dropped = dropped.count()
        probe_sec = round(time.perf_counter() - t0, 4)
        return {
            "build_sec": build_sec,
            "probe_sec": probe_sec,
            "batch_dropped": n_dropped,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_containment_index(spark, docs):
    """Containment-index steady state (round 12): a FIXED 240-clip probe
    batch against a unit-signature index built from the whole corpus —
    the growth dimension is INDEX UNITS (10x the tracks -> 10x the
    stored units), the claim is that probe cost is dominated by the
    clips' own decode + a unit-column scan of the index (no track
    payload in the plan), so wall grows far sub-linearly. Audio hop
    units (window 2048 over 12k-sample saw tracks -> 5 units/track);
    clips are hop-ALIGNED cuts of the first 240 tracks (samples
    [4096, 4096+3*2048) re-derived from the same per-doc RandomState),
    so every probe row votes at its true offset 2 and the
    candidate/vote path is exercised, not short-circuited. Noise
    tracks, not saws: the coarse window fingerprint collides across saw
    slopes (the banding-probe corpus's documented entropy
    concentration), which would make hit volume — and therefore the
    probe curve — measure collisions instead of index scan cost."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from beeper_matric_etl_tool_spark.ext.containment_index import (
        build_containment_index,
        containment_against_index,
    )

    def wav_of(samples):
        sig = samples.astype("<i2").tobytes()
        fmt = (
            b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
            + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
            + (16000).to_bytes(4, "little") + (2).to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        data = b"data" + len(sig).to_bytes(4, "little") + sig
        body = b"WAVE" + fmt + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def track_samples(d):
        rs = np.random.RandomState(int(d) % (2**31))
        return rs.randint(-32768, 32768, 12_000)

    def gen_tracks(it):
        for pdf in it:
            payloads = [wav_of(track_samples(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def gen_clips(it):
        for pdf in it:
            payloads = [
                wav_of(track_samples(d)[4096 : 4096 + 3 * 2048])
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    work = tempfile.mkdtemp(prefix="probe-cidx-")
    try:
        idx = os.path.join(work, "idx")
        corpus = docs.select("doc_id").mapInPandas(
            gen_tracks, "doc_id long, payload binary"
        )
        t0 = time.perf_counter()
        build_containment_index(
            corpus, idx, kind="audio", window_frames=2048, max_hamming=0
        )
        build_sec = round(time.perf_counter() - t0, 4)

        clips = (
            docs.select("doc_id").filter(F.col("doc_id") < 240)
            .mapInPandas(gen_clips, "doc_id long, payload binary")
        )
        containment_against_index(clips, spark, idx, min_matches=3).count()  # warm
        t0 = time.perf_counter()
        hits = containment_against_index(clips, spark, idx, min_matches=3)
        n_hits = hits.count()
        probe_sec = round(time.perf_counter() - t0, 4)
        return {
            "build_sec": build_sec,
            "probe_sec": probe_sec,
            "probe_hits": n_hits,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_passage_index(spark, docs):
    """Passage-attribution index steady state (round 12): a FIXED
    240-probe batch of passages against a window index built from the
    whole corpus — growth dimension is STORED WINDOWS (10x docs -> 10x
    window rows), claim: probe cost is the probes' own fingerprint pass
    + one fp equi-join against the stored relation (no corpus text in
    the plan), so wall grows far sub-linearly. Probes are 20-token cuts
    from offset 10 of the first 240 docs, so every probe attributes at
    its true offset and the join/vote path is exercised."""
    import shutil
    import tempfile

    from beeper_matric_etl_tool_spark.ext.passage_index import (
        attribute_against_index,
        build_passage_index,
    )

    work = tempfile.mkdtemp(prefix="probe-pidx-")
    try:
        idx = os.path.join(work, "idx")
        corpus = docs.select("doc_id", "text")
        t0 = time.perf_counter()
        build_passage_index(corpus, idx, k=8)
        build_sec = round(time.perf_counter() - t0, 4)

        probes = (
            corpus.filter(F.col("doc_id") < 240)
            .select(
                "doc_id",
                F.array_join(
                    F.slice(F.split(F.col("text"), " "), 11, 20), " "
                ).alias("text"),
            )
        )
        attribute_against_index(probes, spark, idx).count()  # warm
        t0 = time.perf_counter()
        hits = attribute_against_index(probes, spark, idx)
        n_hits = hits.count()
        probe_sec = round(time.perf_counter() - t0, 4)
        return {
            "build_sec": build_sec,
            "probe_sec": probe_sec,
            "probe_hits": n_hits,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def timed(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def timed_value(df):
    """(seconds, first row) — for single-row probe results where re-running
    the plan just to read the value would repeat its most expensive join."""
    df.first()  # warm
    t0 = time.perf_counter()
    row = df.first()
    return round(time.perf_counter() - t0, 4), row


def timed_eager(fn, *args):
    """(seconds, first row) for probes whose plan construction is EAGER
    (localCheckpoint banding, the components loop) — the build must sit
    INSIDE the timed region or the probe measures only the final agg."""
    fn(*args).first()  # warm
    t0 = time.perf_counter()
    row = fn(*args).first()
    return round(time.perf_counter() - t0, 4), row


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    os.environ.setdefault("SPARK_GRAFT_AQE", "1")  # production default; r4 A/B: also faster
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m")
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    events = table(spark, sf_dir, "events")
    big = grown(events, FACTOR).persist()
    n1, n10 = events.count(), big.count()

    out = {"factor": FACTOR, "rows": {"base": n1, "grown": n10}, "probe": {}}
    for name, df1 in probe_ops(events).items():
        t1 = timed(df1)
        t10 = timed(probe_ops(big)[name])
        out["probe"][name] = {
            "base_sec": t1,
            "grown_sec": t10,
            "growth_ratio": round(t10 / t1, 2) if t1 else None,
        }

    # range join: points AND intervals grow together
    t1 = timed(probe_interval_join(events))
    t10 = timed(probe_interval_join(big))
    out["probe"]["interval_join"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
    }
    t1, r1 = timed_value(probe_transcripts(events))
    t10, r10 = timed_value(probe_transcripts(big))
    out["probe"]["transcripts"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
        "base_row": list(r1), "grown_row": list(r10),
    }
    out["probe"]["transcript_repair"] = {
        "base": probe_transcript_repair(spark, events),
        "grown": probe_transcript_repair(spark, big),
    }
    big.unpersist()

    from beeper_matric_etl_tool_spark.ext import dedup as xdedup
    from beeper_matric_etl_tool_spark.ext import text as xtext
    from beeper_matric_etl_tool_spark.plans.catalog_ext import holdout_split

    docs = table(spark, sf_dir, "documents")
    big_docs = grown_documents(docs, FACTOR).persist()
    out["rows"]["documents_base"] = docs.count()
    out["rows"]["documents_grown"] = big_docs.count()
    # fixed benchmark side: the BASE corpus's val split
    for pname, fn in (
        ("duplicate_spans", probe_duplicate_spans),
        ("novelty_score", probe_novelty),
        ("unigram_nll", probe_unigram_nll),
        ("bigram_nll", probe_bigram_nll),
        ("top_fraction", probe_top_fraction),
        ("top_fraction_spread", probe_top_fraction_spread),
        ("score_buckets_spread", probe_score_buckets_spread),
        ("pack_spread", probe_pack_spread),
        ("dense_batch", probe_dense_batch),
        ("auc_spread", probe_auc),
        ("select_threshold_spread", probe_select_threshold),
        ("sweep_only", probe_sweep_only),
        ("calibration_bins", probe_calibration),
        ("pmi", probe_pmi),
        ("token_quota_two_phase", probe_token_quota),
        ("epoch_shuffle", probe_epoch_shuffle),
        ("quota_sample", probe_quota_sample),
        ("quota_sample_two_phase", probe_quota_two_phase),
        ("bpe_training", probe_bpe_training),
        ("bpe_encode", probe_bpe_encode),
    ):
        t1, r1 = timed_value(fn(docs))
        t10, r10 = timed_value(fn(big_docs))
        out["probe"][pname] = {
            "base_sec": t1, "grown_sec": t10,
            "growth_ratio": round(t10 / t1, 2) if t1 else None,
            "base_row": list(r1), "grown_row": list(r10),
        }

    # media probes (eager plans — timed_eager puts construction inside the
    # clock). media_curation grows DOC COUNT; video_hash grows MEDIA BYTES
    # per doc (24 -> 240 frames over the same 768 docs).
    t1, r1 = timed_eager(probe_media_curation, docs)
    t10, r10 = timed_eager(probe_media_curation, big_docs)
    out["probe"]["media_curation"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
        "base_row": list(r1), "grown_row": list(r10),
    }
    t1, r1 = timed_eager(probe_video_hash, docs, 24)
    t10, r10 = timed_eager(probe_video_hash, docs, 240)
    out["probe"]["video_hash_bytes"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
        "base_row": list(r1), "grown_row": list(r10),
    }
    out["probe"]["media_index"] = {
        "base": probe_media_index(spark, docs),
        "grown": probe_media_index(spark, big_docs),
    }
    out["probe"]["containment_index"] = {
        "base": probe_containment_index(spark, docs),
        "grown": probe_containment_index(spark, big_docs),
    }
    out["probe"]["passage_index"] = {
        "base": probe_passage_index(spark, docs),
        "grown": probe_passage_index(spark, big_docs),
    }

    # eager probes (driver-side work inside): classifier training + DSIR.
    # The DSIR target is the BASE corpus's en-subset at both factors — a
    # trusted reference corpus does not grow because the crawl did.
    dsir_target = docs.filter(F.col("lang") == "en").select("doc_id", "text").persist()
    dsir_target.count()
    for pname, fn1, fn10 in (
        (
            "classifier_train",
            lambda: probe_classifier_train(docs),
            lambda: probe_classifier_train(big_docs),
        ),
        (
            "dsir_resample",
            lambda: probe_dsir(docs, dsir_target),
            lambda: probe_dsir(big_docs, dsir_target),
        ),
        (
            "corpus_report",
            lambda: probe_corpus_report(docs),
            lambda: probe_corpus_report(big_docs),
        ),
    ):
        t1, r1 = timed_fn(fn1)
        t10, r10 = timed_fn(fn10)
        out["probe"][pname] = {
            "base_sec": t1, "grown_sec": t10,
            "growth_ratio": round(t10 / t1, 2) if t1 else None,
            "base_row": list(r1), "grown_row": list(r10),
        }
    dsir_target.unpersist()
    t1, r1 = timed_value(probe_embed_documents(docs))
    t10, r10 = timed_value(probe_embed_documents(big_docs))
    out["probe"]["embed_documents"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
        "base_row": list(r1), "grown_row": list(r10),
    }

    val_grams = (
        docs.select("doc_id", "text", holdout_split().alias("split"))
        .filter(F.col("split") == "val")
        .select(F.explode(xdedup.shingles(xtext.tokens("text"), k=8)).alias("gram"))
        .distinct()
        .persist()
    )
    val_grams.count()
    t1 = timed(probe_decontaminate(docs, val_grams))
    t10 = timed(probe_decontaminate(big_docs, val_grams))
    out["probe"]["decontaminate_8gram"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
    }
    val_grams.unpersist()

    # incremental dedup: FIXED 50-doc batch (25 copies of corpus docs →
    # guaranteed exact drops, 25 id-shifted fresh ids) vs the growing
    # reference. Expect ≤ linear growth in the reference factor.
    batch = (
        docs.filter(F.col("doc_id") < 25)
        .select((F.col("doc_id") + F.lit(7_000_000)).alias("doc_id"), "text")
        .unionByName(
            docs.filter((F.col("doc_id") >= 25) & (F.col("doc_id") < 50)).select(
                (F.col("doc_id") + F.lit(8_000_000)).alias("doc_id"),
                F.concat(F.lit("prefix-decorrelating words "), F.col("text")).alias(
                    "text"
                ),
            )
        )
        .persist()
    )
    batch.count()
    t1, r1 = timed_value(probe_incremental_dedup(batch, docs))
    t10, r10 = timed_value(probe_incremental_dedup(batch, big_docs))
    out["probe"]["incremental_dedup"] = {
        "base_sec": t1, "grown_sec": t10,
        "growth_ratio": round(t10 / t1, 2) if t1 else None,
        "base_dropped": r1["n_dropped"], "grown_dropped": r10["n_dropped"],
    }  # both counts must equal |batch| = 50 (25 exact copies + 25 prefixed near-dups)

    # steady-state leg: the same probes against PERSISTED indexes (built
    # once per reference — the amortized cost a live pipeline pays) with
    # the probe-tier config matching the from-scratch leg above. Dropped
    # counts must equal the from-scratch leg's; the per-batch timing no
    # longer includes the reference text scan + minhash pass.
    import shutil
    import tempfile

    from beeper_matric_etl_tool_spark.ext.dedup_index import build_dedup_index

    idx_base = tempfile.mkdtemp(prefix="probe-dedup-idx-base-")
    idx_grown = tempfile.mkdtemp(prefix="probe-dedup-idx-grown-")
    try:
        tb0 = time.perf_counter()
        build_dedup_index(docs, idx_base, num_hashes=16, bands=4)
        build_base = round(time.perf_counter() - tb0, 4)
        tb0 = time.perf_counter()
        build_dedup_index(big_docs, idx_grown, num_hashes=16, bands=4)
        build_grown = round(time.perf_counter() - tb0, 4)
        t1i, r1i = timed_value(probe_incremental_dedup_indexed(spark, batch, idx_base))
        t10i, r10i = timed_value(probe_incremental_dedup_indexed(spark, batch, idx_grown))
        out["probe"]["incremental_dedup_indexed"] = {
            "base_sec": t1i, "grown_sec": t10i,
            "growth_ratio": round(t10i / t1i, 2) if t1i else None,
            "base_dropped": r1i["n_dropped"], "grown_dropped": r10i["n_dropped"],
            "probe_vs_scratch_base": round(t1i / t1, 2) if t1 else None,
            "probe_vs_scratch_grown": round(t10i / t10, 2) if t10 else None,
            "index_build_base_sec": build_base,
            "index_build_grown_sec": build_grown,
        }
    finally:
        shutil.rmtree(idx_base, ignore_errors=True)
        shutil.rmtree(idx_grown, ignore_errors=True)
    batch.unpersist()
    big_docs.unpersist()

    emb = table(spark, sf_dir, "embeddings")
    big_emb = grown_embeddings(emb, FACTOR).persist()
    n_base = emb.count()
    n_grown = big_emb.count()
    out["rows"]["embeddings_base"] = n_base
    out["rows"]["embeddings_grown"] = n_grown

    # the candidate-volume claim, stated as measured data. Two regimes:
    # - toy (oracle-tier 4-bit bands): the random-collision floor is
    #   bands·2^-bits·C(n,2) — candidate growth tracks factor² and the
    #   probe EXPECTS that (it is the motivating counter-example)
    # - log-sized (bits_per_band = log2(n) + 4): the floor stays O(n),
    #   so candidates grow ~linearly and per-vector fan-out stays flat.
    #   Run THROUGH near_dup_embeddings — the production default path —
    #   with (n_docs, dim) passed so the timing excludes the sizing job.
    dim = len(emb.select("embedding").first()[0])
    out["probe"]["lsh_near_dup"] = {}
    for regime in ("toy_4bit", "log_sized"):
        if regime == "toy_4bit":
            t1, r1 = timed_value(probe_lsh_near_dup(emb))
            t10, r10 = timed_value(probe_lsh_near_dup(big_emb))
        else:
            t1, r1 = timed_value(probe_lsh_near_dup(emb, n_docs=n_base, dim=dim))
            t10, r10 = timed_value(probe_lsh_near_dup(big_emb, n_docs=n_grown, dim=dim))
        c1, c10 = r1[0], r10[0]
        out["probe"]["lsh_near_dup"][regime] = {
            "base_sec": t1, "grown_sec": t10,
            "growth_ratio": round(t10 / t1, 2) if t1 else None,
            "base_candidates": c1, "grown_candidates": c10,
            "candidate_growth_ratio": round(c10 / c1, 2) if c1 else None,
        }
    # SemDeDup block volume under the two k-sizing policies. fixed_k is
    # the counter-example (cluster size grows with the corpus → the
    # within-cluster self-join tracks factor²); scaled_k (k ∝ n, the
    # SemDeDup paper's rule and ext/semdedup.py's documented contract)
    # holds expected cluster size constant → pairs track the factor.
    out["probe"]["semdedup_pairs"] = {}
    for regime, k_base, k_grown in (
        ("fixed_k", 8, 8),
        ("scaled_k", 8, 8 * FACTOR),
    ):
        t1, r1 = timed_value(probe_semdedup_pairs(emb, k_base))
        t10, r10 = timed_value(probe_semdedup_pairs(big_emb, k_grown))
        c1, c10 = r1[0], r10[0]
        out["probe"]["semdedup_pairs"][regime] = {
            "base_sec": t1, "grown_sec": t10,
            "growth_ratio": round(t10 / t1, 2) if t1 else None,
            "base_pairs": c1, "grown_pairs": c10,
            "pair_growth_ratio": round(c10 / c1, 2) if c1 else None,
        }
    big_emb.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
