"""Trainable quality classifier — distributed logistic regression over
the engine's own quality-signal columns (SURVEY §2.12 text tier).

Why it exists: the heuristic gate (`ext/quality.py`) is rule-bound; real
curation pipelines follow it with a LEARNED filter (CCNet's perplexity
buckets, RedPajama/fastText quality classifiers — public methods) fit on
a small labeled seed set ("looks like a reference corpus" vs "looks like
crawl junk"). This module is that step, Spark-first: the model is a tiny
(d+1)-vector resident on the driver, every training iteration is ONE
corpus-linear aggregation, and scoring is pure column algebra — no UDF,
no per-row Python, nothing that would not survive 100 TB.

Determinism contract (the `train_pq` precedent): per-row gradient
contributions are floored to integers (×2¹⁶) and summed as LONGS —
integer addition is exact and order-independent, so the fitted weights
are bit-stable across partition layouts and re-runs; the final weights
are additionally frozen to the same 2⁻¹⁶ grid so downstream scores are
reproducible from the stored vector alone. The 2⁻¹⁶ gradient resolution
is far below the step sizes that matter at these feature scales.

Scale shape: one `df.agg` of d+2 long sums per iteration (map-side
combined, bytes-per-partition shuffle); the driver holds only w. Long
overflow needs n·2¹⁶·max|err·x| ≥ 2⁶³ — with standardized features
(|x| ≲ 10) that is ~10¹³ rows; the guard raises before fitting a corpus
that large rather than wrapping silently.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.similarity import QUANT

#: hard row-count ceiling for the long-integer gradient accumulator
#: (see module docstring) — conservative: 2⁶³ / (2¹⁶ · 2⁷) ≈ 1.1e12.
MAX_TRAIN_ROWS = 1_000_000_000_000

#: the quality-feature battery's column names, in training order — the
#: single source for callers that must validate weight/stats shapes
#: BEFORE composing any stage (curate()'s fail-before-persist contract).
QUALITY_FEATURE_NAMES = (
    "f_len", "f_ttr", "f_dup3", "f_stop", "f_meanlen", "f_top2",
)


def _rescaled_features(s: dict[str, Column]) -> dict[str, Column]:
    """The rescaling map shared by both feature entry points (ppm ratios
    → [0, 1]; token count → saturating /1000 like the heuristic gate's
    length rule; mean token length → /10)."""
    n = s["n_tokens"].cast("double")
    out = {
        "f_len": F.least(n, F.lit(1000.0)) / F.lit(1000.0),
        "f_ttr": s["ttr_ppm"].cast("double") / F.lit(1_000_000.0),
        "f_dup3": s["dup3_ppm"].cast("double") / F.lit(1_000_000.0),
        "f_stop": s["stop_hits"].cast("double") / F.greatest(n, F.lit(1.0)),
        "f_meanlen": s["mean_len_x100"].cast("double") / F.lit(1000.0),
        "f_top2": s["top2gram_ppm"].cast("double") / F.lit(1_000_000.0),
    }
    assert tuple(out) == QUALITY_FEATURE_NAMES
    return out


def quality_features(
    text_col: str = "text", lang_col: str | None = "lang"
) -> dict[str, Column]:
    """The quality-signal battery rescaled to O(1) doubles — the feature
    map a classifier trains on. Reuses `quality_signal_columns` so
    classifier and heuristic gate read the SAME measurements."""
    from beeper_matric_etl_tool_spark.ext.quality import quality_signal_columns

    return _rescaled_features(quality_signal_columns(text_col, lang_col=lang_col))


def quality_features_from_signals() -> dict[str, Column]:
    """Same features, derived from ALREADY-SELECTED signal columns
    (`quality_signal_columns` aliases, referenced by name) — the form a
    pipeline stage uses when the gate has computed the battery upstream:
    rescaling existing columns costs nothing, re-tokenizing would pay
    the battery twice."""
    names = (
        "n_tokens", "ttr_ppm", "dup3_ppm", "stop_hits",
        "mean_len_x100", "top2gram_ppm",
    )
    return _rescaled_features({n: F.col(n) for n in names})


#: squared-moment quantization for :func:`feature_stats` — coarser than
#: QUANT because the per-row square (f·2¹²)² must sum in a long, which
#: caps stats at MAX_STATS_ROWS below; floor-of-square bias is ~2|x|/2¹²
#: on E[x²], so only features whose variance is under ~|x|/2048 collapse
#: to std 0 (genuinely near-constant — the standardizer zeroes them
#: deliberately).
_SQ_QUANT = float(1 << 12)

#: row ceiling for the squared-moment accumulator: 2⁶³ / (10·2¹²)² ≈
#: 5.5e9; held to 1e9 for headroom. Scaling stats from a ≤1e9-row sample
#: are indistinguishable from full-corpus stats for this purpose — the
#: guard tells the caller to sample rather than silently wrapping.
MAX_STATS_ROWS = 1_000_000_000


def feature_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Per-column (mean, std) computed from EXACT integer sums — floor
    quantization then long addition, so the stats (and everything scaled
    by them) are bit-stable across partition layouts, the same contract
    as training itself. Returned values are frozen to the 2⁻¹⁶ grid.
    One corpus-linear aggregation; std of a constant column is 0.0 (the
    standardizer maps such a column to all-zeros rather than dividing)."""
    if not cols:
        raise ValueError("feature_stats: cols is empty")
    n = df.count()
    if n == 0:
        raise ValueError("feature_stats: empty frame")
    if n > MAX_STATS_ROWS:
        raise ValueError(
            f"feature_stats: {n} rows exceeds MAX_STATS_ROWS="
            f"{MAX_STATS_ROWS} (squared-moment long accumulator); "
            f"compute stats on a sample"
        )
    aggs = []
    for j, c in enumerate(cols):
        x = F.col(c).cast("double")
        q = F.floor(x * F.lit(QUANT)).cast("long")
        q8 = F.floor(x * F.lit(_SQ_QUANT)).cast("long")
        aggs.append(F.sum(q).alias(f"s{j}"))
        aggs.append(F.sum(q8 * q8).alias(f"q{j}"))
    row = df.agg(*aggs).first()
    out: dict[str, tuple[float, float]] = {}
    for j, c in enumerate(cols):
        mean = row[f"s{j}"] / QUANT / n
        ex2 = row[f"q{j}"] / _SQ_QUANT / _SQ_QUANT / n
        var = max(ex2 - mean * mean, 0.0)
        std = math.sqrt(var)
        out[c] = (
            math.floor(mean * QUANT) / QUANT,
            math.floor(std * QUANT) / QUANT,
        )
    return out


def standardize(
    df: DataFrame, stats: dict[str, tuple[float, float]]
) -> DataFrame:
    """Replace each column in ``stats`` with its z-score under the FROZEN
    (mean, std) pair — pure column algebra, no action. Training on
    standardized features conditions the gradient (the raw quality
    features span three orders of magnitude of variance, which forces
    huge per-feature learning rates); scoring new data MUST reuse the
    training-time stats, which is why they are an explicit value and not
    recomputed here. A zero-std (constant) column maps to 0.0."""
    exprs: dict[str, Column] = {}
    for c, (mean, std) in stats.items():
        x = F.col(c).cast("double")
        if std <= 0.0:
            exprs[c] = F.lit(0.0)
        else:
            exprs[c] = (x - F.lit(mean)) / F.lit(std)
    return df.withColumns(exprs)


def _logit(weights: list[float], feature_cols: list[str]) -> Column:
    z: Column = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    return z


def predict_proba(weights: list[float], feature_cols: list[str]) -> Column:
    """P(label=1 | x) as a pure codegen column: sigmoid of the frozen
    linear form. weights = [intercept, w_1 … w_d] in feature_cols
    order."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(
            f"predict_proba: {len(weights)} weights for "
            f"{len(feature_cols)} features — expected intercept + one per "
            f"feature"
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(weights, feature_cols)))


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 100,
    lr: float = 1.0,
    l2: float = 0.0,
    cache: bool = True,
) -> list[float]:
    """Fit logistic regression by full-batch gradient descent; returns
    ``[intercept, w_1 … w_d]`` frozen to the 2⁻¹⁶ grid. ``label_col``
    must be 0/1 (cast-able to double). One aggregation job per
    iteration; deterministic across partition layouts (module
    docstring). l2 regularizes the non-intercept weights.

    ``cache=True`` (default) projects ``feature_cols + [label_col]`` and
    ``localCheckpoint``s the (d+1)-column frame ONCE before the loop —
    without it, every iteration re-executes the caller's full lineage
    (for curate-battery features that means re-tokenizing the corpus per
    iteration, a ~feature-battery× tax at iterations=100). Training is
    eager by nature (one agg job per iteration), so the checkpoint's
    materialization job breaks no laziness contract; the checkpointed
    blocks are reclaimed by the ContextCleaner once training returns.
    Pass ``cache=False`` only when the input is already persisted or
    checkpointed (re-checkpointing a checkpoint is pure copy cost).
    The fitted weights are bit-identical either way — the integer-sum
    gradient contract is layout-independent by construction."""
    if not feature_cols:
        raise ValueError("train_logreg: feature_cols is empty")
    if iterations < 1:
        raise ValueError(f"train_logreg: iterations={iterations} must be >= 1")
    if cache:
        proj = list(dict.fromkeys([*feature_cols, label_col]))
        # lazy: the count() below full-scans and therefore materializes
        # the checkpoint in the same job (r13 — one job, not two)
        df = df.select(*proj).localCheckpoint(eager=False)
    n = df.count()
    if n == 0:
        raise ValueError("train_logreg: empty training frame")
    if n > MAX_TRAIN_ROWS:
        raise ValueError(
            f"train_logreg: {n} rows exceeds MAX_TRAIN_ROWS="
            f"{MAX_TRAIN_ROWS} — the long-integer gradient accumulator "
            f"would overflow; fit on a sample (the model has "
            f"{len(feature_cols) + 1} parameters, it does not need 10^12 "
            f"rows)"
        )
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        err = predict_proba(w, feature_cols) - y
        aggs = [
            F.sum(F.floor(err * F.lit(QUANT)).cast("long")).alias("g0")
        ] + [
            F.sum(
                F.floor(err * F.col(c).cast("double") * F.lit(QUANT)).cast(
                    "long"
                )
            ).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = df.agg(*aggs).first()
        grad = [row[f"g{j}"] / QUANT / n for j in range(d + 1)]
        w = [
            wj - lr * (gj + (l2 * wj if j > 0 else 0.0))
            for j, (wj, gj) in enumerate(zip(w, grad))
        ]
    # freeze to the quantized grid — scores downstream of the stored
    # vector are then reproducible bit for bit
    return [math.floor(wj * QUANT) / QUANT for wj in w]


def classify(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    threshold: float = 0.5,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Attach ``out_col`` (P(keep)) and ``<out_col>_keep`` (boolean at
    ``threshold``) — the filter form of the trained model. Pure column
    algebra; compose with `curate()` by pre-filtering its input."""
    p = predict_proba(weights, feature_cols)
    return df.withColumn(out_col, p).withColumn(
        f"{out_col}_keep", F.col(out_col) >= F.lit(float(threshold))
    )


def evaluate_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    strata_col: str | None = None,
    spread: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Exact tie-aware ROC AUC of ``score_col`` against the boolean
    ``label_col`` — the threshold-free counterpart of `classify`'s fixed
    cutoff, and the eval surface a learned quality filter is actually
    judged by (which cutoff to deploy comes AFTER ranking quality is
    established). One row per stratum: (strata?, n_pos, n_neg, u2,
    auc_ppm).

    Method: Mann-Whitney U with the standard tie correction,
    AUC = (#concordant + ½·#tied) / (P·N), computed from SCORE-GROUP
    counts so no per-row rank is ever materialized:

        u2 = Σ_g (2·pos_g·negbelow_g + pos_g·neg_g)   (u2 = 2·U, exact)
        auc_ppm = floor(1e6 · u2 / (2·P·N))

    Determinism contract: pos_g/neg_g/negbelow_g are exact longs, u2 an
    exact long sum (order-independent), so u2/n_pos/n_neg hash-match any
    engine bit-for-bit; auc_ppm's one float divide + floor runs ONCE PER
    STRATUM on identical long inputs — the lm-leg exposure argument at
    its smallest possible surface.

    Overflow: u2 ≤ 2·P·N. Each addend and every partial sum of the
    nonnegative series stays under the total, so the single guard
    P·N > 2⁶¹ (checked in DOUBLES after the counts agg — the long
    product itself could wrap) raises before a wrapped u2 can be read;
    that bound admits P = N ≈ 1.5e9 per stratum, and per-language strata
    at 100 TB sit orders below the 2⁶¹ pair count.

    Scale shape: ONE corpus-sized exchange (the (stratum, score) count
    agg, map-side combined); everything after rides the score-DISTINCT
    relation — bounded by the score's value domain (ppm scores: ≤ 1e6+1
    rows per stratum), not the corpus. The cumulative-negatives window
    single-tasks a stratum of that bounded relation by default;
    ``spread=True`` routes it through the distributed prefix sum
    (`ext/pipeline.py:_spread_prefix`) for unbounded score domains.

    Null handling: rows with a NULL score or NULL label are EXCLUDED
    (an unscored row cannot rank; silently counting a null label as
    negative — what a bare count-minus-sum would do — is a trap), and
    n_pos/n_neg count only the rows that entered the statistic."""
    lab = F.col(label_col)
    grp = [strata_col] if strata_col is not None else []
    g = (
        df.filter(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(*grp, score_col)
        .agg(
            F.count_if(lab).alias("__pos"),
            F.count_if(~lab).alias("__neg"),
        )
    )
    order = [F.col(score_col).asc()]
    if spread:
        from beeper_matric_etl_tool_spark.ext.pipeline import _spread_prefix

        gp = _spread_prefix(
            g, "__neg", order, grp, partitions, out_col="__negb"
        )
    else:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*grp)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        gp = g.withColumn(
            "__negb", F.coalesce(F.sum("__neg").over(w), F.lit(0))
        )
    agg = gp.groupBy(*grp).agg(
        F.sum("__pos").alias("n_pos"),
        F.sum("__neg").alias("n_neg"),
        F.sum(
            F.lit(2) * F.col("__pos") * F.col("__negb")
            + F.col("__pos") * F.col("__neg")
        ).alias("u2"),
    )
    pn = F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    u2_ok = F.when(
        pn > F.lit(float(2**61)),
        F.raise_error(F.lit(
            "evaluate_auc: n_pos*n_neg exceeds 2^61 in one stratum — the "
            "long u2 accumulator would wrap; stratify finer"
        )).cast("long"),
    ).otherwise(F.col("u2"))
    # auc derives from the GUARDED u2, not the raw column: a caller that
    # selects only auc_ppm would otherwise let Catalyst column-prune the
    # raise_error away and read a wrapped accumulator as a silently wrong
    # AUC — the guard must survive every projection that exposes u2's
    # value (pinned by a plan test: raise_error appears in auc_ppm's
    # optimized plan)
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.floor(
            F.lit(1_000_000.0) * u2_ok.cast("double")
            / (F.lit(2.0) * pn)
        ).cast("long"),
    )
    return agg.select(*grp, "n_pos", "n_neg", u2_ok.alias("u2"), auc.alias("auc_ppm"))


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
    strata_col: str | None = None,
) -> DataFrame:
    """Reliability-diagram counts — the calibration audit that pairs
    with `evaluate_auc` (AUC measures ranking; calibration measures
    whether prob≈0.8 rows are actually kept ~80% of the time, the
    property a downstream threshold choice depends on): one row per
    (strata?, bin) with (n, n_pos, pos_ppm, sum_prob_ppm), where bin =
    floor(prob·n_bins) clamped so prob=1.0 lands in the top bin.

    Exact integers where exactness is possible: n/n_pos are counts,
    pos_ppm an integer-floored rate; the mean predicted probability —
    the diagonal the diagram compares against — ships as
    sum_prob_ppm = Σ floor(1e6·prob) (an exact long; the caller divides
    by n client-side), because a float mean cannot hash-match across
    engines. NULL probs/labels are excluded (`evaluate_auc`'s rule).

    Scale shape: ONE map-side-combined groupBy of ≤ strata·n_bins
    output rows — nothing else touches the corpus.

    Domain: ``prob_col`` must lie in [0, 1] — a value outside it (a
    mis-scaled score passed as a probability) RAISES instead of silently
    binning into a negative or top-clamped bin id, matching the module's
    fail-loud convention; the raise lives inside the bin expression the
    groupBy consumes, so no projection can prune it."""
    if n_bins < 2:
        raise ValueError(f"calibration_bins: n_bins={n_bins} must be >= 2")
    p = F.col(prob_col)
    lab = F.col(label_col)
    grp = [strata_col] if strata_col is not None else []
    binned = df.filter(p.isNotNull() & lab.isNotNull()).select(
        *grp,
        F.when(
            (p < F.lit(0.0)) | (p > F.lit(1.0)),
            F.raise_error(F.lit(
                f"calibration_bins: {prob_col} outside [0, 1] — not a "
                f"probability; rescale the score before binning"
            )).cast("long"),
        ).otherwise(
            F.least(
                F.floor(p * F.lit(float(n_bins))).cast("long"),
                F.lit(n_bins - 1),
            )
        ).alias("bin"),
        lab.alias("__lab"),
        F.floor(p * F.lit(1_000_000.0)).cast("long").alias("__p_ppm"),
    )
    return binned.groupBy(*grp, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("__lab")).alias("n_pos"),
        F.floor(
            F.lit(1_000_000) * F.count_if(F.col("__lab")) / F.count(F.lit(1))
        ).cast("long").alias("pos_ppm"),
        F.sum("__p_ppm").alias("sum_prob_ppm"),
    )


#: ×1e6 numerators in the sweep metrics stay exact longs below this row
#: count per stratum (1e6 · 4e12 < 2⁶³); past it the guarded expression
#: raises instead of wrapping.
MAX_SWEEP_ROWS_PER_STRATUM = 4_000_000_000_000


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    strata_col: str | None = None,
    spread: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Confusion counts + deployment metrics at EVERY candidate cut —
    the sweep `select_threshold` argmaxes over, exposed because the full
    precision/recall curve is itself a deliverable (threshold choice is
    a product decision; the curve is the evidence). One row per
    (strata?, observed score), with the decision rule "predict positive
    iff score >= threshold": (strata?, threshold, tp, fp, fn, tn,
    n_pos, n_neg, precision_ppm, recall_ppm, f1_ppm, accuracy_ppm,
    youden_ppm).

    Candidate cuts are the OBSERVED distinct scores — between two
    observed scores every cut yields the same confusion matrix, so the
    sweep is lossless and score-distinct-sized (never corpus-sized).
    Built from the same (stratum, score) count relation `evaluate_auc`
    aggregates: tp/fp at cut t are the inclusive descending cumulative
    positive/negative counts; fn/tn derive from the per-stratum totals.

    Exactness contract: every count is an exact long; each *_ppm metric
    is ONE integer-floored division of longs (f1 simplifies to
    2·tp/(2·tp+fp+fn) = 2·tp/(tp+fp+n_pos), so no float precision/recall
    composition): engines agree bit for bit. recall/youden are NULL when
    a class is empty (0/0 is not 0); youden_ppm = recall_ppm − fpr_ppm,
    each floored separately (documented, portable). The ×1e6 numerators
    are guarded: a stratum past MAX_SWEEP_ROWS_PER_STRATUM raises inside
    the metric expressions (prune-proof — the `evaluate_auc` guard
    precedent) instead of wrapping.

    Scale shape: ONE corpus-sized exchange (the map-side-combined
    (stratum, score) count agg); everything downstream rides the
    score-distinct relation — ≤ 1e6+1 rows per stratum for ppm scores.
    The default cumulative window single-tasks a stratum of that BOUNDED
    relation; ``spread=True`` routes both running sums through the
    distributed prefix form (`ext/pipeline.py:_spread_prefix`) for
    unbounded score domains. The per-stratum totals join back through a
    broadcast with NULL-SAFE stratum compares (a NULL stratum sweeps
    like any other group).

    NULL handling: rows with a NULL score or label are EXCLUDED
    (`evaluate_auc`'s rule — an unscored row cannot be cut on)."""
    lab = F.col(label_col)
    grp = [strata_col] if strata_col is not None else []
    g = (
        df.filter(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(*grp, score_col)
        .agg(
            F.count_if(lab).alias("__pos"),
            F.count_if(~lab).alias("__neg"),
        )
    )
    order = [F.col(score_col).desc()]
    if spread:
        from beeper_matric_etl_tool_spark.ext.pipeline import _spread_prefix

        # ONE range exchange carries both running totals (the helper's
        # multi-weight form) — inclusive cumulatives = exclusive + own
        gp = _spread_prefix(
            g, ["__pos", "__neg"], order, grp, partitions,
            out_col=["__tp_x", "__fp_x"],
        )
        gp = (
            gp.withColumn("__tp", F.col("__tp_x") + F.col("__pos"))
            .withColumn("__fp", F.col("__fp_x") + F.col("__neg"))
            .drop("__tp_x", "__fp_x")
        )
    else:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*grp)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        gp = g.withColumn("__tp", F.sum("__pos").over(w)).withColumn(
            "__fp", F.sum("__neg").over(w)
        )
    totals = gp.groupBy(*grp).agg(
        F.sum("__pos").alias("n_pos"), F.sum("__neg").alias("n_neg")
    )
    if grp:
        tot_r = totals.select(
            *[F.col(c).alias(f"__t_{c}") for c in grp], "n_pos", "n_neg"
        )
        cond = F.lit(True)
        for c in grp:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__t_{c}"))
        joined = gp.join(F.broadcast(tot_r), on=cond).drop(
            *[f"__t_{c}" for c in grp]
        )
    else:
        joined = gp.join(F.broadcast(totals))
    tp, fp = F.col("__tp"), F.col("__fp")
    n_pos, n_neg = F.col("n_pos"), F.col("n_neg")
    n_total = n_pos + n_neg
    # prune-proof overflow guard: every ×1e6 numerator derives from the
    # guarded tp, so selecting any single metric keeps the raise alive
    tp_ok = F.when(
        n_total > F.lit(MAX_SWEEP_ROWS_PER_STRATUM),
        F.raise_error(F.lit(
            "threshold_sweep: stratum exceeds MAX_SWEEP_ROWS_PER_STRATUM "
            "— the 1e6-scaled metric numerators would wrap; stratify finer"
        )).cast("long"),
    ).otherwise(tp)
    tn = n_neg - fp
    recall = F.when(
        n_pos > 0, F.expr("(1000000 * __tp_ok) DIV n_pos")
    )
    fpr = F.when(n_neg > 0, F.expr("(1000000 * __fp) DIV n_neg"))
    return joined.withColumn("__tp_ok", tp_ok).select(
        *grp,
        F.col(score_col).alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        (n_pos - tp).alias("fn"),
        tn.alias("tn"),
        "n_pos",
        "n_neg",
        F.expr("(1000000 * __tp_ok) DIV (__tp + __fp)").alias(
            "precision_ppm"
        ),
        recall.alias("recall_ppm"),
        F.expr("(2000000 * __tp_ok) DIV (__tp + __fp + n_pos)").alias(
            "f1_ppm"
        ),
        F.expr(
            "(1000000 * (__tp_ok + (n_neg - __fp))) DIV (n_pos + n_neg)"
        ).alias("accuracy_ppm"),
        (recall - fpr).alias("youden_ppm"),
    )


#: metrics select_threshold may argmax — precision/recall alone are
#: DEGENERATE objectives (precision is maximized by the most selective
#: cut, recall by the least) and are rejected; sweep them via
#: `threshold_sweep` if the curve itself is wanted.
SELECTABLE_METRICS = ("f1_ppm", "accuracy_ppm", "youden_ppm")


def select_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    strata_col: str | None = None,
    metric: str = "f1_ppm",
    spread: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """The deployment cut: per stratum, the threshold maximizing
    ``metric`` over the full `threshold_sweep` — completing the
    classifier story (`train_logreg` → `evaluate_auc`/`calibration_bins`
    → select_threshold → `curate(clf_threshold=chosen/1e6)` /
    `classify(threshold=)`). One row per stratum with the chosen
    ``threshold`` ("predict positive iff score >= threshold") and its
    full confusion/metric row.

    Deterministic tie-break: equal metric values resolve to the LARGEST
    threshold — the more selective cut, which keeps fewer rows at equal
    measured quality (the conservative curation default); pinned via a
    single struct-max (metric, threshold) over the sweep, so the argmax
    is one tiny per-stratum aggregation of the score-distinct relation.
    A stratum where the metric is NULL everywhere (youden on a
    one-class stratum) still returns its max-threshold row with the
    NULL metric — visibly unusable rather than silently absent."""
    if metric not in SELECTABLE_METRICS:
        raise ValueError(
            f"select_threshold: metric={metric!r} not in "
            f"{SELECTABLE_METRICS} — precision/recall alone are degenerate "
            f"objectives (argmax = most/least selective cut); use "
            f"threshold_sweep for the raw curve"
        )
    sweep = threshold_sweep(
        df, score_col, label_col, strata_col, spread, partitions
    )
    grp = [strata_col] if strata_col is not None else []
    tail = [c for c in sweep.columns if c not in grp]
    best = sweep.groupBy(*grp).agg(
        F.max(
            F.struct(
                F.col(metric).alias("__m"),
                *[F.col(c) for c in tail],
            )
        ).alias("__best")
    )
    return best.select(
        *grp, *[F.col(f"__best.{c}").alias(c) for c in tail]
    )
