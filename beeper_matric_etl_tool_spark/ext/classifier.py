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


def quality_features(
    text_col: str = "text", lang_col: str | None = "lang"
) -> dict[str, Column]:
    """The quality-signal battery rescaled to O(1) doubles — the feature
    map a classifier trains on (ppm ratios → [0, 1]; token count →
    saturating /1000 like the heuristic gate's length rule; mean token
    length → /10). Reuses `quality_signal_columns` so classifier and
    heuristic gate read the SAME measurements."""
    from beeper_matric_etl_tool_spark.ext.quality import quality_signal_columns

    s = quality_signal_columns(text_col, lang_col=lang_col)
    n = s["n_tokens"].cast("double")
    return {
        "f_len": F.least(n, F.lit(1000.0)) / F.lit(1000.0),
        "f_ttr": s["ttr_ppm"].cast("double") / F.lit(1_000_000.0),
        "f_dup3": s["dup3_ppm"].cast("double") / F.lit(1_000_000.0),
        "f_stop": s["stop_hits"].cast("double") / F.greatest(n, F.lit(1.0)),
        "f_meanlen": s["mean_len_x100"].cast("double") / F.lit(1000.0),
        "f_top2": s["top2gram_ppm"].cast("double") / F.lit(1_000_000.0),
    }


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
) -> list[float]:
    """Fit logistic regression by full-batch gradient descent; returns
    ``[intercept, w_1 … w_d]`` frozen to the 2⁻¹⁶ grid. ``label_col``
    must be 0/1 (cast-able to double). One aggregation job per
    iteration; deterministic across partition layouts (module
    docstring). l2 regularizes the non-intercept weights."""
    if not feature_cols:
        raise ValueError("train_logreg: feature_cols is empty")
    if iterations < 1:
        raise ValueError(f"train_logreg: iterations={iterations} must be >= 1")
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
