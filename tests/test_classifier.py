"""Trainable quality classifier (ext/classifier.py): convergence on
separable data, bit-stable training across partition layouts, and the
quality-signal feature integration that separates planted junk from
planted good documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.classifier import (
    classify,
    predict_proba,
    quality_features,
    train_logreg,
)


def _sep_frame(spark):
    # linearly separable: label = 1 iff x1 + x2 > 1 (deterministic grid)
    rows = [
        (i, (i % 13) / 13.0, ((i * 7) % 11) / 11.0)
        for i in range(200)
    ]
    return spark.createDataFrame(
        [(i, x1, x2, 1 if x1 + x2 > 1.0 else 0) for i, x1, x2 in rows],
        "id long, x1 double, x2 double, y int",
    )


def test_logreg_converges_on_separable_data(spark):
    df = _sep_frame(spark)
    w = train_logreg(df, ["x1", "x2"], "y", iterations=60, lr=4.0)
    scored = classify(df, w, ["x1", "x2"])
    acc = (
        scored.filter(
            (F.col("quality_prob_keep").cast("int")) == F.col("y")
        ).count()
        / 200
    )
    assert acc >= 0.95, (acc, w)
    # the separating direction is positive in both features
    assert w[1] > 0 and w[2] > 0


def test_logreg_bit_stable_across_partitionings(spark):
    df = _sep_frame(spark)
    ws = [
        train_logreg(df.repartition(p), ["x1", "x2"], "y", iterations=25)
        for p in (1, 3, 7)
    ]
    assert ws[0] == ws[1] == ws[2]
    # frozen to the 2^-16 grid
    assert all(w * 65536 == int(w * 65536) for w in ws[0])


def test_logreg_guards(spark):
    df = _sep_frame(spark)
    with pytest.raises(ValueError, match="feature_cols is empty"):
        train_logreg(df, [], "y")
    with pytest.raises(ValueError, match="iterations"):
        train_logreg(df, ["x1"], "y", iterations=0)
    with pytest.raises(ValueError, match="empty training frame"):
        train_logreg(df.filter(F.lit(False)), ["x1"], "y")
    with pytest.raises(ValueError, match="expected intercept"):
        predict_proba([0.0, 1.0], ["x1", "x2"])


def test_train_logreg_caches_lineage_once(spark):
    """cache=True (default) must execute the caller's lineage exactly
    ONCE (projection + localCheckpoint before the loop), not once per
    iteration — pinned by a side-effect accumulator in the input lineage
    (plan-shape evidence; job counts are flaky on a shared session), and
    the fitted weights are bit-identical to the uncached path (the
    integer-sum gradient contract is layout-independent)."""
    acc = spark.sparkContext.accumulator(0)

    @F.udf("double")
    def bump(x):
        acc.add(1)
        return x

    base = _sep_frame(spark)
    df = base.select("id", bump("x1").alias("x1"), "x2", "y")
    w_cached = train_logreg(df, ["x1", "x2"], "y", iterations=5, lr=2.0)
    assert acc.value == 200, acc.value  # one materialization, not 5-7×
    w_uncached = train_logreg(
        base, ["x1", "x2"], "y", iterations=5, lr=2.0, cache=False
    )
    assert w_cached == w_uncached


def test_quality_feature_classifier_separates_planted_docs(spark):
    """End-to-end with the engine's own signals: junk (degenerate
    repetition, stopword-free soup) vs good English prose — the trained
    model recovers the labels and generalizes to held-out docs of each
    kind."""
    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening"
    )
    goods = [good.replace("fox", w) for w in ("fox", "hare", "deer", "crow")]
    junks = [
        "spam " * 60,
        "buy buy buy now now now " * 12,
        " ".join(f"zz{chr(97 + i % 26)}q" for i in range(70)),
        "click click click here here here " * 9,
    ]
    rows = [(i, "en", t, 1) for i, t in enumerate(goods)] + [
        (100 + i, "en", t, 0) for i, t in enumerate(junks)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, y int"
    )
    feats = quality_features("text", lang_col="lang")
    featured = df.select(
        "doc_id", "y", *[c.alias(k) for k, c in feats.items()]
    )
    cols = list(feats)
    # train on the first 3 of each class, hold out the last of each.
    # 40 iterations (r14, was 80): each iteration is one sequential
    # driver-synchronized gradient job, so the count IS the test's wall
    # clock; 40 at lr=4.0 separates both classes with margin — the
    # assertion (held-out generalization) is unchanged
    train = featured.filter((F.col("doc_id") % 100) < 3)
    w = train_logreg(train, cols, "y", iterations=40, lr=4.0)
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in classify(featured, w, cols).collect()
    }
    assert all(scored[i] > 0.5 for i in (0, 1, 2, 3)), scored
    assert all(scored[100 + i] < 0.5 for i in (0, 1, 2, 3)), scored


def test_feature_stats_and_standardize(spark):
    """Exact-integer moments: stats are bit-stable across partition
    layouts and frozen to the 2^-16 grid; standardized columns have
    ~zero mean and ~unit variance; constant columns map to 0.0; empty
    cols and oversize guards raise."""
    from beeper_matric_etl_tool_spark.ext.classifier import (
        feature_stats,
        standardize,
    )

    df = _sep_frame(spark).withColumn("c_const", F.lit(0.45))
    cols = ["x1", "x2", "c_const"]
    stats = [feature_stats(df.repartition(p), cols) for p in (1, 3, 7)]
    assert stats[0] == stats[1] == stats[2]
    st = stats[0]
    for c in cols:
        m, s = st[c]
        assert m * 65536 == int(m * 65536) and s * 65536 == int(s * 65536)
    # constant column: zero std, standardizes to all-zero
    assert st["c_const"][1] == 0.0
    z = standardize(df, st)
    row = z.agg(
        F.avg("x1").alias("m1"),
        F.stddev_pop("x1").alias("s1"),
        F.sum(F.abs(F.col("c_const"))).alias("zc"),
    ).first()
    assert abs(row["m1"]) < 0.01 and abs(row["s1"] - 1.0) < 0.01
    assert row["zc"] == 0.0

    with pytest.raises(ValueError, match="cols is empty"):
        feature_stats(df, [])
    with pytest.raises(ValueError, match="empty frame"):
        feature_stats(df.filter(F.lit(False)), ["x1"])


def test_standardized_training_beats_raw_at_equal_iterations(spark):
    """The reason standardize exists: at a small fixed iteration budget
    the conditioned problem reaches higher agreement than the raw one
    (raw quality features span ~3 orders of magnitude of variance)."""
    from beeper_matric_etl_tool_spark.ext.classifier import (
        feature_stats,
        standardize,
    )

    df = _sep_frame(spark).withColumn("x1", F.col("x1") / 50.0)
    cols = ["x1", "x2"]

    def acc(frame, w):
        s = classify(frame, w, cols)
        return (
            s.filter(
                F.col("quality_prob_keep").cast("int") == F.col("y")
            ).count()
            / 200
        )

    w_raw = train_logreg(df, cols, "y", iterations=15, lr=1.0)
    z = standardize(df, feature_stats(df, cols))
    w_std = train_logreg(z, cols, "y", iterations=15, lr=1.0)
    assert acc(z, w_std) > acc(df, w_raw)


def test_evaluate_auc_exact_tie_aware(spark):
    """Hand-computed Mann-Whitney AUC: perfect separation → 1e6,
    perfect inversion → 0, all-tied → 500000, a mixed case with ties
    matches the hand-derived u2 exactly, spread ≡ window, one-class
    strata → NULL auc with exact counts."""
    from beeper_matric_etl_tool_spark.ext.classifier import evaluate_auc

    rows = (
        # stratum a: pos scores {3, 4}, neg {1, 2} — perfect separation
        [("a", 3, True), ("a", 4, True), ("a", 1, False), ("a", 2, False)]
        # stratum b: inverted
        + [("b", 1, True), ("b", 2, True), ("b", 3, False), ("b", 4, False)]
        # stratum c: all tied at one score, 2 pos 3 neg
        + [("c", 7, True), ("c", 7, True)]
        + [("c", 7, False)] * 3
        # stratum d: ties straddling — pos {2, 3}, neg {2, 1}:
        # u2 = Σ 2·pos_g·negb + pos_g·neg_g over score groups asc:
        #   s=1: (0,1) → 0 ; s=2: (1,1) → 2·1·1 + 1·1 = 3 ; s=3: (1,0) → 2·1·2 = 4
        # u2 = 7, P=N=2 → auc_ppm = floor(1e6·7/8) = 875000
        + [("d", 2, True), ("d", 3, True), ("d", 2, False), ("d", 1, False)]
        # stratum e: one class only → auc NULL
        + [("e", 5, True), ("e", 6, True)]
    )
    df = spark.createDataFrame(rows, "lang string, score long, keep boolean")
    out = {
        r["lang"]: (r["n_pos"], r["n_neg"], r["u2"], r["auc_ppm"])
        for r in evaluate_auc(df, "score", "keep", strata_col="lang").collect()
    }
    assert out["a"] == (2, 2, 8, 1_000_000)
    assert out["b"] == (2, 2, 0, 0)
    assert out["c"] == (2, 3, 6, 500_000)
    assert out["d"] == (2, 2, 7, 875_000)
    assert out["e"] == (2, 0, 0, None)
    spread = {
        r["lang"]: (r["n_pos"], r["n_neg"], r["u2"], r["auc_ppm"])
        for r in evaluate_auc(
            df, "score", "keep", strata_col="lang", spread=True
        ).collect()
    }
    assert spread == out
    # stratum-less form: pooled over everything
    pooled = evaluate_auc(
        df.filter(F.col("lang").isin("a", "b")), "score", "keep"
    ).collect()
    assert len(pooled) == 1 and pooled[0]["n_pos"] == 4


def test_evaluate_auc_partition_invariant(spark):
    """The counts are order-independent long sums: 1/7-partition inputs
    yield identical rows (the bit-stability contract)."""
    from beeper_matric_etl_tool_spark.ext.classifier import evaluate_auc

    rows = [("x", i % 13, i % 3 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, "lang string, score long, keep boolean")
    a = sorted(map(tuple, evaluate_auc(df.coalesce(1), "score", "keep", strata_col="lang").collect()))
    b = sorted(map(tuple, evaluate_auc(df.repartition(7), "score", "keep", strata_col="lang").collect()))
    assert a == b


def test_evaluate_auc_excludes_null_scores_and_labels(spark):
    """A NULL score cannot rank and a NULL label is neither class —
    both are EXCLUDED (not silently counted as negatives, the
    count-minus-sum trap), and the counts reflect only included rows."""
    from beeper_matric_etl_tool_spark.ext.classifier import evaluate_auc

    rows = [
        ("a", 3, True), ("a", 4, True), ("a", 1, False), ("a", 2, False),
        ("a", None, True),   # null score
        ("a", 5, None),      # null label
    ]
    df = spark.createDataFrame(rows, "lang string, score long, keep boolean")
    [r] = evaluate_auc(df, "score", "keep", strata_col="lang").collect()
    assert (r["n_pos"], r["n_neg"], r["u2"], r["auc_ppm"]) == (2, 2, 8, 1_000_000)


def test_threshold_sweep_hand_computed(spark):
    """Every candidate cut's confusion counts and integer metrics on a
    hand-derived frame (P=2, N=3, a tied score group at 4):
    the rule is predict-positive iff score >= threshold, tp/fp are the
    inclusive descending cumulatives, f1 = 2tp/(tp+fp+P) exactly."""
    from beeper_matric_etl_tool_spark.ext.classifier import threshold_sweep

    rows = [
        ("a", 5, True), ("a", 4, True), ("a", 4, False),
        ("a", 2, False), ("a", 1, False),
        ("a", None, True), ("a", 3, None),  # excluded (NULL rule)
    ]
    df = spark.createDataFrame(rows, "lang string, score long, keep boolean")
    out = {
        r["threshold"]: r.asDict()
        for r in threshold_sweep(df, "score", "keep", strata_col="lang").collect()
    }
    assert set(out) == {5, 4, 2, 1}
    assert (out[5]["tp"], out[5]["fp"], out[5]["fn"], out[5]["tn"]) == (1, 0, 1, 3)
    assert (out[5]["precision_ppm"], out[5]["recall_ppm"]) == (1_000_000, 500_000)
    assert (out[5]["f1_ppm"], out[5]["accuracy_ppm"]) == (666_666, 800_000)
    assert out[5]["youden_ppm"] == 500_000
    assert (out[4]["tp"], out[4]["fp"]) == (2, 1)
    assert (out[4]["f1_ppm"], out[4]["accuracy_ppm"], out[4]["youden_ppm"]) == (
        800_000, 800_000, 666_667
    )
    assert out[1]["f1_ppm"] == 571_428 and out[1]["youden_ppm"] == 0
    # spread form ≡ window form under a different partitioning
    s = sorted(
        map(tuple, threshold_sweep(
            df.repartition(3), "score", "keep", strata_col="lang", spread=True
        ).collect())
    )
    w = sorted(
        map(tuple, threshold_sweep(df, "score", "keep", strata_col="lang").collect())
    )
    assert s == w
    # one-class stratum: recall/youden NULL, precision/accuracy defined
    one = spark.createDataFrame(
        [("b", 3, False), ("b", 1, False)], "lang string, score long, keep boolean"
    )
    r3 = {
        r["threshold"]: r
        for r in threshold_sweep(one, "score", "keep", strata_col="lang").collect()
    }
    assert r3[3]["recall_ppm"] is None and r3[3]["youden_ppm"] is None
    assert r3[3]["f1_ppm"] == 0 and r3[3]["accuracy_ppm"] == 500_000


def test_select_threshold_argmax_and_tiebreak(spark):
    """Argmax per stratum with the largest-threshold tie-break (the more
    selective cut at equal metric), NULL-stratum rows sweep as their own
    group, and degenerate metrics are rejected."""
    import pytest as _pytest

    from beeper_matric_etl_tool_spark.ext.classifier import select_threshold

    rows = [
        ("a", 5, True), ("a", 4, True), ("a", 4, False),
        ("a", 2, False), ("a", 1, False),
        # NULL stratum: perfect separation at threshold 7
        (None, 7, True), (None, 3, False),
    ]
    df = spark.createDataFrame(rows, "lang string, score long, keep boolean")
    out = {
        r["lang"]: r
        for r in select_threshold(df, "score", "keep", strata_col="lang").collect()
    }
    assert out["a"]["threshold"] == 4 and out["a"]["f1_ppm"] == 800_000
    assert out[None]["threshold"] == 7 and out[None]["f1_ppm"] == 1_000_000
    # accuracy ties 800000 at cuts 5 and 4 → the larger threshold wins
    acc = select_threshold(
        df, "score", "keep", strata_col="lang", metric="accuracy_ppm"
    ).collect()
    assert {r["lang"]: r["threshold"] for r in acc}["a"] == 5
    # spread ≡ window for the chosen row
    sp = {
        r["lang"]: r["threshold"]
        for r in select_threshold(
            df.repartition(3), "score", "keep", strata_col="lang", spread=True
        ).collect()
    }
    assert sp == {k: v["threshold"] for k, v in out.items()}
    with _pytest.raises(ValueError, match="degenerate"):
        select_threshold(df, "score", "keep", metric="precision_ppm")
    # stratum-less: one pooled row
    pooled = select_threshold(
        df.filter(F.col("lang") == "a"), "score", "keep"
    ).collect()
    assert len(pooled) == 1 and pooled[0]["threshold"] == 4


def test_threshold_sweep_guard_survives_projection(spark):
    """The MAX_SWEEP_ROWS_PER_STRATUM raise derives every ×1e6 metric, so
    selecting a single metric column cannot prune it (the evaluate_auc
    guard precedent)."""
    from beeper_matric_etl_tool_spark.ext.classifier import threshold_sweep

    df = spark.createDataFrame(
        [("a", 2, True), ("a", 1, False)], "lang string, score long, keep boolean"
    )
    out = threshold_sweep(df, "score", "keep", strata_col="lang").select("f1_ppm")
    assert "raise_error" in out._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r["f1_ppm"] for r in out.collect()) == [666_666, 1_000_000]


def test_evaluate_auc_overflow_guard_survives_projection(spark):
    """The P·N > 2^61 raise must survive a caller that selects ONLY
    auc_ppm: auc derives from the guarded u2 expression, so Catalyst
    cannot column-prune the raise_error away and expose a wrapped
    accumulator as a silently wrong AUC. (The 2^61-row input itself is
    untestable — the pin is the optimized plan.)"""
    from beeper_matric_etl_tool_spark.ext.classifier import evaluate_auc

    df = spark.createDataFrame(
        [("a", 2, True), ("a", 1, False)], "lang string, score long, keep boolean"
    )
    out = evaluate_auc(df, "score", "keep", strata_col="lang").select("auc_ppm")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan
    # and the guarded path still computes the right value
    assert out.collect()[0]["auc_ppm"] == 1_000_000


def test_calibration_bins_rejects_out_of_domain_probs(spark):
    """A value outside [0, 1] in the probability column is a mis-scaled
    score, not a probability — the operator raises (fail-loud
    convention) instead of silently emitting negative/clamped bin ids."""
    import pytest as _pytest

    from beeper_matric_etl_tool_spark.ext.classifier import calibration_bins

    for bad in (-0.2, 1.5):
        df = spark.createDataFrame(
            [(0.5, True), (bad, False)], "prob double, keep boolean"
        )
        with _pytest.raises(Exception, match="outside"):
            calibration_bins(df, "prob", "keep").collect()
    # boundary values are legal: 0.0 and 1.0 bin normally
    df = spark.createDataFrame(
        [(0.0, True), (1.0, False)], "prob double, keep boolean"
    )
    out = {r["bin"] for r in calibration_bins(df, "prob", "keep").collect()}
    assert out == {0, 9}


def test_calibration_bins_hand_computed(spark):
    """Reliability counts on a hand-checkable frame: bin edges floor at
    prob·n_bins, prob=1.0 clamps into the top bin, NULLs drop, counts
    and the exact sum-of-floored-probs checksum match; partition layout
    cannot move anything (one order-free agg)."""
    from beeper_matric_etl_tool_spark.ext.classifier import calibration_bins

    rows = [
        (0.05, False), (0.08, True),            # bin 0: 2 rows, 1 pos
        (0.55, True), (0.52, False), (0.58, True),  # bin 5: 3 rows, 2 pos
        (1.0, True),                            # clamps into bin 9
        (None, True), (0.4, None),              # excluded
    ]
    df = spark.createDataFrame(rows, "prob double, keep boolean")
    out = {
        r["bin"]: (r["n"], r["n_pos"], r["pos_ppm"], r["sum_prob_ppm"])
        for r in calibration_bins(df, "prob", "keep", n_bins=10).collect()
    }
    assert set(out) == {0, 5, 9}
    assert out[0] == (2, 1, 500_000, 50_000 + 80_000)
    assert out[5] == (3, 2, 666_666, 550_000 + 520_000 + 580_000)
    assert out[9] == (1, 1, 1_000_000, 1_000_000)
    a = sorted(map(tuple, calibration_bins(df.coalesce(1), "prob", "keep").collect()))
    b = sorted(map(tuple, calibration_bins(df.repartition(5), "prob", "keep").collect()))
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "prob", "keep", n_bins=1)


def test_classifier_deploy_story_end_to_end(spark):
    """The full deploy loop composed from the module's own pieces:
    train_logreg fits weights on a separable seed set, predict_proba
    scores a batch, the ppm-floored probabilities sweep through
    select_threshold (F1 argmax), and classify() at the chosen cut
    reproduces exactly the tp/fp the sweep row promised — the contract
    that makes the selected threshold deployable via
    curate(clf_threshold=)."""
    from beeper_matric_etl_tool_spark.ext.classifier import (
        select_threshold,
        threshold_sweep,
    )

    rows = [(float(i), 1 if i >= 10 else 0) for i in range(20)]
    # one mislabeled row so the optimum is a real tradeoff, not 1.0
    rows[3] = (3.0, 1)
    df = spark.createDataFrame(rows, "x double, y int")
    w = train_logreg(df, ["x"], "y", iterations=60, lr=0.5)
    scored = df.withColumn(
        "p_ppm",
        F.floor(predict_proba(w, ["x"]) * F.lit(1_000_000.0)).cast("long"),
    ).withColumn("lab", F.col("y") == 1)
    best = select_threshold(scored, "p_ppm", "lab").collect()[0]
    t = best["threshold"]
    # classify() at the chosen cut reproduces the sweep's confusion row
    kept = classify(scored, w, ["x"], threshold=t / 1_000_000.0)
    got_tp = kept.filter(
        F.col("quality_prob_keep") & F.col("lab")
    ).count()
    got_fp = kept.filter(
        F.col("quality_prob_keep") & ~F.col("lab")
    ).count()
    assert (got_tp, got_fp) == (best["tp"], best["fp"])
    # the chosen cut is the sweep's true F1 maximum
    sweep_f1 = {
        r["threshold"]: r["f1_ppm"]
        for r in threshold_sweep(scored, "p_ppm", "lab").collect()
    }
    assert best["f1_ppm"] == max(sweep_f1.values())
