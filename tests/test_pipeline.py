"""End-to-end curation pipeline (ext/pipeline.py) over the sf0.001 corpus
plus planted rows that force every stage to act: a low-quality doc, a PII
doc, an exact duplicate, a lexical near-duplicate, and embedding-space
near-duplicates. The funnel must drop exactly the planted offenders and
nothing it cannot justify, deterministically across runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.ext.pipeline import (
    curate,
    mix_keep,
    pack_by_budget,
    sample_quota,
    stage_report,
)
from beeper_matric_etl_tool_spark.sources.tables import table

BASE = 100_000  # planted ids start here — above every real doc_id


def _planted_docs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # a known-good body: long enough, stopword-y, varied (passes the gate)
    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines "
        "under a wide sky full of bright and patient little stars"
    )
    planted = spark.createDataFrame(
        [
            # quality victim: degenerate repetition (TTR floor)
            (BASE + 0, "en", "spam " * 80),
            # PII carrier: survives quality, text must come out scrubbed
            (BASE + 1, "en", good + " contact me at alice@example.com or 5551234"),
            # exact-duplicate pair (same content, different ids)
            (BASE + 2, "en", good),
            (BASE + 3, "en", good),
            # lexical near-duplicate of the good body (one word changed)
            (BASE + 4, "en", good.replace("fox", "wolf")),
            # Spanish docs that pass the PER-LANGUAGE stopword floor (the
            # synthetic corpus's es rows are English word-soup with an es
            # label — under per-language scoring they correctly die at the
            # gate, so tests needing post-gate es rows rely on these)
            # word suffixes are LETTERS, not digits — the PII scrub
            # rewrites digit runs to <NUM>, which would make every doc's
            # scrubbed text identical and exact-dedup them to one row
            *[
                (
                    BASE + 20 + i,
                    "es",
                    " ".join(
                        [
                            f"palabra{chr(97 + i)}{chr(97 + j // 26)}{chr(97 + j % 26)}"
                            for j in range(54)
                        ]
                        + ["el", "la", "de", "que", "un", "por"]
                    ),
                )
                for i in range(10)
            ],
        ],
        "doc_id long, lang string, text string",
    )
    return docs.unionByName(planted)


def _planted_embeddings(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # two semantic near-dup rows: copies of vec 0's embedding under planted
    # doc ids that survive the lexical stages (no planted text for them —
    # they stand in for paraphrases that shingles cannot catch)
    clones = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("__z"), "embedding"
    )
    c1 = clones.select((F.lit(BASE + 10)).alias("vec_id"), "embedding")
    c2 = clones.select((F.lit(BASE + 11)).alias("vec_id"), "embedding")
    return emb.unionByName(c1).unionByName(c2)


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    docs = _planted_docs(spark, sf_dir)
    stages = curate(docs, text_col="text", id_col="doc_id", source_col="lang")
    report = stage_report(stages)
    return docs, stages, report


def test_funnel_monotone(run):
    _, _, report = run
    order = [
        "quality", "scrubbed", "exact", "near", "incremental",
        "semantic", "sampled", "packed",
    ]
    counts = [report[s] for s in order]
    assert all(a >= b for a, b in zip(counts, counts[1:])), report
    # identity stages (no reference/embeddings/mix_rates) — same counts
    assert report["incremental"] == report["near"]
    assert report["semantic"] == report["incremental"]
    assert report["packed"] == report["sampled"] == report["semantic"]


def test_incremental_stage_drops_reference_duplicates(spark, sf_dir):
    """curate(reference_docs=...) drops batch rows duplicating the kept
    corpus between the within-batch and semantic stages."""
    reference = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ref_text = reference.filter(F.col("doc_id") == 3).first()["text"]
    fresh = (
        "a wholly original passage that shares no phrasing with the corpus "
        "under test because every one of its shingles was invented here for "
        "the purpose of surviving both duplicate detectors unscathed today "
        "and of being long enough to clear the quality gate comfortably too "
        "with some words to spare before the counter reaches the threshold"
    )
    batch = spark.createDataFrame(
        [(BASE + 20, "en", ref_text), (BASE + 21, "en", fresh)],
        "doc_id long, lang string, text string",
    )
    stages = curate(batch, reference_docs=reference.select("doc_id", "text"))
    near_ids = {r[0] for r in stages["near"].select("doc_id").collect()}
    incr_ids = {r[0] for r in stages["incremental"].select("doc_id").collect()}
    # the reference copy survives the WITHIN-batch stages (it has no
    # duplicate inside the batch; quality-gate permitting) but not the
    # incremental one; the fresh doc passes both
    if BASE + 20 in near_ids:
        assert BASE + 20 not in incr_ids
    assert BASE + 21 in incr_ids


def test_quality_stage_drops_planted_spam(run):
    _, stages, _ = run
    kept_ids = {r[0] for r in stages["scrubbed"].select("doc_id").collect()}
    assert BASE + 0 not in kept_ids
    assert BASE + 1 in kept_ids


def test_pii_scrubbed_text(run):
    _, stages, _ = run
    row = stages["scrubbed"].filter(F.col("doc_id") == BASE + 1).first()
    assert "<EMAIL>" in row["text"] and "<NUM>" in row["text"]
    assert "alice@example.com" not in row["text"]
    assert row["n_emails"] == 1 and row["n_digit_runs"] == 1


def test_exact_dedup_keeps_lowest_id(run):
    _, stages, _ = run
    ids = {r[0] for r in stages["exact"].select("doc_id").collect()}
    assert BASE + 2 in ids
    assert BASE + 3 not in ids


def test_near_dedup_collapses_paraphrase(run):
    _, stages, _ = run
    ids = {r[0] for r in stages["near"].select("doc_id").collect()}
    # the PII carrier (good + one extra sentence), the exact-dup survivor
    # and the one-word variant all share ≥ 0.8 of their shingles — ONE
    # near-dup component, lowest id (the PII carrier) survives
    assert BASE + 1 in ids
    assert BASE + 2 not in ids
    assert BASE + 4 not in ids


def test_semantic_stage_with_embeddings(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    emb = _planted_embeddings(spark, sf_dir)
    # stand-in docs for the embedding clones (distinct texts so lexical
    # stages keep them; semantic stage must collapse them onto vec 0's doc)
    extra = spark.createDataFrame(
        [
            (
                BASE + 10,
                "en",
                "an entirely different account of the same underlying idea told "
                "with other words so that the shingle sets of these two texts "
                "do not overlap at all in any of their many small parts today "
                "because each phrase here was chosen to avoid the earlier "
                "wording while still reading like a plain natural sentence",
            ),
            (
                BASE + 11,
                "en",
                "yet another retelling using a third vocabulary choice for each "
                "of the concepts so the lexical fingerprints differ once more "
                "while the meaning and hence the embedding stays put for now "
                "which is precisely what a semantic pass exists to notice and "
                "what a purely lexical pass is certain to miss every time",
            ),
            (
                BASE + 12,
                "en",
                "this final planted passage carries no embedding row at all so "
                "the semantic stage has no evidence against it and the funnel "
                "contract says a document of unknown meaning must pass through "
                "untouched rather than be discarded on a missing feature today "
                "or on any other absent signal that the pipeline cannot judge",
            ),
        ],
        "doc_id long, lang string, text string",
    )
    stages = curate(docs.unionByName(extra), embeddings=emb)
    ids = {r[0] for r in stages["semantic"].select("doc_id").collect()}
    near_ids = {r[0] for r in stages["near"].select("doc_id").collect()}
    # all three stand-ins reach the semantic stage (lexically distinct)
    assert {BASE + 10, BASE + 11, BASE + 12} <= near_ids
    # the two embedding clones form one duplicate component with vec 0's
    # doc when it also survived the lexical stages; either way the
    # component keeps exactly its minimum surviving id
    if 0 in near_ids:
        assert BASE + 10 not in ids and BASE + 11 not in ids
    else:
        assert BASE + 10 in ids and BASE + 11 not in ids
    # a doc WITHOUT an embedding row survives the stage untouched
    assert BASE + 12 in ids


def test_mix_sampling_rates(run, spark, sf_dir):
    docs, stages, _ = run
    sampled = curate(
        _planted_docs(spark, sf_dir),
        mix_rates={"en": 1.00, "es": 0.50},
    )["sampled"]
    langs_kept = {r["lang"] for r in sampled.select("lang").distinct().collect()}
    # en keeps everything, es keeps ~half, other langs drop to zero
    assert "en" in langs_kept
    assert not langs_kept - {"en", "es"}
    n_es_in = stages["semantic"].filter(F.col("lang") == "es").count()
    n_es_kept = sampled.filter(F.col("lang") == "es").count()
    assert 0 < n_es_kept < n_es_in


def test_packing_budget_and_determinism(run, spark, sf_dir):
    _, stages, _ = run
    packed = stages["packed"]
    # within every (lang, pack) bin, the token sum stays under budget
    # except possibly via the single doc that crosses the boundary (the
    # exclusive-prefix rule: a pack's prior sum is < budget when its last
    # doc is admitted)
    agg = (
        packed.groupBy("lang", "pack_id")
        .agg(F.sum("n_tokens_packed").alias("tok"), F.max("n_tokens_packed").alias("mx"))
        .collect()
    )
    for row in agg:
        assert row["tok"] - row["mx"] < 2048, row
    # byte-identical decisions on re-run (determinism contract): a FRESH
    # curate() over the same input — not a re-collect of the same lazy
    # plan, which would miss plan-construction nondeterminism
    rebuilt = curate(
        _planted_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        source_col="lang",
    )["packed"]
    again = rebuilt.select("doc_id", "pack_id").collect()
    first = packed.select("doc_id", "pack_id").collect()
    assert sorted(first) == sorted(again)


def test_mix_keep_rate_one_keeps_everything(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    kept = docs.filter(mix_keep("doc_id", "lang", {"en": 1.0}))
    assert kept.count() == docs.filter(F.col("lang") == "en").count()


def test_mix_keep_is_independent_of_holdout_split(spark, sf_dir):
    """The round-4 review catch: an UNSALTED mix hash would make a 12.5%
    keep-rate select exactly the holdout-val prefix range (same md5, same
    compare). With the salt, the kept set's val share must track the
    corpus-wide ~1/8, not collapse to 0% or 100%."""
    from beeper_matric_etl_tool_spark.plans.catalog_ext import holdout_split

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", holdout_split().alias("split")
    )
    kept = docs.filter(mix_keep("doc_id", "lang", {"en": 0.125}))
    n = kept.count()
    n_val = kept.filter(F.col("split") == "val").count()
    assert n > 0
    # unsalted failure mode: n_val == n (all kept docs are val). Salted,
    # the val share stays in a loose band around 1/8.
    assert 0 < n_val < n
    assert n_val / n < 0.5


def test_pack_by_budget_shuffle_differs_from_id_order(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n")
    )
    shuffled = pack_by_budget(docs, "n", partition_cols=("lang",), shuffle=True)
    plain = pack_by_budget(docs, "n", partition_cols=("lang",), shuffle=False)
    a = {(r["doc_id"], r["pack_id"]) for r in shuffled.collect()}
    b = {(r["doc_id"], r["pack_id"]) for r in plain.collect()}
    assert a != b  # the pseudo-random order actually changes the packing


def test_catalyst_cache_boundary_shapes_hold(spark, sf_dir):
    """Regression canary for the round-4 Catalyst plan-normalization
    failure (java.util.NoSuchElementException: 'key not found: text#N'
    raised from localCheckpoint's eager plan compilation on the
    quality+PII funnel when the scrub stage was built with a
    self-referencing withColumns, and from persisting the exact-dedup
    stage instead of the scrub stage). curate() ships the workaround —
    select/drop/rename construction + persist() one stage LOWER
    (ext/pipeline.py, the '(Persisting `exact` instead…' comment).

    Both historically-failing constructions are exercised here directly:
    on the shipped Spark version they pass; if a Spark upgrade regresses
    plan normalization again, this test fails first and names the
    workaround."""
    from beeper_matric_etl_tool_spark.ext.dedup import exact_dedup
    from beeper_matric_etl_tool_spark.ext.quality import (
        pii_columns,
        quality_signal_columns,
        quality_verdict_columns,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    signals = quality_signal_columns("text")
    quality = docs.select(
        "*", *[c.alias(n) for n, c in signals.items()]
    ).select("*", *[c.alias(n) for n, c in quality_verdict_columns().items()])
    pii = pii_columns("text")

    # shape 1: self-referencing withColumns (text := f(text)) + eager
    # localCheckpoint — the original 'key not found: text#N' trigger
    with_cols = quality.filter(F.col("keep")).withColumns(
        {
            "text": pii["scrubbed"],
            "n_emails": pii["n_emails"],
            "n_digit_runs": pii["n_digit_runs"],
        }
    )
    cp = with_cols.localCheckpoint(eager=True)
    n_kept = cp.count()
    assert n_kept > 0
    cp.unpersist()

    # shape 2: cache placed one stage HIGHER than curate() ships it
    # (persist on exact-dedup instead of on the scrub stage)
    exact = exact_dedup(with_cols).persist()
    try:
        assert exact.count() <= n_kept
    finally:
        exact.unpersist()


def test_stage_report_single_pass_matches_per_stage(run):
    """The one-job union/groupBy report returns the same funnel counts as
    the one-action-per-stage form (including zero-count stages, which
    produce no group row and must be reported explicitly)."""
    _, stages, report = run
    assert stage_report(stages, single_pass=True) == report


def test_curate_release_unpersists_and_is_idempotent(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    stages = curate(docs)
    scrubbed = stages["scrubbed"]
    scrubbed.count()
    assert scrubbed.storageLevel.useMemory or scrubbed.storageLevel.useDisk
    stages.release()
    assert not (scrubbed.storageLevel.useMemory or scrubbed.storageLevel.useDisk)
    stages.release()  # idempotent

    # context-manager form
    with curate(docs) as ctx_stages:
        frame = ctx_stages["scrubbed"]
        frame.count()
    assert not (frame.storageLevel.useMemory or frame.storageLevel.useDisk)


def test_curate_rejects_reserved_column_collisions(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", F.lit(1).alias("n_tokens")
    )
    with pytest.raises(ValueError, match="n_tokens"):
        curate(docs)


def test_export_corpus_single_action_audit(spark, sf_dir, tmp_path):
    """export_corpus writes the packed corpus in the index layout and its
    observed audit counts the exact rows written — one job, no separate
    count pass."""
    import os

    from beeper_matric_etl_tool_spark.ext.pipeline import export_corpus

    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    with curate(docs) as stages:
        path = str(tmp_path / "corpus")
        audit = export_corpus(stages, path)
        n_packed = stages["packed"].count()
    assert audit["rows"] == n_packed
    assert audit["total_tokens"] > 0
    back = spark.read.parquet(path)
    assert back.count() == n_packed
    # hive partitions on the pack partition key
    assert any(d.startswith("lang=") for d in os.listdir(path))
    # audit tokens equal the written tokens
    assert audit["total_tokens"] == back.agg(F.sum("n_tokens_packed")).first()[0]


def test_quality_gate_scores_stopwords_per_language(spark):
    """The per-language stopword floor (round-5 verdict gap #5): a
    Spanish document with zero ENGLISH function words but plenty of
    Spanish ones flips from dropped (legacy English-only scoring) to
    kept (per-language scoring); unknown/NULL languages fall back to the
    English inventory; curate() refuses a named-but-missing lang_col."""
    from beeper_matric_etl_tool_spark.ext.quality import (
        quality_signal_columns,
        quality_verdict_columns,
    )

    # 54 distinct content words + 6 Spanish stopwords: n_tokens=60,
    # TTR=100%, distinct shingles, mean token length ~7.3 chars — every
    # rule passes EXCEPT the stopword floor under the English inventory
    es_text = " ".join([f"palabra{i}" for i in range(54)] + ["el", "la", "de", "que", "un", "por"])
    docs = spark.createDataFrame(
        [(1, "es", es_text), (2, "en", es_text), (3, "it", es_text), (4, None, es_text)],
        "doc_id long, lang string, text string",
    )

    def verdicts(lang_col):
        signals = quality_signal_columns("text", lang_col=lang_col)
        out = docs.select(
            "doc_id", *[c.alias(n) for n, c in signals.items()]
        ).select("doc_id", "stop_hits", *[
            c.alias(n) for n, c in quality_verdict_columns().items()
        ])
        return {r["doc_id"]: r for r in out.collect()}

    by_lang = verdicts("lang")
    # the Spanish doc is scored against ITS inventory: 6 hits, kept
    assert by_lang[1]["stop_hits"] == 6 and by_lang[1]["keep"]
    # the same text labeled en scores 0 English hits: dropped
    assert by_lang[2]["stop_hits"] == 0 and not by_lang[2]["keep"]
    # unknown and NULL langs fall back to the English inventory
    assert by_lang[3]["stop_hits"] == 0 and by_lang[4]["stop_hits"] == 0

    # legacy English-only scoring drops doc 1 — the flip this test plants
    legacy = verdicts(None)
    assert legacy[1]["stop_hits"] == 0 and not legacy[1]["keep"]

    # the curate() wiring: per-language by default, loud when lang_col
    # names a column the input doesn't have
    kept = {
        r["doc_id"]
        for r in curate(docs.fillna({"lang": "xx"}), source_col="lang")["quality"]
        .filter(F.col("keep"))
        .select("doc_id")
        .collect()
    }
    assert 1 in kept and 2 not in kept
    with pytest.raises(ValueError, match="lang_col"):
        curate(docs.drop("lang").withColumn("src", F.lit("a")), source_col="src")


def test_quality_gate_repetition_battery(spark):
    """Gopher's line/paragraph repetition rules on planted multi-line
    docs (the synthetic corpus has no newlines, so the driver row only
    pins the degenerate-zero case — THIS test is the non-degenerate
    evidence): a doc whose duplicate-LINE fraction crosses 0.30 is
    dropped by rep_line_ok even though every token-level rule passes
    (short repeated separator lines barely move TTR/dup3); a doc with a
    boilerplate paragraph repeated until it owns >20% of the character
    mass is dropped by the char-mass rule; and every signal/verdict
    matches a DuckDB replay of the ORACLE's own CTE fragments
    (plans/catalog_ext._quality_signal_cte_sql), so the SQL the driver
    hashes is exercised on non-degenerate data too."""
    import duckdb

    from beeper_matric_etl_tool_spark.ext.quality import (
        quality_signal_columns,
        quality_verdict_columns,
    )
    from beeper_matric_etl_tool_spark.plans.catalog_ext import (
        _quality_signal_cte_sql,
        _quality_verdict_cte_sql,
    )

    # 6 unique 10-word lines (60 distinct tokens, stopwords included)
    uniq_lines = [
        " ".join(
            ["the", "of", f"w{i}a", f"w{i}b", f"w{i}c", f"w{i}d",
             f"w{i}e", f"w{i}f", f"w{i}g", f"w{i}h"]
        )
        for i in range(6)
    ]
    # doc 1: clean multi-line (6 distinct lines, 2 distinct paragraphs)
    clean = "\n".join(uniq_lines[:3]) + "\n\n" + "\n".join(uniq_lines[3:])
    # doc 2: the same six content lines + six copies of a short separator
    # line -> 12 lines, 7 distinct: dup_line_ppm = 5/12 = 416_666 (> 300k,
    # count rule fires) while the separator's chars are a sliver of the
    # mass (char rule passes) and token rules all still pass
    sep_heavy = "\n".join(
        line for pair in zip(uniq_lines, ["sep1x"] * 6) for line in pair
    )
    # doc 3: a long boilerplate footer paragraph repeated 3x after one
    # unique paragraph -> 2 of 4 paragraphs are duplicates (500_000 ppm)
    # and the footer's repeats own far more than 20% of the char mass
    footer = " ".join(uniq_lines[:2])
    boiler = "\n\n".join(["\n".join(uniq_lines[2:]), footer, footer, footer])
    # doc 4: phrase spam — one stopword-led bigram scattered through
    # otherwise-unique filler: 20 of 60 bigram positions are 'the data'
    # (333_333 ppm > the 200_000 top-2-gram ceiling) while TTR, the
    # duplicate-3-gram rule (no two consecutive positions repeat a
    # 3-gram: each filler word is unique) and every other rule pass
    phrase_spam = " ".join(
        w for i in range(20) for w in (f"filler{i:02d}x", "the", "data")
    ) + " lastword"
    # docs 5-8: the round-7 format battery, one sole-kill each.
    # doc 5: every line bullet-led (fraction 1.0 > the 0.90 ceiling);
    # lines distinct, stopword-bearing, 50+ tokens, no digits
    bullets = "\n".join(f"- the item w{i}a w{i}b w{i}c w{i}d" for i in range(10))
    # doc 6: 3 of 6 lines END with an ellipsis (500_000 > 300_000)
    ellipsis = "\n".join(
        line + ("..." if i % 2 == 0 else "")
        for i, line in enumerate(uniq_lines)
    )
    # doc 7: symbol soup — one '#' token per 6 words (166_666 > 100_000);
    # the '#' tokens are single-char words, so mean length stays in band
    # via long filler words
    symbols = " ".join(
        w for i in range(12) for w in (f"wordier{i:02d}x", "the", "of",
                                       f"lengthy{i:02d}y", f"filler{i:02d}z", "#")
    )
    # doc 8: ~a third of the words carry no letter (alpha < 800_000);
    # '::' neighbors are all-distinct words so no bigram repeats, and a
    # leading stopword pair satisfies the floor
    nonalpha = "the of " + " ".join(
        w
        for i in range(20)
        for w in (f"va{chr(97 + i)}lpha", "::", f"vb{chr(97 + i)}ravo")
    )
    docs = spark.createDataFrame(
        [(1, "en", clean), (2, "en", sep_heavy), (3, "en", boiler),
         (4, "en", phrase_spam), (5, "en", bullets), (6, "en", ellipsis),
         (7, "en", symbols), (8, "en", nonalpha)],
        "doc_id long, lang string, text string",
    )

    signals = quality_signal_columns("text", lang_col="lang")
    out = docs.select(
        "doc_id", "lang", "text",
        *[c.alias(n) for n, c in signals.items()],
    ).select("*", *[c.alias(n) for n, c in quality_verdict_columns().items()])
    rows = {r["doc_id"]: r for r in out.collect()}

    assert rows[1]["dup_line_ppm"] == 0 and rows[1]["dup_para_ppm"] == 0
    assert rows[1]["keep"], rows[1]

    r2 = rows[2]
    assert r2["dup_line_ppm"] == 416_666  # 5 dup of 12 lines
    assert r2["dup_line_char_ppm"] <= 200_000  # sliver of the mass
    assert not r2["rep_line_ok"] and not r2["keep"]
    # the flip is ISOLATED to the new rule: every legacy rule passes
    assert all(r2[k] for k in ("len_ok", "ttr_ok", "rep_ok", "stop_ok", "avglen_ok"))

    r3 = rows[3]
    assert r3["dup_para_ppm"] == 500_000  # 2 dup of 4 paragraphs
    assert r3["dup_para_char_ppm"] > 200_000  # footer owns the mass
    assert not r3["rep_para_ok"] and not r3["keep"]

    r4 = rows[4]
    assert r4["top2gram_ppm"] == 333_333  # 20 'the data' of 60 positions
    assert not r4["top2_ok"] and not r4["keep"]
    # the flip is ISOLATED to the top-2-gram rule
    assert all(
        r4[k]
        for k in ("len_ok", "ttr_ok", "rep_ok", "stop_ok", "avglen_ok",
                  "rep_line_ok", "rep_para_ok")
    )

    legacy = ("len_ok", "ttr_ok", "rep_ok", "stop_ok", "avglen_ok",
              "rep_line_ok", "rep_para_ok", "top2_ok")
    r5 = rows[5]
    assert r5["bullet_line_ppm"] == 1_000_000
    assert not r5["bullet_ok"] and not r5["keep"]
    assert all(r5[k] for k in legacy + ("symbol_ok", "ellipsis_ok", "alpha_ok"))
    r6 = rows[6]
    assert r6["ellipsis_line_ppm"] == 500_000
    assert not r6["ellipsis_ok"] and not r6["keep"]
    assert all(r6[k] for k in legacy + ("symbol_ok", "bullet_ok", "alpha_ok"))
    r7 = rows[7]
    assert r7["symbol_ppm"] == 166_666  # 12 '#' of 72 words
    assert not r7["symbol_ok"] and not r7["keep"]
    assert all(r7[k] for k in legacy + ("bullet_ok", "ellipsis_ok", "alpha_ok"))
    r8 = rows[8]
    assert r8["alpha_word_ppm"] == 677_419  # 42 lettered of 62 words
    assert not r8["alpha_ok"] and not r8["keep"]
    assert all(r8[k] for k in legacy + ("symbol_ok", "bullet_ok", "ellipsis_ok"))
    # the clean doc passes the whole new battery too
    assert all(rows[1][k] for k in ("symbol_ok", "bullet_ok", "ellipsis_ok", "alpha_ok"))

    # cross-engine: replay the ORACLE's own CTE fragments in DuckDB on
    # the same planted docs and compare every signal + verdict
    con = duckdb.connect()
    con.register(
        "planted",
        out.select("doc_id", "lang", "text").toPandas(),
    )
    sql = f"""
        WITH {_quality_signal_cte_sql("planted")},
        {_quality_verdict_cte_sql()}
        SELECT * FROM v ORDER BY doc_id
    """
    rel = con.sql(sql)
    names = [d[0] for d in rel.description]
    for orc in rel.fetchall():
        o = dict(zip(names, orc))
        s = rows[o["doc_id"]]
        for col in (
            "n_tokens", "ttr_ppm", "dup3_ppm", "stop_hits", "mean_len_x100",
            "dup_line_ppm", "dup_line_char_ppm", "dup_para_ppm",
            "dup_para_char_ppm", "top2gram_ppm", "symbol_ppm",
            "bullet_line_ppm", "ellipsis_line_ppm", "alpha_word_ppm",
            "len_ok", "ttr_ok", "rep_ok", "stop_ok", "avglen_ok",
            "rep_line_ok", "rep_para_ok", "top2_ok", "symbol_ok",
            "bullet_ok", "ellipsis_ok", "alpha_ok", "keep",
        ):
            assert s[col] == o[col], (o["doc_id"], col, s[col], o[col])


def test_mix_epochs_upsampling(spark):
    """Temperature-style epoch upsampling (ext/pipeline.py:mix_epochs):
    integer rates replicate exactly; fractional rates give floor(rate)
    copies plus a deterministic hash-fraction extra; copy_id is a
    contiguous 0-based key; unknown sources emit zero copies; and the
    whole fan-out is rerun-deterministic (no engine RNG)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        epoch_copies,
        mix_epochs,
    )

    rates = {"a": 3.0, "b": 1.5, "c": 0.5}
    docs = spark.createDataFrame(
        [(i, ("a", "b", "c", "zz")[i % 4]) for i in range(400)],
        "doc_id long, source string",
    )
    out = mix_epochs(docs, rates).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_id"])

    n_copies = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", epoch_copies("doc_id", "source", rates).alias("n")
        ).collect()
    }
    for did, cids in by_doc.items():
        assert sorted(cids) == list(range(len(cids)))  # contiguous 0-based
        assert len(cids) == n_copies[did]  # explode matches the formula

    src = {i: ("a", "b", "c", "zz")[i % 4] for i in range(400)}
    # integer rate: exactly 3 copies, every doc
    assert all(len(by_doc[i]) == 3 for i in range(400) if src[i] == "a")
    # fractional 1.5: every doc 1 or 2 copies, and BOTH occur
    b_counts = {len(by_doc[i]) for i in range(400) if src[i] == "b"}
    assert b_counts == {1, 2}
    # 0.5: zero-copy docs vanish from the exploded output, kept docs = 1
    c_kept = [i for i in range(400) if src[i] == "c" and i in by_doc]
    assert 0 < len(c_kept) < 100 and all(len(by_doc[i]) == 1 for i in c_kept)
    # unknown source: dropped entirely
    assert all(i not in by_doc for i in range(400) if src[i] == "zz")

    # deterministic: a rerun reproduces the exact (doc_id, copy_id) set
    again = {
        (r["doc_id"], r["copy_id"]) for r in mix_epochs(docs, rates).collect()
    }
    assert again == {(r["doc_id"], r["copy_id"]) for r in out}


def test_sample_quota_exact_counts_and_determinism(spark):
    """Quota semantics end to end: exact counts where the stratum is big
    enough, clamp where it is not, loud zero for unlisted strata,
    input-order independence, and top-N-of-hash-order displacement."""
    rows = [(i, "en") for i in range(40)] + [(100 + i, "fr") for i in range(3)] + [
        (200, "zz")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    quotas = {"en": 10, "fr": 25}

    out = sample_quota(docs, quotas).collect()
    by_lang: dict[str, set[int]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # exact where possible, clamped where not, zero where unlisted
    assert len(by_lang["en"]) == 10
    assert by_lang["fr"] == {100, 101, 102}
    assert "zz" not in by_lang

    # input order cannot change membership (hash rank, not row order)
    reordered = spark.createDataFrame(
        list(reversed(rows)), "doc_id long, lang string"
    )
    again = {
        (r["lang"], r["doc_id"]) for r in sample_quota(reordered, quotas).collect()
    }
    assert again == {(r["lang"], r["doc_id"]) for r in out}

    # displacement: growing the stratum re-ranks — the sample is the
    # top-N of the hash order over the NEW corpus, so it is either
    # unchanged or swaps members one-for-one (never exceeds the quota)
    grown = spark.createDataFrame(
        rows + [(1000 + i, "en") for i in range(40)], "doc_id long, lang string"
    )
    grown_en = {
        r["doc_id"]
        for r in sample_quota(grown, quotas).collect()
        if r["lang"] == "en"
    }
    assert len(grown_en) == 10
    # the original members that survive keep their identity (hash order
    # is stable per doc); any displaced ones were displaced BY new docs
    assert grown_en - by_lang["en"] <= {1000 + i for i in range(40)}


def test_curate_optional_span_and_fluency_stages(spark):
    """Opt-in despanned + fluent stages: the shared footer is cut from
    every doc but its canonical (lowest doc,pos) copy BEFORE exact
    dedup; the perplexity ceiling drops a gibberish doc; stage keys
    appear only when enabled and in funnel order; the default call's
    stage keys are unchanged. Bodies are DISTINCT per doc (identical
    bodies would themselves be duplicate spans — that behavior is
    test_remove_duplicate_spans' subject) and the gibberish is
    digit-free (the PII scrub runs first and digit redaction would
    collapse distinct tokens into one repeated token)."""
    from beeper_matric_etl_tool_spark.ext.search import unigram_nll_scores

    common = "subscribe now to get all the updates you ever wanted"

    def mk_body(d: int) -> str:
        # per-doc-unique DIGIT-FREE filler alternating with stopwords:
        # no 5-gram is shared between two bodies, every quality rule
        # passes, and the PII digit-run redaction (which runs before the
        # span stage and would collapse numbered fillers into one
        # repeated token) has nothing to rewrite
        az = "abcdefghijklmnopqrstuvwxyz"
        return " ".join(
            f"w{az[d]}{az[i // 26]}{az[i % 26]}fill {'the' if i % 2 else 'of'}"
            for i in range(30)
        )

    bodies = {1: mk_body(1), 2: mk_body(2), 3: mk_body(3)}
    gibberish = "the and " + " ".join(
        f"zq{chr(97 + i % 26)}xj{chr(97 + (i * 7) % 26)}w{chr(97 + (i * 11) % 26)}"
        for i in range(70)
    )
    docs = spark.createDataFrame(
        [
            (1, "en", f"{bodies[1]} {common}"),
            (2, "en", f"{common} {bodies[2]}"),
            (3, "en", bodies[3]),
            (4, "en", gibberish),
        ],
        "doc_id long, lang string, text string",
    )

    base = curate(docs, persist_intermediates=False)
    assert "despanned" not in base and "fluent" not in base
    assert {r["doc_id"] for r in base["quality"].filter("keep").collect()} == {
        1, 2, 3, 4
    }

    # pick the NLL ceiling from the post-span corpus itself: midway
    # between the fluent docs' worst score and the gibberish score (the
    # mechanism under test is the cut, not a universal constant)
    # checkpoint_stages: value assertions only — cuts the re-embedded
    # funnel composition cost (r14 suite-wall fix, semantics unchanged)
    probe = curate(
        docs, persist_intermediates=False, span_k=5, checkpoint_stages=True
    )
    scores = {
        r["doc_id"]: r["score_ppm"]
        for r in unigram_nll_scores(probe["despanned"]).collect()
    }
    assert set(scores) == {1, 2, 3, 4}
    assert scores[4] > max(scores[d] for d in (1, 2, 3))
    ceiling = (scores[4] + max(scores[d] for d in (1, 2, 3))) // 2

    stages = curate(
        docs,
        persist_intermediates=False,
        span_k=5,
        max_nll_ppm=int(ceiling),
        checkpoint_stages=True,
    )
    keys = list(stages.keys())
    assert keys.index("scrubbed") < keys.index("despanned") < keys.index(
        "fluent"
    ) < keys.index("exact")

    desp = {r["doc_id"]: r for r in stages["despanned"].collect()}
    # canonical copy = argmin (doc_id, pos) -> doc 1 keeps its footer
    assert desp[1]["n_span_tokens_removed"] == 0
    assert desp[2]["n_span_tokens_removed"] == 10
    assert desp[2]["text"] == bodies[2]
    assert desp[3]["n_span_tokens_removed"] == 0

    fluent_ids = {r["doc_id"] for r in stages["fluent"].select("doc_id").collect()}
    assert 4 not in fluent_ids  # gibberish exceeded the NLL ceiling
    assert fluent_ids == {1, 2, 3}
    # survivors carry the audit score, equal to the standalone scorer's
    fl = {r["doc_id"]: r["nll_ppm"] for r in stages["fluent"].collect()}
    assert fl == {d: scores[d] for d in fl}

    # downstream stages flow from the fluent survivors
    exact_ids = {r["doc_id"] for r in stages["exact"].select("doc_id").collect()}
    assert exact_ids == {1, 2, 3}


def test_pack_first_fit_decreasing(spark):
    """FFD beats arrival-order packing on the classic adversarial
    arrival [2,6,5,4,3] (budget 10): 2 bins at zero waste vs 3; no bin
    ever exceeds the budget; oversize docs get flagged singletons;
    deterministic across reruns; sharding keeps bins under budget."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        pack_first_fit_decreasing,
        packing_waste,
    )

    docs = spark.createDataFrame(
        [(1, 2), (2, 6), (3, 5), (4, 4), (5, 3)], "doc_id long, n long"
    )
    out = pack_first_fit_decreasing(
        docs, "n", budget=10, partition_cols=(), allow_single_partition=True
    ).collect()
    by_key: dict[str, int] = {}
    for r in out:
        by_key[r["pack_key"]] = by_key.get(r["pack_key"], 0) + r["n"]
        assert not r["pack_oversize"]
    assert len(by_key) == 2 and all(v == 10 for v in by_key.values())
    audit = packing_waste(
        pack_first_fit_decreasing(
            docs, "n", budget=10, allow_single_partition=True
        ), "n", 10
    )
    assert audit == {"n_packs": 2, "total_tokens": 20, "waste_ppm": 0}

    # oversize doc: flagged singleton, counts its own fill as capacity
    big = spark.createDataFrame([(9, 25), (10, 4)], "doc_id long, n long")
    bout = pack_first_fit_decreasing(
        big, "n", budget=10, allow_single_partition=True
    ).collect()
    flags = {r["doc_id"]: r["pack_oversize"] for r in bout}
    assert flags == {9: True, 10: False}
    baudit = packing_waste(
        pack_first_fit_decreasing(big, "n", budget=10, allow_single_partition=True),
        "n", 10,
    )
    assert baudit["n_packs"] == 2 and baudit["total_tokens"] == 29
    # capacity = 25 (oversize fill) + 10 = 35 -> waste 6/35
    assert baudit["waste_ppm"] == (1_000_000 * 6) // 35

    # determinism + sharding: same docs, 3 shards -> every bin still
    # under budget and rerun-identical
    many = spark.createDataFrame(
        [(i, 1 + (i * 7) % 9) for i in range(60)], "doc_id long, n long"
    )
    a = sorted(
        tuple(r)
        for r in pack_first_fit_decreasing(many, "n", budget=10, n_shards=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in pack_first_fit_decreasing(many, "n", budget=10, n_shards=3).collect()
    )
    assert a == b
    fills: dict[str, int] = {}
    for r in pack_first_fit_decreasing(many, "n", budget=10, n_shards=3).collect():
        fills[r["pack_key"]] = fills.get(r["pack_key"], 0) + r["n"]
    assert all(v <= 10 for v in fills.values())


def test_pack_ffd_zero_token_doc_never_joins_oversize_bin(spark):
    from beeper_matric_etl_tool_spark.ext.pipeline import pack_first_fit_decreasing

    docs = spark.createDataFrame(
        [(1, 30), (2, 0)], "doc_id long, n long"
    )
    out = {
        r["doc_id"]: r
        for r in pack_first_fit_decreasing(
            docs, "n", budget=10, allow_single_partition=True
        ).collect()
    }
    assert out[1]["pack_oversize"] and not out[2]["pack_oversize"]
    assert out[1]["pack_key"] != out[2]["pack_key"]


def test_pack_ffd_escapes_separator_in_partition_values(spark):
    from beeper_matric_etl_tool_spark.ext.pipeline import pack_first_fit_decreasing

    docs = spark.createDataFrame(
        [(1, 9, "a"), (2, 9, "a|0")], "doc_id long, n long, src string"
    )
    out = pack_first_fit_decreasing(
        docs, "n", budget=10, partition_cols=("src",)
    ).collect()
    keys = {r["doc_id"]: r["pack_key"] for r in out}
    assert keys[1] != keys[2]
    assert "%7C" in keys[2]


def test_curate_fluent_stage_accepts_frozen_reference(spark, sf_dir):
    """nll_reference routes the fluent stage through the frozen-model
    scorer: the same doc keeps/drops identically whatever its batchmates
    are, and the stage still composes lazily."""
    from beeper_matric_etl_tool_spark.ext.search import unigram_nll_scores

    ref = table(spark, sf_dir, "documents")
    az = "abcdefghijklmnopqrstuvwxyz"
    filler = " ".join(
        f"w{az[i // 26]}{az[i % 26]}fill {'the' if i % 2 else 'of'}"
        for i in range(30)
    )
    docs = spark.createDataFrame(
        [(1, "en", filler)], "doc_id long, lang string, text string"
    )
    score = unigram_nll_scores(docs, reference=ref).first()["score_ppm"]
    kept = curate(
        docs, persist_intermediates=False,
        max_nll_ppm=score + 1, nll_reference=ref,
    )["fluent"].collect()
    dropped = curate(
        docs, persist_intermediates=False,
        max_nll_ppm=score - 1, nll_reference=ref,
    )["fluent"].collect()
    assert [r["doc_id"] for r in kept] == [1] and kept[0]["nll_ppm"] == score
    assert dropped == []


def test_quality_rule_ablation(spark):
    """Ablation accounting: a doc failing ONLY the length floor is a
    sole failure of len_ok; a doc failing two rules is a sole failure of
    neither; a clean doc counts nowhere. Counts are consistent with the
    verdict battery itself."""
    from beeper_matric_etl_tool_spark.ext.quality import quality_rule_ablation

    az = "abcdefghijklmnopqrstuvwxyz"
    good = " ".join(
        f"w{az[i // 26]}{az[i % 26]}fill {'the' if i % 2 else 'of'}"
        for i in range(30)
    )
    short_only = "the of small doc here now"  # fails len_ok alone
    # fails len_ok AND stop_ok (no stopwords): sole failure of neither
    short_nostop = " ".join(f"q{az[i]}zz" for i in range(6))
    docs = spark.createDataFrame(
        [(1, "en", good), (2, "en", short_only), (3, "en", short_nostop)],
        "doc_id long, lang string, text string",
    )
    rows = {r["rule"]: r for r in quality_rule_ablation(docs).collect()}
    assert rows["len_ok"]["n_failing"] == 2
    assert rows["len_ok"]["n_sole_failure"] == 1
    assert rows["len_ok"]["recovered_ppm"] == 333_333
    assert rows["stop_ok"]["n_failing"] == 1
    assert rows["stop_ok"]["n_sole_failure"] == 0
    assert all(r["n_sole_failure"] <= r["n_failing"] for r in rows.values())


def test_normalize_stage_collapses_byte_variants(spark):
    """curate()'s default normalization stage is what makes byte-variant
    copies (NBSP separator, doubled space) of one document collapse at
    EXACT dedup; with normalize=False their fingerprints differ and both
    variants sail past the exact stage — the precise failure the stage
    exists to prevent."""
    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines "
        "under a wide sky full of bright and patient little stars"
    )
    nbsp_variant = good.replace(" dog ", " dog ")
    dspace_variant = good.replace("the quick", "the  quick")
    docs = spark.createDataFrame(
        [
            (BASE + 50, "en", good),
            (BASE + 51, "en", nbsp_variant),
            (BASE + 52, "en", dspace_variant),
        ],
        "doc_id long, lang string, text string",
    )
    ids = {BASE + 50, BASE + 51, BASE + 52}

    on = curate(docs, persist_intermediates=False)
    exact_on = {r[0] for r in on["exact"].select("doc_id").collect()} & ids
    assert exact_on == {BASE + 50}, exact_on

    off = curate(docs, persist_intermediates=False, normalize=False)
    exact_off = {r[0] for r in off["exact"].select("doc_id").collect()} & ids
    assert exact_off == ids, exact_off


def test_pack_ffd_refuses_silent_single_task(spark):
    """The empty-partition_cols/n_shards=1 default would ship the whole
    corpus to one applyInPandas task — same fail-loud contract as
    pack_by_budget (guard parity pinned here)."""
    import pytest as _pytest

    from beeper_matric_etl_tool_spark.ext.pipeline import pack_first_fit_decreasing

    docs = spark.createDataFrame([(1, 2)], "doc_id long, n long")
    with _pytest.raises(ValueError, match="SINGLE applyInPandas task"):
        pack_first_fit_decreasing(docs, "n", budget=10)
    # each escape hatch lifts the guard
    assert pack_first_fit_decreasing(docs, "n", budget=10, n_shards=2).count() == 1
    assert (
        pack_first_fit_decreasing(
            docs, "n", budget=10, allow_single_partition=True
        ).count()
        == 1
    )


def test_sample_quota_two_phase_equivalence_and_bounded_final_sort(spark, sf_dir):
    """two_phase=True returns IDENTICAL rows to the single-window form
    (the global top-quota is contained in the union of per-partition
    top-quotas) under several input partitionings, and the plan shows
    the refinement shape: a local rank filter BELOW the global window,
    so the final sort input is candidate-bounded instead of
    stratum-sized."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    quotas = {"en": 7, "es": 3, "zh": 0}
    base = {
        tuple(r)
        for r in sample_quota(docs, quotas).select("doc_id", "lang").collect()
    }
    assert sum(1 for _, l in base if l == "en") == 7
    for parts in (1, 3, 13):
        got = {
            tuple(r)
            for r in sample_quota(
                docs.repartition(parts), quotas, two_phase=True
            )
            .select("doc_id", "lang")
            .collect()
        }
        assert got == base, parts

    plan = sample_quota(docs, quotas, two_phase=True)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window") >= 2
    assert "__quota_lrk" in plan
    # the single-phase plan has exactly one window and no local rank
    plan1 = sample_quota(docs, quotas)._jdf.queryExecution().optimizedPlan().toString()
    assert "__quota_lrk" not in plan1


def test_curate_deboilerplate_stage(spark):
    """boilerplate_min_docs wires remove_boilerplate_paragraphs into the
    funnel between scrub and despan/dedup: the shared footer paragraph
    vanishes from every carrier while their distinct bodies (below the
    distinct-doc floor) survive untouched; a doc that was ONLY
    boilerplate empties and drops; the cleaned text — not the raw
    text — feeds exact dedup."""
    bodyA = (
        "a wholly distinct first body that carries enough words to pass "
        "the quality gate with room to spare because its token count "
        "comfortably clears the configured minimum for the battery and "
        "the stopword floor is satisfied by the usual function words of "
        "the language that appear throughout this running text"
    )
    bodyB = bodyA.replace("first", "second").replace("wholly", "plainly")
    bodyC = bodyA.replace("first", "third").replace("wholly", "deeply")
    # the two-paragraph footer also pins that the pass counts DISTINCT
    # docs (it rides 3 carriers + the footer-only doc = df 4 >= 3)
    footer = "shared footer all rights reserved by the site operator"
    docs = spark.createDataFrame(
        [
            (BASE + 60, "en", bodyA + "\n\n" + footer),
            (BASE + 61, "en", bodyB + "\n\n" + footer),
            (BASE + 62, "en", bodyC + "\n\n" + footer),
            (BASE + 63, "en", footer),
        ],
        "doc_id long, lang string, text string",
    )
    stages = curate(
        docs, boilerplate_min_docs=3, persist_intermediates=False
    )
    deb = {r["doc_id"]: r for r in stages["deboilerplated"].collect()}
    # footer-only doc dropped (emptied); carriers cleaned; each distinct
    # body is below the floor (df 1) and survives untouched
    assert set(deb) == {BASE + 60, BASE + 61, BASE + 62}
    assert deb[BASE + 60]["text"] == bodyA
    assert deb[BASE + 61]["text"] == bodyB
    assert deb[BASE + 62]["text"] == bodyC
    assert all(deb[d]["n_boilerplate_paras_removed"] == 1 for d in deb)
    # the cleaned texts flow into the dedup stages — all three distinct
    # bodies survive exact dedup
    exact_ids = {r[0] for r in stages["exact"].select("doc_id").collect()}
    assert {BASE + 60, BASE + 61, BASE + 62} <= exact_ids


def test_empty_rate_maps_short_circuit(spark):
    """Empty rates/quotas dicts must not build VOID-typed maps: mix_keep
    drops everything, epoch_copies emits zero copies, sample_quota
    returns the typed empty frame."""
    from beeper_matric_etl_tool_spark.ext.pipeline import epoch_copies

    docs = spark.createDataFrame(
        [(1, "en"), (2, "es")], "doc_id long, lang string"
    )
    assert docs.filter(mix_keep("doc_id", "lang", {})).count() == 0
    copies = docs.select(
        epoch_copies("doc_id", "lang", {}).alias("n")
    ).collect()
    assert all(r["n"] == 0 for r in copies)
    out = sample_quota(docs, {})
    assert out.count() == 0 and out.columns == docs.columns


def test_split_by_cluster_is_leakage_safe(spark):
    """Leakage-safe holdout: every document in a near-dup cluster gets
    the SAME split (keyed on the cluster id), docs absent from the
    labeling fall back to singleton clusters, and the assignment is
    independent of the per-doc holdout hash (a doc's split can differ
    from what the unsalted per-doc hash would choose)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        CLUSTER_SPLIT_SALT,
        split_by_cluster,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    # clusters: docs 0..99 pair up (0,1)->0, (2,3)->2, ...; 100..149
    # labeled singletons; 150..199 ABSENT from the labeling entirely
    clusters = spark.createDataFrame(
        [(i, (i // 2) * 2) for i in range(100)]
        + [(i, i) for i in range(100, 150)],
        "doc_id long, cluster_id long",
    )
    out = split_by_cluster(docs, clusters)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # same cluster -> same split, cluster ids as labeled
    for i in range(0, 100, 2):
        assert rows[i]["cluster_id"] == rows[i + 1]["cluster_id"] == i
        assert rows[i]["split"] == rows[i + 1]["split"]
    # absent docs become singletons of themselves
    for i in range(150, 200):
        assert rows[i]["cluster_id"] == i
    # both splits occur (12.5% expected val over 150 distinct clusters)
    splits = {r["split"] for r in rows.values()}
    assert splits == {"train", "val"}
    # decision is the salted hash of the CLUSTER id — doc 1's split
    # follows cluster 0, regardless of doc 1's own hash
    import hashlib

    for i in (0, 1):
        h = hashlib.md5(f"0{CLUSTER_SPLIT_SALT}".encode()).hexdigest()
        expect = "val" if h[0] in ("0", "1") else "train"
        assert rows[i]["split"] == expect


def test_curate_classified_stage(spark):
    """curate(clf_weights=…): the learned filter runs after the heuristic
    gate on the gate's own signal columns — a trained model drops planted
    junk the fixed thresholds let through, survivors carry quality_prob,
    and the stage is deterministic given (weights, stats)."""
    from beeper_matric_etl_tool_spark.ext.classifier import (
        feature_stats,
        quality_features,
        standardize,
        train_logreg,
    )

    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines "
        "under a wide sky full of patient little stars"
    )
    # borderline junk: enough variety/stopwords to squeak past the fixed
    # gate, but measurably junkier than the good docs on the same signals
    junkish = (
        "buy the best deal now and buy the best offer now with the best "
        "price now for the best value now and the best deal now with the "
        "best offer now at the best price now for the best value now and "
        "the best deal now with the best offer now at the best price now"
    )
    goods = [(i, "en", good.replace("fox", w)) for i, w in
             enumerate(["fox", "hare", "deer", "crow", "wolf", "lynx"])]
    junks = [(100 + i, "en", junkish.replace("buy", w)) for i, w in
             enumerate(["buy", "get", "grab", "take"])]
    docs = spark.createDataFrame(
        goods + junks, "doc_id long, lang string, text string"
    )

    # train on labels: good=1, junk=0 (the seed-set shape)
    feats = quality_features("text", lang_col="lang")
    cols = list(feats)
    featured = docs.select(
        "doc_id",
        *[c.alias(k) for k, c in feats.items()],
        (F.col("doc_id") < 100).cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    st = feature_stats(featured, cols)
    w = train_logreg(standardize(featured, st), cols, "y",
                     iterations=40, lr=1.0)

    base = curate(docs, persist_intermediates=False)
    assert "classified" not in base
    with_clf = curate(
        docs,
        persist_intermediates=False,
        clf_weights=w,
        clf_feature_stats=st,
    )
    gate_ids = {r["doc_id"] for r in base["scrubbed"].select("doc_id").collect()}
    clf_rows = {
        r["doc_id"]: r["quality_prob"]
        for r in with_clf["classified"].select("doc_id", "quality_prob").collect()
    }
    # the fixed gate passed at least some junk docs; the classifier
    # stage removed every planted junk doc and kept every good one
    assert any(j >= 100 for j in gate_ids), gate_ids
    assert set(clf_rows) == {i for i, _, _ in goods}, clf_rows
    assert all(p >= 0.5 for p in clf_rows.values())
    # downstream stages see the filtered corpus
    packed_ids = {r["doc_id"] for r in with_clf["packed"].select("doc_id").collect()}
    assert packed_ids <= set(clf_rows)
    # missing stats entries fail loudly
    with pytest.raises(ValueError, match="clf_feature_stats lacks"):
        curate(docs, clf_weights=w, clf_feature_stats={"f_len": (0.0, 1.0)},
               persist_intermediates=False)


def test_curate_clf_validation_precedes_persist(spark, monkeypatch):
    """Malformed classifier arguments must raise from the argument block
    at the TOP of curate(), before any stage persist mark — a raise past
    a persist() would leak a pinned cache-manager entry with no release
    handle (round-7 ADVICE item). Pinned by spying on DataFrame.persist:
    the failing calls may never reach it."""
    from pyspark.sql import DataFrame as _DF

    docs = spark.createDataFrame(
        [(1, "en", "some words here")], "doc_id long, lang string, text string"
    )
    called: list = []
    orig = _DF.persist

    def spy(self, *a, **k):
        called.append(self)
        return orig(self, *a, **k)

    monkeypatch.setattr(_DF, "persist", spy)
    with pytest.raises(ValueError, match="clf_weights"):
        curate(docs, clf_weights=[0.0, 1.0])  # arity 2 ≠ 6 features + 1
    with pytest.raises(ValueError, match="clf_feature_stats lacks"):
        curate(
            docs,
            clf_weights=[0.0] * 7,
            clf_feature_stats={"f_len": (0.0, 1.0)},
        )
    assert called == []  # neither failing call reached a persist mark


def test_sample_token_quota_semantics(spark):
    """Token-budget carve: the kept set is the hash-order prefix whose
    EXCLUSIVE cumulative tokens stay under the budget — so the crossing
    doc is kept (overshoot < one doc), a budget below one document keeps
    exactly the first doc, a zero/missing budget keeps nothing, and an
    over-sized budget keeps the whole stratum."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        TOKQUOTA_SALT,
        sample_token_quota,
    )
    import hashlib

    rows = [(i, "en", 10) for i in range(10)] + [
        (100, "es", 7),
        (101, "zz", 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_toks int")
    budgets = {"en": 35, "es": 1_000, "fr": 50}
    kept = sample_token_quota(docs, budgets).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # en: hash-order prefix with exclusive cumsum < 35 → 4 docs
    # (0,10,20,30 are the cum-before values; 30 < 35 keeps the 4th)
    order = sorted(
        range(10),
        key=lambda i: (
            hashlib.md5(f"{i}{TOKQUOTA_SALT}".encode()).hexdigest(),
            i,
        ),
    )
    assert sorted(by_lang["en"]) == sorted(order[:4])
    assert by_lang["es"] == [100]      # budget covers the stratum
    assert "zz" not in by_lang         # no budget entry → dropped
    # empty budget map → typed empty frame, no VOID-map detonation
    assert sample_token_quota(docs, {}).count() == 0


def test_sample_token_quota_two_phase_equivalence(spark, sf_dir):
    """two_phase=True returns IDENTICAL rows under several input
    partitionings (the global budget-prefix survives the local filter;
    any candidate ahead of ≥budget candidate-mass drops in phase 2), and
    the plan shows the local cumsum filter below the global window."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_token_quota
    from beeper_matric_etl_tool_spark.ext.text import token_count

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", token_count("text").alias("n_toks"))
    )
    budgets = {"en": 700, "es": 300, "fr": 10, "zh": 0}
    base = {
        tuple(r)
        for r in sample_token_quota(docs, budgets)
        .select("doc_id", "lang")
        .collect()
    }
    assert len(base) > 0
    for parts in (1, 3, 13):
        got = {
            tuple(r)
            for r in sample_token_quota(
                docs.repartition(parts), budgets, two_phase=True
            )
            .select("doc_id", "lang")
            .collect()
        }
        assert got == base, parts
    plan = (
        sample_token_quota(docs, budgets, two_phase=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the optimizer renames the cumsum alias (_we0) — pin the shape
    # instead: two windows, the local one keyed by spark_partition_id
    assert plan.count("Window") >= 2 and "SPARK_PARTITION_ID" in plan.upper()


def test_shuffle_epoch_permutation_and_export(spark, sf_dir, tmp_path):
    """The epoch shuffle is a deterministic, balanced, epoch-dependent
    global permutation: shard = fixed hash range (driver-recomputable),
    per-shard order = (ekey, id), epochs 0 and 1 produce different
    orders, the plan contains NO range partitioning (no sampled
    boundaries, no global sort), and the exported hive layout read back
    shard-by-shard in name order reproduces the exact permutation."""
    import hashlib

    from beeper_matric_etl_tool_spark.ext.pipeline import (
        EPOCH_SHUFFLE_SALT,
        export_epoch,
        shuffle_epoch,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]

    def key(i, epoch):
        return hashlib.md5(
            f"{i}{EPOCH_SHUFFLE_SALT}{epoch}".encode()
        ).hexdigest()

    def expected_order(epoch, n_shards):
        return sorted(
            ids,
            key=lambda i: (
                int(key(i, epoch)[:6], 16) * n_shards // 16**6,
                key(i, epoch),
                i,
            ),
        )

    shuffled = shuffle_epoch(docs, epoch=0, n_shards=16)
    got = shuffled.select("eshard", "ekey", "doc_id").collect()
    # shard formula matches the driver-side recomputation, zero-padded
    for r in got:
        assert r["ekey"] == key(r["doc_id"], 0)
        assert r["eshard"] == f"{int(key(r['doc_id'], 0)[:6], 16) * 16 // 16**6:02d}"
    # balanced: uniform hash, 500 docs / 16 shards — no shard 3× the mean
    from collections import Counter

    sizes = Counter(r["eshard"] for r in got)
    assert max(sizes.values()) < 3 * (len(ids) / 16)
    # epochs are different permutations
    assert expected_order(0, 16) != expected_order(1, 16)
    # no sampled range boundaries, no global sort
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning" in plan.lower()

    # export twice; both read-backs reproduce the exact permutation
    import pyarrow.parquet as pq

    for out in (tmp_path / "e0a", tmp_path / "e0b"):
        export_epoch(docs, str(out), epoch=0, n_shards=16)
        walked = []
        for shard_dir in sorted(p for p in out.iterdir() if p.name.startswith("eshard=")):
            for f in sorted(shard_dir.glob("*.parquet")):
                walked.extend(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
        assert walked == expected_order(0, 16)


def test_curate_dsir_stage(spark, sf_dir):
    """curate(dsir_target=...) inserts the importance-resampling stage
    between semantic and sampled: survivors carry dsir_score_ppm >= the
    floor, the stage is a subset of semantic, and downstream stages run
    on the resampled rows; without the param no 'dsir' stage exists."""
    from beeper_matric_etl_tool_spark.ext.pipeline import curate

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    stages = curate(docs, dsir_target=target)
    assert "dsir" in stages
    sem_ids = {r[0] for r in stages["semantic"].select("doc_id").collect()}
    dsir_rows = stages["dsir"].select("doc_id", "dsir_score_ppm").collect()
    dsir_ids = {r["doc_id"] for r in dsir_rows}
    assert dsir_ids <= sem_ids and 0 < len(dsir_ids) < len(sem_ids)
    assert all(r["dsir_score_ppm"] >= 0 for r in dsir_rows)
    # the packed stage rides the resampled set
    packed_ids = {r[0] for r in stages["packed"].select("doc_id").collect()}
    assert packed_ids <= dsir_ids
    assert "dsir" not in curate(docs)


def test_sample_top_fraction_exact_counts_and_direction(spark, sf_dir):
    """Exactly floor(n·keep_ppm/1e6) rows survive per stratum; ascending
    keeps the LOWEST scores (perplexity convention), descending the
    highest; ties break on id; bounds are validated."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_top_fraction
    from beeper_matric_etl_tool_spark.ext.search import unigram_nll_scores

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = docs.join(unigram_nll_scores(docs), on="doc_id")
    per_lang = {
        r["lang"]: r["n"]
        for r in scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept = sample_top_fraction(
        scored, "score_ppm", keep_ppm=800_000, strata_col="lang"
    )
    got = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {l: n * 800_000 // 1_000_000 for l, n in per_lang.items()}
    # ascending keeps the fluent end: the kept max ≤ the dropped min per lang
    worst_kept = {
        r["lang"]: r["m"]
        for r in kept.groupBy("lang").agg(F.max("score_ppm").alias("m")).collect()
    }
    dropped = scored.join(kept.select("doc_id"), on="doc_id", how="left_anti")
    best_dropped = {
        r["lang"]: r["m"]
        for r in dropped.groupBy("lang").agg(F.min("score_ppm").alias("m")).collect()
    }
    for lang in worst_kept:
        assert worst_kept[lang] <= best_dropped[lang]
    # descending keeps the other end
    top = sample_top_fraction(
        scored, "score_ppm", keep_ppm=100_000, ascending=False,
        allow_single_partition=True,
    )
    n = scored.count()
    rows = top.collect()
    assert len(rows) == n * 100_000 // 1_000_000
    cutoff = sorted(
        (r["score_ppm"] for r in scored.collect()), reverse=True
    )[len(rows) - 1]
    assert all(r["score_ppm"] >= cutoff for r in rows)
    import pytest as _pt

    with _pt.raises(ValueError, match="keep_ppm"):
        sample_top_fraction(scored, "score_ppm", keep_ppm=2_000_000)


def test_sample_top_fraction_spread_equivalence_and_plan(spark, sf_dir):
    """The spread (distributed-rank) form returns IDENTICAL rows to the
    single-window form — per stratum and stratum-less, both directions,
    under 1/3/13-partition inputs — and its plan is the one the 100 TB
    story claims: a RangePartitioning exchange spreads the rank (no
    whole-stratum hash window), and the gate itself is a broadcast
    boundary compare, so the full frame never shuffles."""
    from beeper_matric_etl_tool_spark.ext.pipeline import sample_top_fraction
    from beeper_matric_etl_tool_spark.ext.search import unigram_nll_scores

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = docs.join(unigram_nll_scores(docs), on="doc_id").localCheckpoint(
        eager=True
    )

    def ids(df):
        return sorted(r["doc_id"] for r in df.select("doc_id").collect())

    base = ids(
        sample_top_fraction(scored, "score_ppm", 800_000, strata_col="lang")
    )
    for parts in (1, 3, 13):
        got = ids(
            sample_top_fraction(
                scored.repartition(parts), "score_ppm", 800_000,
                strata_col="lang", spread=True,
            )
        )
        assert got == base, parts
    # stratum-less: spread needs no opt-in (that is its point); both
    # directions agree with the window form
    for asc in (True, False):
        w = ids(
            sample_top_fraction(
                scored, "score_ppm", 317_000, ascending=asc,
                allow_single_partition=True,
            )
        )
        s = ids(
            sample_top_fraction(
                scored.repartition(7), "score_ppm", 317_000, ascending=asc,
                spread=True,
            )
        )
        assert s == w, asc
    # keep_ppm=0 keeps nothing in both forms
    assert ids(
        sample_top_fraction(scored, "score_ppm", 0, strata_col="lang",
                            spread=True)
    ) == []
    # plan shape: range exchange + broadcast gate, and the full-width
    # frame reaches no hash-partitioned stratum window
    plan = sample_top_fraction(
        scored, "score_ppm", 800_000, strata_col="lang", spread=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Broadcast" in plan
    # the guard: stratum-less window form must be opted into
    with pytest.raises(ValueError, match="SINGLE task"):
        sample_top_fraction(scored, "score_ppm", 500_000)


def test_spread_rank_ties_and_null_scores(spark):
    """Planted ties (same score, id tie-break) and NULL scores (Spark
    window order: asc = nulls FIRST, desc = nulls LAST) — the spread
    boundary compare must replicate both exactly, in both operators."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        sample_top_fraction,
        score_buckets,
    )

    rows = [
        (1, "en", 10), (2, "en", 10), (3, "en", 10), (4, "en", 20),
        (5, "en", None), (6, "en", 20),
        (10, "es", 5), (11, "es", None), (12, "es", None), (13, "es", 7),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, s long")
    for asc in (True, False):
        for ppm in (250_000, 500_000, 750_000):
            w = sorted(
                r["doc_id"]
                for r in sample_top_fraction(
                    docs, "s", ppm, ascending=asc, strata_col="lang"
                ).collect()
            )
            s = sorted(
                r["doc_id"]
                for r in sample_top_fraction(
                    docs.repartition(3), "s", ppm, ascending=asc,
                    strata_col="lang", spread=True,
                ).collect()
            )
            assert s == w, (asc, ppm)
        wb = {
            r["doc_id"]: r["score_bucket"]
            for r in score_buckets(
                docs, "s", ascending=asc, strata_col="lang"
            ).collect()
        }
        sb = {
            r["doc_id"]: r["score_bucket"]
            for r in score_buckets(
                docs.repartition(3), "s", ascending=asc, strata_col="lang",
                spread=True,
            ).collect()
        }
        assert sb == wb, asc


def test_spread_null_stratum_parity(spark):
    """Rows in a NULL stratum must survive the spread forms and rank
    exactly as the window form's NULL partition does — the internal
    offsets join-back is null-safe (a bare name-list join would silently
    drop the NULL group: data loss in sample_top_fraction/pack_by_budget,
    label fall-through in score_buckets)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        pack_by_budget,
        sample_top_fraction,
        score_buckets,
    )

    rows = [
        (1, "en", 10), (2, "en", 10), (3, None, 10), (4, "en", 20),
        (5, None, None), (6, "en", 20),
        (10, "es", 5), (11, None, 3), (12, "es", None), (13, "es", 7),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, s long")
    null_ids = {3, 5, 11}
    for asc in (True, False):
        for ppm in (250_000, 500_000, 750_000):
            w = sorted(
                r["doc_id"]
                for r in sample_top_fraction(
                    docs, "s", ppm, ascending=asc, strata_col="lang"
                ).collect()
            )
            s = sorted(
                r["doc_id"]
                for r in sample_top_fraction(
                    docs.repartition(3), "s", ppm, ascending=asc,
                    strata_col="lang", spread=True,
                ).collect()
            )
            assert s == w, (asc, ppm)
        wb = {
            r["doc_id"]: r["score_bucket"]
            for r in score_buckets(
                docs, "s", ascending=asc, strata_col="lang"
            ).collect()
        }
        sb = {
            r["doc_id"]: r["score_bucket"]
            for r in score_buckets(
                docs.repartition(3), "s", ascending=asc,
                strata_col="lang", spread=True,
            ).collect()
        }
        assert sb == wb, asc
        assert set(sb) >= null_ids  # the NULL stratum is fully labeled
    # the NULL stratum keeps its exact 500k head (2 of 3 rows at 750k)
    kept = {
        r["doc_id"]
        for r in sample_top_fraction(
            docs, "s", 750_000, strata_col="lang", spread=True
        ).collect()
    }
    assert len(kept & null_ids) == 2
    # pack_by_budget(spread): NULL partition value accumulates its own
    # prefix, identical to the window form
    toks = spark.createDataFrame(
        [(i, ["en", None, "es"][i % 3], 10 + i) for i in range(30)],
        "doc_id long, lang string, n long",
    )
    w = {
        r["doc_id"]: r["pack_id"]
        for r in pack_by_budget(
            toks, budget=40, token_col="n", partition_cols=["lang"]
        ).collect()
    }
    s = {
        r["doc_id"]: r["pack_id"]
        for r in pack_by_budget(
            toks.repartition(3), budget=40, token_col="n",
            partition_cols=["lang"], spread=True,
        ).collect()
    }
    assert s == w
    assert len(s) == 30


def test_spread_refuses_without_exchange_reuse(spark):
    """spread=True's two consumers of the range exchange must observe ONE
    boundary sample; with spark.sql.exchange.reuse off the plans could
    each re-sample and silently corrupt global ranks — composition
    fails loudly instead."""
    from beeper_matric_etl_tool_spark.ext.pipeline import (
        pack_by_budget,
        sample_top_fraction,
    )

    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20)], "doc_id long, lang string, s long"
    )
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        with pytest.raises(ValueError, match="exchange.reuse"):
            sample_top_fraction(
                docs, "s", 500_000, strata_col="lang", spread=True
            )
        with pytest.raises(ValueError, match="exchange.reuse"):
            pack_by_budget(
                docs, budget=10, token_col="s", partition_cols=["lang"],
                spread=True,
            )
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    # re-enabled: composition proceeds
    assert sample_top_fraction(
        docs, "s", 500_000, strata_col="lang", spread=True
    ).count() == 1


def test_score_buckets_spread_equivalence_and_plan(spark, sf_dir):
    """score_buckets(spread=True): identical labels to the window form
    on the real corpus (per-stratum and stratum-less, 1/3/13-partition
    inputs, the 3000-row overflow stratum), range-partitioned rank plan,
    broadcast label gate. Every row must survive with a label in both
    forms (the bucketing contract)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import score_buckets
    from beeper_matric_etl_tool_spark.ext.text import token_count

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", token_count("text").alias("n_toks"))
        .localCheckpoint(eager=True)
    )
    base = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(docs, "n_toks", strata_col="lang").collect()
    }
    for parts in (1, 3, 13):
        got = {
            r["doc_id"]: r["score_bucket"]
            for r in score_buckets(
                docs.repartition(parts), "n_toks", strata_col="lang",
                spread=True,
            ).collect()
        }
        assert got == base, parts
    assert len(base) == docs.count()  # total labeling
    # stratum-less + the 3000-row percentile-overflow regression corpus
    big = spark.createDataFrame(
        [(i, i) for i in range(3000)], "doc_id long, s long"
    )
    wbig = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(big, "s", allow_single_partition=True).collect()
    }
    sbig = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(big.repartition(13), "s", spread=True).collect()
    }
    assert sbig == wbig
    plan = score_buckets(
        docs, "n_toks", strata_col="lang", spread=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Broadcast" in plan
    with pytest.raises(ValueError, match="SINGLE task"):
        score_buckets(big, "s")


def test_pack_by_budget_spread_equivalence_and_plan(spark, sf_dir):
    """pack_by_budget(spread=True) assigns IDENTICAL pack_ids to the
    window form — per-source and partition-less, shuffled and id-order,
    under 1/3/13-partition inputs (integer token weights make the
    split-and-offset sums exact) — through a RangePartitioning plan
    with no single-task cumsum; partition-less spread needs no opt-in."""
    from beeper_matric_etl_tool_spark.ext.pipeline import pack_by_budget
    from beeper_matric_etl_tool_spark.ext.text import token_count

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", token_count("text").alias("n_toks"))
        .localCheckpoint(eager=True)
    )

    def packs(df, **kw):
        return {
            r["doc_id"]: r["pack_id"]
            for r in pack_by_budget(df, "n_toks", budget=700, **kw).collect()
        }

    for shuffle in (True, False):
        base = packs(docs, partition_cols=("lang",), shuffle=shuffle)
        for parts in (1, 3, 13):
            got = packs(
                docs.repartition(parts), partition_cols=("lang",),
                shuffle=shuffle, spread=True,
            )
            assert got == base, (shuffle, parts)
    # partition-less: spread replaces the single-task window, no opt-in
    w = packs(docs, allow_single_partition=True)
    s = packs(docs.repartition(7), spread=True)
    assert s == w
    plan = (
        pack_by_budget(
            docs, "n_toks", budget=700, partition_cols=("lang",), spread=True
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()


def test_curate_pack_spread_matches_window_form(spark, sf_dir):
    """curate()'s packed stage defaults to the spread prefix sum; the
    window form (pack_spread=False) yields identical pack assignments."""
    from beeper_matric_etl_tool_spark.ext.pipeline import curate

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    a = curate(docs, persist_intermediates=False)
    b = curate(docs, persist_intermediates=False, pack_spread=False)
    pa = sorted(
        (r["doc_id"], r["pack_id"])
        for r in a["packed"].select("doc_id", "pack_id").collect()
    )
    pb = sorted(
        (r["doc_id"], r["pack_id"])
        for r in b["packed"].select("doc_id", "pack_id").collect()
    )
    assert pa == pb and pa


def test_curate_nll_spread_matches_window_form(spark, sf_dir):
    """curate(nll_keep_ppm=…) runs the spread rank by default; the
    window form (nll_spread=False) keeps the IDENTICAL fluent set — the
    funnel's scale-form switch cannot move a single decision. Plan-shape
    pin (deterministic, unlike session-wide job counts): the default
    fluent stage ranks through a RangePartitioning exchange; the window
    form has none."""
    from beeper_matric_etl_tool_spark.ext.pipeline import curate

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    spread_stages = curate(
        docs, nll_keep_ppm=500_000, persist_intermediates=False
    )
    window_stages = curate(
        docs, nll_keep_ppm=500_000, nll_spread=False,
        persist_intermediates=False,
    )
    got = sorted(
        r["doc_id"] for r in spread_stages["fluent"].select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"] for r in window_stages["fluent"].select("doc_id").collect()
    )
    assert got == want and got
    splan = (
        spread_stages["fluent"]._jdf.queryExecution().executedPlan().toString()
    )
    wplan = (
        window_stages["fluent"]._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in splan.lower()
    assert "rangepartitioning" not in wplan.lower()


def test_corpus_report_data_card(spark, sf_dir):
    """The one-pass data card: per-language and global rows agree with
    independently-computed ground truth on a planted corpus — including
    the case the rollup exists for: a fingerprint duplicated ACROSS
    languages is a global duplicate but no language's within-group
    duplicate, so the global exact_dup_docs is NOT the per-lang sum."""
    from beeper_matric_etl_tool_spark.ext.pipeline import corpus_report

    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines "
        "under a wide sky full of bright and patient little stars"
    )
    docs = spark.createDataFrame(
        [
            (1, "en", good),                      # clean
            (2, "en", good),                      # within-lang duplicate
            (3, "es", good),                      # CROSS-lang duplicate
            (4, "en", "spam " * 80),              # quality victim (ttr)
            (5, "en", good + " mail me at bob@example.com now please"),
        ],
        "doc_id long, lang string, text string",
    )
    report = corpus_report(docs)
    en, es, corpus = report["en"], report["es"], report["_corpus"]
    assert en["n_docs"] == 4 and es["n_docs"] == 1 and corpus["n_docs"] == 5
    assert en["exact_dup_docs"] == 1      # doc 2 duplicates doc 1
    assert es["exact_dup_docs"] == 0      # unique within es...
    assert corpus["exact_dup_docs"] == 2  # ...but not globally
    assert en["pii"]["emails"] == 1 and corpus["pii"]["emails"] == 1
    assert en["rule_failures"]["ttr_ok"] == 1  # the spam doc
    assert corpus["rule_failures"]["ttr_ok"] == 1
    n_good_tokens = len(good.split(" "))
    assert sum(en["token_hist"].values()) == 4
    assert en["token_hist"]["50-99"] >= 3  # the good-body docs
    assert corpus["total_tokens"] == (
        en["total_tokens"] + es["total_tokens"]
    )
    assert n_good_tokens < 100


def test_curate_percentile_fluency_stage(spark, sf_dir):
    """curate(nll_keep_ppm=...) keeps exactly the most fluent fraction
    per source (the CCNet head-fraction form); mutually exclusive with
    the fixed-cutoff form; survivors carry nll_ppm and the kept set is
    the per-source low-NLL prefix."""
    from beeper_matric_etl_tool_spark.ext.pipeline import curate

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    stages = curate(docs, nll_keep_ppm=500_000)
    scrubbed_per_lang = {
        r["lang"]: r["n"]
        for r in stages["scrubbed"].groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fluent = stages["fluent"].select("doc_id", "lang", "nll_ppm").collect()
    got_per_lang = {}
    for r in fluent:
        got_per_lang[r["lang"]] = got_per_lang.get(r["lang"], 0) + 1
    for lang, n in scrubbed_per_lang.items():
        assert got_per_lang.get(lang, 0) == n * 500_000 // 1_000_000, lang
    with pytest.raises(ValueError, match="not both"):
        curate(docs, max_nll_ppm=1, nll_keep_ppm=1)


def test_curate_bigram_fluency_gate_catches_word_order(spark):
    """nll_lm_order=2: the fluency gate scores under the interpolated
    bigram LM — a document whose token MULTISET matches the corpus but
    whose word ORDER is scrambled (reversed) is exactly what the unigram
    gate cannot see (identical multiset ⇒ identical unigram score; the
    id tie-break then keeps the low-id scrambled doc) and exactly what
    the bigram gate kills (its transitions are corpus-rare). Bad order
    values raise."""
    good = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines "
        "under a wide sky full of patient little stars"
    )
    animals = ["fox", "hare", "deer", "crow", "wolf", "lynx", "boar",
               "mole", "toad"]
    naturals = [(10 + i, "en", good.replace("fox", w))
                for i, w in enumerate(animals)]
    # id 1 < every natural id: under the unigram tie-break it SURVIVES
    reversed_doc = (1, "en", " ".join(reversed(good.split(" "))))
    docs = spark.createDataFrame(
        [reversed_doc] + naturals, "doc_id long, lang string, text string"
    )
    # keep 9 of 10 per source — exactly one doc must drop
    # checkpoint_stages on all three funnels: value assertions only —
    # cuts the re-embedded composition cost (r14 suite-wall fix)
    uni = curate(docs, nll_keep_ppm=900_000, persist_intermediates=False,
                 checkpoint_stages=True)
    assert {r["doc_id"] for r in uni["scrubbed"].select("doc_id").collect()} \
        == {1} | {10 + i for i in range(9)}  # all pass the heuristic gate
    uni_ids = {r["doc_id"] for r in uni["fluent"].select("doc_id").collect()}
    assert 1 in uni_ids  # unigram model cannot see the scrambling
    bi = curate(
        docs, nll_keep_ppm=900_000, nll_lm_order=2,
        persist_intermediates=False, checkpoint_stages=True,
    )
    bi_ids = {r["doc_id"] for r in bi["fluent"].select("doc_id").collect()}
    assert 1 not in bi_ids  # word order enters the bigram score
    assert len(bi_ids) == 9
    # the fixed-cutoff form accepts the order switch too
    bi_cut = curate(
        docs, max_nll_ppm=10_000_000, nll_lm_order=2,
        persist_intermediates=False, checkpoint_stages=True,
    )
    assert {r["doc_id"] for r in bi_cut["fluent"].select("doc_id").collect()}
    with pytest.raises(ValueError, match="nll_lm_order"):
        curate(docs, nll_keep_ppm=1, nll_lm_order=3)


def test_curate_fluency_gate_passes_no_evidence_docs(spark):
    """A doc despanned down to one token has no bigram transition (and
    would have no unigram row at zero tokens) — the fluency gates LEFT-
    join the LM scores and PASS such docs with nll_ppm NULL, mirroring
    the dup_window NULL-pass rule. The quality gate's length floor
    cannot protect here: despan runs AFTER it and rewrites text. Before
    the fix the inner join silently dropped the doc."""
    shared = (
        "the quick brown fox jumps over a lazy dog and then runs to the "
        "river where it drinks some of that cool clear water before "
        "returning to its den in the forest to rest for the evening hours "
        "while other animals of the wood begin their own nightly routines"
    )
    az = "abcdefghijklmnopqrstuvwxyz"

    def filler(d: int) -> str:
        # digit-free per-doc-unique tokens alternating with stopwords —
        # no shared 5-gram, passes every quality rule, immune to the
        # PII digit scrub (the planted-fixture traps)
        return " ".join(
            f"q{az[d]}{az[i // 26]}{az[i % 26]}fill {'the' if i % 2 else 'of'}"
            for i in range(30)
        )

    docs = spark.createDataFrame(
        # id 1 holds the canonical span copy; id 2 = span + one unique
        # token, so despan leaves it exactly "zebra" (1 token, no bigram)
        [(1, "en", f"{shared} {filler(1)}"), (2, "en", f"{shared} zebra")]
        + [(10 + i, "en", filler(3 + i)) for i in range(4)],
        "doc_id long, lang string, text string",
    )
    # fixed-cutoff form: the ceiling is generous — every SCORED doc
    # passes; doc 2 passes via the NULL rule with a NULL audit column.
    # checkpoint_stages cuts the re-embedded funnel plans (r13 technique);
    # the gate semantics under test are unchanged — measured r14: this
    # test was 393 s standalone without it, nearly all driver-side
    # Catalyst planning of the twice-built funnel
    cut = curate(
        docs, persist_intermediates=False, span_k=5,
        max_nll_ppm=100_000_000, nll_lm_order=2, checkpoint_stages=True,
    )
    despanned = {
        r["doc_id"]: r["text"] for r in cut["despanned"].collect()
    }
    assert despanned[2] == "zebra"  # the planted rewrite happened
    fl = {r["doc_id"]: r["nll_ppm"] for r in cut["fluent"].collect()}
    assert 2 in fl and fl[2] is None
    assert all(fl[d] is not None for d in fl if d != 2)
    # percentile form: doc 2 must NOT enter the ranked population (a
    # NULL would sort as "most fluent" and eat quota) — the 5 scored
    # docs keep floor(5·0.6)=3, plus doc 2 through the NULL rule
    pct = curate(
        docs, persist_intermediates=False, span_k=5,
        nll_keep_ppm=600_000, nll_lm_order=2, checkpoint_stages=True,
    )
    rows = {r["doc_id"]: r["nll_ppm"] for r in pct["fluent"].collect()}
    assert 2 in rows and rows[2] is None
    assert len(rows) == 4  # 3 scored survivors + the no-evidence doc


def test_score_buckets_thirds_and_strata(spark):
    """Exact integer percentile bucketing: 9 rows split 3/3/3 into
    head/middle/tail by rank thirds; per-stratum mode buckets within
    each stratum; every row survives with a label; bad cuts raise."""
    from beeper_matric_etl_tool_spark.ext.pipeline import score_buckets

    rows = [(i, "en", i * 10) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, s long")
    got = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(docs, "s", allow_single_partition=True).collect()
    }
    assert [got[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # strata: each language bucketed independently
    both = spark.createDataFrame(
        [(i, "en", i) for i in range(3)] + [(10 + i, "es", i) for i in range(3)],
        "doc_id long, lang string, s long",
    )
    g2 = {
        r["doc_id"]: r["score_bucket"]
        for r in score_buckets(both, "s", strata_col="lang").collect()
    }
    assert g2[0] == g2[10] == "head"
    assert g2[2] == g2[12] == "tail"
    with pytest.raises(ValueError, match="labels"):
        score_buckets(docs, "s", cuts_ppm=(500_000,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="cuts_ppm"):
        score_buckets(docs, "s", cuts_ppm=(700_000, 300_000))


def test_score_buckets_large_stratum_and_tie_cuts(spark):
    """Regression pins for the review findings: ranks beyond 2¹¹ must
    not overflow the ×1e6 percentile product (3000 rows bucket cleanly
    into exact thirds), and tied cuts are rejected (a tie would silently
    shadow the middle label)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import score_buckets

    docs = spark.createDataFrame(
        [(i, i) for i in range(3000)], "doc_id long, s long"
    )
    got = (
        score_buckets(docs, "s", allow_single_partition=True)
        .groupBy("score_bucket")
        .count()
        .collect()
    )
    counts = {r["score_bucket"]: r["count"] for r in got}
    assert counts == {"head": 1000, "middle": 1000, "tail": 1000}
    import pytest as _pt

    with _pt.raises(ValueError, match="strictly increasing"):
        score_buckets(docs, "s", cuts_ppm=(500_000, 500_000))


def test_corpus_report_null_lang_group_is_not_the_total(spark):
    """Regression pin: a NULL-language group must appear under key None
    and never collide with the '_corpus' grand total (the rollup's
    grouping flag distinguishes them)."""
    from beeper_matric_etl_tool_spark.ext.pipeline import corpus_report

    body = " ".join(f"w{i}a the of" for i in range(20))
    docs = spark.createDataFrame(
        [(1, None, body), (2, None, body + " extra"), (3, "en", body + " more")],
        "doc_id long, lang string, text string",
    )
    rep = corpus_report(docs)
    assert rep["_corpus"]["n_docs"] == 3
    assert rep[None]["n_docs"] == 2
    assert rep["en"]["n_docs"] == 1


def test_curate_dup_window_gate_drops_boilerplate_pages(spark):
    """max_dup_window_ppm: a page stitched from sentences that each
    appear in OTHER documents has no within-doc repetition (the Gopher
    battery passes it) but a high corpus-wide duplicated-window
    fraction — the gate drops it whole while its carrier documents
    (mostly-unique pages sharing one sentence each) pass; with the
    stage off the page sails through; arguments validate before any
    persist mark."""
    base = (
        "river meadow stone harbor lantern copper willow ember frost "
        "garden marble cedar falcon amber tunnel violet ginger hollow "
        "saddle barley canyon drift fable grove heron island jasper "
        "keel lumen mossy nectar orchid prairie quartz russet spruce "
        "timber umber vessel walnut yonder zephyr arbor bluff cinder"
    ).split()
    az = "abcdefghijklmnopqrstuvwxyz"
    sentences = [
        " ".join(
            [f"s{az[si]}w{az[j]}" for j in range(7)]
            + ["the"]
            + [f"s{az[si]}x{az[j]}" for j in range(7)]
            + ["and"]
        )
        for si in range(5)
    ]  # 16 tokens each, no within-sentence repeats, digit-free (the
    # PII scrub rewrites digit runs — digits would collapse every
    # carrier body into one string and make everything hot)

    docs = []
    did = 0
    for si, sent in enumerate(sentences):
        for c in range(4):  # 4 carriers per sentence
            did += 1
            tag = az[did // 26] + az[did % 26]
            body = " ".join(f"{w}c{tag}" for w in base[:38]) + " the and"
            docs.append((did, "en", body + " " + sent))
    junk_id = 999
    docs.append((junk_id, "en", " ".join(sentences)))  # 80 tokens, all copied
    frame = spark.createDataFrame(docs, "doc_id long, lang string, text string")

    gated = curate(
        frame, max_dup_window_ppm=300_000, persist_intermediates=False
    )
    assert {r["doc_id"] for r in gated["scrubbed"].select("doc_id").collect()} \
        == {d[0] for d in docs}  # everyone passes the heuristic battery
    novel_ids = {r["doc_id"] for r in gated["novel"].select("doc_id").collect()}
    assert junk_id not in novel_ids
    assert len(novel_ids) == 20  # every carrier survives
    # audit column present with a sane value for a carrier
    row = gated["novel"].filter(F.col("doc_id") == 1).collect()[0]
    assert 0 <= row["dup_window_ppm"] <= 300_000

    off = curate(frame, persist_intermediates=False)
    assert "novel" not in off
    kept_off = {r["doc_id"] for r in off["exact"].select("doc_id").collect()}
    assert junk_id in kept_off  # without the gate the page sails through

    with pytest.raises(ValueError, match="max_dup_window_ppm"):
        curate(frame, max_dup_window_ppm=2_000_000)
    with pytest.raises(ValueError, match="dup_window_k"):
        curate(frame, max_dup_window_ppm=1000, dup_window_k=1)


def test_curate_dup_window_stage_is_lazy(spark, sf_dir):
    """The novel stage preserves the funnel's zero-jobs composition
    contract (scoped, as documented, to exclude the iterative
    components labeling that base curate() always runs): the OPERATOR
    composes with zero jobs — it is pure plan algebra, fingerprint aggs
    and a join, no collect — and the stage's optimized plan scores via
    the md5-window aggregate, not a driver-collected literal."""
    from beeper_matric_etl_tool_spark.ext.text import ngram_duplication_scores
    from beeper_matric_etl_tool_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    scores = ngram_duplication_scores(docs, k=8, min_count=2)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before)  # single-operator zero-jobs pin

    stages = curate(
        docs, max_dup_window_ppm=300_000, persist_intermediates=False
    )
    assert "novel" in stages and "dup_window_ppm" in stages["novel"].columns
    plan = stages["novel"]._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan  # scored in-plan, not via a collected literal
    del scores
