"""Text-analysis operators for LLM training-data pipelines (SURVEY §2.12).

Everything here is pure `pyspark.sql.functions` column algebra — tokenize,
count, ratio, fingerprint — running inside whole-stage codegen over the
`documents` table. No Python touches the hot path: at 100 TB these are
embarrassingly parallel per-row transforms plus one partial-aggregated
groupBy for corpus statistics.

Portability note: fingerprints use md5 (hex string) rather than
`xxhash64`/`hash` so the same logic is expressible in any engine (the
DuckDB oracle included) — engine-specific hashes would be faster but
unverifiable and non-reproducible across the pipeline boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny function-word inventories for the language-ID heuristic.
#: Real pipelines use fastText/CLD3; the *operator* (per-row scoring +
#: argmax over language scores) is what matters at the engine level.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr": ("le", "la", "de", "et", "un", "en", "que", "pour"),
    "de": ("der", "die", "und", "das", "von", "zu", "ein", "mit"),
}


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def wordpiece_count(text: Column | str, pattern: str = "[a-z]+") -> Column:
    """BPE-ish token counting: number of regex word-piece matches."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(pattern))


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens are in the given function-word inventory."""
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def language_scores(toks: Column, inventories: dict[str, tuple[str, ...]] | None = None) -> dict[str, Column]:
    """Per-language function-word hit counts over a token array — the
    n-gram-free language-ID heuristic (a real fastText scorer slots in as
    a pandas_udf producing the same columns). Returns {code: hits
    Column} in inventory order."""
    inv = STOPWORDS if inventories is None else inventories
    return {code: stopword_hits(toks, words) for code, words in inv.items()}


def detect_language(
    toks: Column, inventories: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """Argmax language code over :func:`language_scores` with a FIXED
    preference order (inventory order; ``>=`` comparisons, so ties —
    including the all-zero row — resolve to the earliest code:
    deterministic, engine-portable, and exactly the CASE chain the
    `doc_profile` oracle replays)."""
    scores = list(language_scores(toks, inventories).items())
    if not scores:
        raise ValueError(
            "detect_language: empty language inventory — pass at least one "
            "{code: function_words} entry"
        )
    if len(scores) == 1:
        return F.lit(scores[0][0])
    expr = None
    for i, (code, hits) in enumerate(scores[:-1]):
        cond = None
        for _, other in scores[i + 1 :]:
            c = hits >= other
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, code) if expr is None else expr.when(cond, code)
    return expr.otherwise(scores[-1][0])


def exact_fingerprint(text: Column | str) -> Column:
    """Whole-document content fingerprint (exact-dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def min_shingle_fingerprint(toks: Column, k: int = 4) -> Column:
    """Rolling-hash document fingerprint: the minimum md5 over all k-token
    shingles (a 1-hash MinHash — two documents sharing their rarest shingle
    collide). Built entirely from array lambdas; O(tokens) per row."""
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    return F.array_min(shingles)


def scaled_ratio(numer: Column, denom: Column, scale: int = 1_000_000) -> Column:
    """Exact integer `scale·numer/denom` (floor) — the reproducible
    substitute for rounded float ratios.

    Cross-engine float `round()` is NOT deterministic at decimal boundaries
    (DuckDB rounds `x*10^n` after an inexact multiply; Spark rounds the
    exact binary expansion — they can disagree by one final digit), so
    every ratio the engine emits is an integer. Floor of the double
    quotient equals true integer division while denom < ~4e9 (quotient ulp
    < 1/denom), which all token/count denominators satisfy.
    """
    return F.floor((F.lit(scale) * numer.cast("long")) / denom).cast("long")


def quality_ppm(n_tokens: Column, n_uniq: Column, stop_hits: Column) -> Column:
    """Composite quality heuristic in parts-per-million: 0.4·length
    saturation + 0.3·type-token ratio + 0.3·stopword ratio, all in exact
    integer arithmetic."""
    length_part = F.lit(4000) * F.least(n_tokens, F.lit(100)).cast("long")
    return (
        length_part
        + scaled_ratio(n_uniq, n_tokens, 300_000)
        + scaled_ratio(stop_hits, n_tokens, 300_000)
    )


def chunk_documents(
    df,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into fixed-size token windows with overlap — the
    standard pre-embedding step (a chunk, not a whole document, is the
    retrieval/embedding unit). Returns one row per chunk:
    (id_col, chunk_id, chunk_start, chunk_text, n_chunk_tokens).

    Chunks start every ``chunk_tokens - overlap_tokens`` tokens, so
    consecutive chunks share ``overlap_tokens`` of context and no token is
    lost at a boundary; the final partial chunk is kept. chunk_id is the
    0-based window index — (id, chunk_id) is a stable, rerun-deterministic
    key for downstream embedding/indexing.

    NULL-text documents produce ZERO chunk rows (there is nothing to
    embed) rather than a phantom chunk — F.size(NULL) would otherwise
    null-propagate into one empty-string window claiming a full
    chunk_tokens token count.

    Scale shape: pure column algebra (sequence → transform → posexplode)
    inside whole-stage codegen; zero shuffle — the fan-out is
    ~n_tokens/stride rows per document, produced where the document row
    already lives."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_documents: chunk_tokens={chunk_tokens} must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"chunk_documents: overlap_tokens={overlap_tokens} must be in "
            f"[0, chunk_tokens={chunk_tokens}) — negative overlap makes the "
            f"stride exceed the window and silently LOSES the gap tokens "
            f"from every chunk; overlap >= chunk makes the stride "
            f"non-positive and the window sequence infinite"
        )
    stride = chunk_tokens - overlap_tokens
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens(text_col)
    n = F.size(toks)
    # window starts: 1, 1+stride, ... while start <= max(n - overlap, 1) —
    # the last window may be partial but never fully-contained in the prior
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap_tokens), F.lit(1)), F.lit(stride)
    )
    windows = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk_text"),
            F.least(n - s + F.lit(1), F.lit(chunk_tokens)).alias("n_toks"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_id", "__w"),
    ).select(
        id_col,
        "chunk_id",
        (F.col("__w.start") - F.lit(1)).alias("chunk_start"),
        F.col("__w.chunk_text").alias("chunk_text"),
        F.col("__w.n_toks").alias("n_chunk_tokens"),
    )


def cents(col: Column | str) -> Column:
    """Re-export of functions.scalar.cents (the repo-wide money rule)."""
    from beeper_matric_etl_tool_spark.functions.scalar import cents as _cents

    return _cents(col)


#: blank-line paragraph separator — shared with the quality gate's
#: repetition battery and the boilerplate remover (RE2 ∩ Java-regex
#: common subset, replayable as str_split_regex in a SQL twin)
PARAGRAPH_RE = r"\n{2,}"


def paragraphs(text_col: Column | str, pattern: str = PARAGRAPH_RE) -> Column:
    """Blank-line paragraph segmentation with blank segments dropped —
    the shared unit of the repetition battery (ext/quality.py) and
    :func:`remove_boilerplate_paragraphs`."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, pattern), lambda x: F.trim(x) != "")


def remove_boilerplate_paragraphs(
    df,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
):
    """Corpus-level boilerplate removal: drop every paragraph whose exact
    content appears in at least ``min_docs`` DISTINCT documents (site
    footers, license blocks, navigation chrome — the repeated-across-docs
    mass that per-document quality rules cannot see), and rebuild each
    document from its surviving paragraphs in original order.

    Returns one row per input document:
    (id_col, cleaned_text, n_paras, n_removed) — ``cleaned_text`` is ''
    when every paragraph was boilerplate (the row is kept so the caller
    decides whether an emptied doc survives; silently dropping it would
    hide the removal from the audit).

    Document-frequency (distinct docs), not raw occurrence count, is the
    threshold: a paragraph repeated 50× inside ONE document is
    within-document repetition — the quality gate's ``dup_para_ppm`` rule
    owns that case — while 2 docs sharing a footer is boilerplate even
    though the total count is lower.

    Scale shape: three linear passes, no corpus×corpus join —
    (1) posexplode paragraphs and aggregate md5(paragraph) →
    approx-distinct-free exact distinct-doc counts (shuffles 16-byte
    fingerprints + ids, never paragraph text); (2) anti-join the exploded
    paragraphs against the over-threshold fingerprint set (the set is
    df-filtered and tiny relative to the corpus — AQE broadcasts it when
    it fits); (3) regroup survivors by document (array_sort over
    (pos, text) structs restores order without a window). Passes 2–3
    shuffle the paragraph text mass once each — the unavoidable cost of
    reconstructing documents; everything else moves fingerprints only.
    """
    if min_docs < 2:
        raise ValueError(
            f"remove_boilerplate_paragraphs: min_docs={min_docs} must be "
            f">= 2 — at 1 every paragraph is 'boilerplate' and the corpus "
            f"empties"
        )
    paras = df.select(
        F.col(id_col), F.posexplode(paragraphs(text_col)).alias("pos", "para")
    ).withColumn("para_fp", F.md5("para"))
    boiler = (
        paras.groupBy("para_fp")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("para_fp")
    )
    kept = paras.join(boiler, "para_fp", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("cleaned_text"),
        F.count(F.lit(1)).cast("int").alias("__n_kept"),
    )
    return (
        df.select(id_col, F.size(paragraphs(text_col)).alias("n_paras"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
            "n_paras",
            (F.col("n_paras") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def remove_duplicate_spans(
    df,
    k: int = 5,
    min_count: int = 2,
    keep_one: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Corpus-level duplicate-SPAN removal — the token-granular sibling of
    :func:`remove_boilerplate_paragraphs` and the Spark-shaped analog of
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — public method): every
    k-token window whose exact content occurs at least ``min_count``
    times ACROSS THE CORPUS (total occurrences — within-document repeats
    count, unlike the boilerplate rule's distinct-doc floor: a crawl
    artifact pasted 50× into one page is exactly what substring dedup
    exists to cut) is marked hot; each document is rebuilt with every
    token covered by any hot window removed. Overlapping hot windows
    merge into maximal spans, so removal is span-shaped, not
    window-confetti. ``keep_one=True`` exempts the single canonical
    occurrence of each hot window — argmin by (doc id, position), the
    deterministic tie-break — so one copy of the duplicated text
    survives corpus-wide (the Lee et al. policy; the default removes all
    copies, the C4/boilerplate policy).

    Returns (id_col, cleaned_text, n_tokens, n_removed) — one row per
    input document, emptied docs kept with cleaned_text '' (the caller
    owns the drop decision, as in the boilerplate rule).

    Scale shape — linear passes, fingerprint-only heavy shuffles:
    (1) slide the k-window and shuffle (md5(window), doc, pos) rows —
    16-byte fingerprints, never window text — to count corpus
    occurrences; (2) semi-join positions against the over-floor
    fingerprint set (df-filtered, small; AQE broadcasts it);
    (3) per document, reduce hot starts to ±1 coverage EVENTS
    (start:+1, start+k:−1), aggregate to a sorted boundary array —
    |events| ≤ 2·hits, usually ≪ n_tokens — and rebuild with ONE
    `F.aggregate` fold over that small array that concatenates the
    zero-coverage gaps via `F.slice` on the resident token array.
    The fold references only bound ATTRIBUTES (the token array crosses
    a join boundary, the event array an aggregate), never a same-
    projection derived array — the Catalyst re-inlining detonation
    `ext/quality.py:_max_multiplicity` documents cannot trigger. No
    per-token shuffle exists anywhere: token positions stay inside
    their row; only window fingerprints and integer events move."""
    if k < 2:
        raise ValueError(
            f"remove_duplicate_spans: k={k} must be >= 2 — at 1 every "
            f"repeated TOKEN is a 'span' and the corpus empties"
        )
    if min_count < 2:
        raise ValueError(
            f"remove_duplicate_spans: min_count={min_count} must be >= 2 "
            f"— at 1 every span is hot and the corpus empties"
        )
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    # sequence(1, 0) descends — guard short docs to an empty window set
    win_starts = F.when(
        F.col("__n") >= k, F.sequence(F.lit(1), F.col("__n") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        id_col,
        F.explode(win_starts).alias("__p"),
        F.col("__toks"),
    ).select(
        id_col,
        "__p",
        F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__p"), k))).alias(
            "__fp"
        ),
    )
    hot_fps = (
        spans.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__ct"))
        .filter(F.col("__ct") >= min_count)
        .select("__fp")
    )
    hot = spans.join(hot_fps, "__fp")
    if keep_one:
        canonical = hot.groupBy("__fp").agg(
            F.min(F.struct(F.col(id_col).alias("i"), F.col("__p").alias("p"))).alias(
                "__c"
            )
        )
        # NOT broadcast: canonical is one row per hot fingerprint — at
        # corpus scale that set can be arbitrarily large, and hot is
        # already fp-partitioned from the semi-join, so the equi-join
        # reuses the partitioning (AQE still broadcasts when it fits)
        hot = hot.join(canonical, "__fp").filter(
            ~(
                (F.col(id_col) == F.col("__c.i"))
                & (F.col("__p") == F.col("__c.p"))
            )
        )
    events = (
        hot.select(F.col(id_col), F.col("__p").alias("idx"), F.lit(1).alias("d"))
        .unionByName(
            hot.select(
                F.col(id_col), (F.col("__p") + k).alias("idx"), F.lit(-1).alias("d")
            )
        )
        .groupBy(id_col, "idx")
        .agg(F.sum("d").cast("int").alias("d"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("idx", "d"))).alias("__ev"))
    )
    joined = base.join(events, id_col, "left").select(
        id_col,
        "__toks",
        "__n",
        F.coalesce(
            F.col("__ev"), F.array().cast("array<struct<idx:int,d:int>>")
        ).alias("__ev"),
    )
    empty = F.array().cast("array<string>")
    init = F.struct(
        F.lit(0).alias("cov"), F.lit(1).alias("seg"), empty.alias("out")
    )

    def step(acc, e):
        gap = F.when(
            acc["cov"] == 0,
            F.slice(F.col("__toks"), acc["seg"], e["idx"] - acc["seg"]),
        ).otherwise(empty)
        cov2 = acc["cov"] + e["d"]
        return F.struct(
            cov2.alias("cov"),
            F.when(cov2 == 0, e["idx"]).otherwise(acc["seg"]).alias("seg"),
            F.concat(acc["out"], gap).alias("out"),
        )

    kept = F.aggregate(
        F.col("__ev"),
        init,
        step,
        lambda acc: F.concat(
            acc["out"],
            F.when(
                acc["cov"] == 0,
                F.slice(
                    F.col("__toks"), acc["seg"], F.col("__n") - acc["seg"] + 1
                ),
            ).otherwise(empty),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("cleaned_text"),
        F.col("__n").cast("int").alias("n_tokens"),
        (F.col("__n") - F.size(kept)).cast("int").alias("n_removed"),
    )


#: the curly-quote/dash/no-break-space canonicalization table — 1:1
#: positional mapping (Spark ``F.translate`` ≡ DuckDB ``translate``),
#: shared by :func:`normalize_text` and :func:`normalize_text_sql` so the
#: two planes cannot drift. NBSP is the last FROM character on purpose:
#: the SQL twin appends it via ``chr(160)`` to keep the literal printable.
NORMALIZE_TRANSLATE_FROM = "‘’“”–— "
NORMALIZE_TRANSLATE_TO = "''\"\"-- "


def normalize_text(text_col: Column | str) -> Column:
    """C4-style text canonicalization as one regex chain (pure column
    algebra, applied BEFORE any fingerprint/quality pass so that
    byte-level junk cannot make two equal documents hash apart):

    - strip C0/C1 control characters (keep newline and tab), plus the
      Unicode soft hyphen,
    - canonicalize curly quotes/dashes/no-break space to ASCII (the
      highest-frequency mojibake-adjacent variants; full NFC needs a
      UDF and is deliberately out of the JVM chain),
    - collapse runs of spaces/tabs to one space, trim line edges,
    - collapse 3+ newlines to the paragraph separator (2).

    Idempotent: normalize(normalize(x)) == normalize(x) (pinned in
    tests). `curate()` applies this as its default stage 0, and
    :func:`normalize_text_sql` is the DuckDB twin the `quality_filter`
    oracle replays — parity pinned in tests/test_kernels.py."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.regexp_replace(
        c, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u00AD]', ""
    )
    c = F.translate(c, NORMALIZE_TRANSLATE_FROM, NORMALIZE_TRANSLATE_TO)
    c = F.regexp_replace(c, '[ \\t]+', " ")
    c = F.regexp_replace(c, ' ?\\n ?', '\n')
    c = F.regexp_replace(c, '\\n{3,}', '\n\n')
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`normalize_text` over the SQL expression
    ``expr`` — same five steps, same order, built from the same
    ``NORMALIZE_TRANSLATE_*`` table, so a change to the Spark chain that
    forgets this twin fails the `quality_filter` driver hash and the
    parity test rather than silently desyncing the planes.

    Portability notes: the control-class hex escapes (``\\x00`` style)
    are interpreted by RE2 itself (DuckDB single-quoted literals do not
    process backslashes); the soft hyphen and NBSP are appended via
    ``chr()`` because RE2 lacks Java's ``\\uNNNN`` escape; replacement
    newlines are ``chr(10)`` because RE2 replacement strings do not
    expand ``\\n``."""
    ctl = (
        f"regexp_replace({expr}, "
        "'[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F' || chr(173) || ']', '', 'g')"
    )
    frm = "'" + NORMALIZE_TRANSLATE_FROM[:-1] + "' || chr(160)"
    to = "'" + NORMALIZE_TRANSLATE_TO.replace("'", "''") + "'"
    tr = f"translate({ctl}, {frm}, {to})"
    sp = f"regexp_replace({tr}, '[ \\t]+', ' ', 'g')"
    nl = f"regexp_replace({sp}, ' ?\\n ?', chr(10), 'g')"
    para = f"regexp_replace({nl}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"trim({para})"


def ngram_duplication_scores(
    df,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document duplicated-window fraction — the SCORING sibling of
    :func:`remove_duplicate_spans` (same Lee et al. 2022 window
    fingerprints, same total-occurrence floor), emitting the signal
    instead of rewriting text: (id_col, n_windows, dup_windows,
    dup_ppm), where dup_windows counts the document's k-token windows
    whose exact content occurs at least ``min_count`` times ACROSS THE
    CORPUS (within-document repeats count), and dup_ppm =
    floor(1e6·dup/n) (NULL for docs shorter than k tokens — no windows,
    no signal). This is the "what fraction of this page is copied
    somewhere" filter signal web-curation pipelines gate on when they
    would rather DROP a mostly-duplicated document than surgically cut
    its spans — compose with `sample_top_fraction`/`score_buckets` or a
    `curate()` pre-filter.

    Scale shape (inherited from the span remover): one tokenize pass,
    (md5(window), doc) fingerprint rows shuffle for the corpus count —
    16-byte fingerprints, never window text; the over-floor set is
    df-filtered small and the per-doc rollups are map-side combined.
    Exact integers end to end."""
    if k < 2:
        raise ValueError(
            f"ngram_duplication_scores: k={k} must be >= 2 — at 1 every "
            f"repeated TOKEN counts as duplication"
        )
    if min_count < 2:
        raise ValueError(
            f"ngram_duplication_scores: min_count={min_count} must be >= 2 "
            f"— at 1 every window is 'duplicated' and the score saturates"
        )
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    )
    win_starts = F.when(
        F.col("__n") >= k, F.sequence(F.lit(1), F.col("__n") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    spans = base.select(
        id_col, F.explode(win_starts).alias("__p"), F.col("__toks")
    ).select(
        id_col,
        F.md5(
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__p"), k))
        ).alias("__fp"),
    )
    hot_fps = (
        spans.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__ct"))
        .filter(F.col("__ct") >= min_count)
        .select("__fp")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    dup = (
        spans.join(hot_fps, "__fp")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dup_windows"))
    )
    out = (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        )
    )
    return out.withColumn(
        "dup_ppm",
        F.when(
            F.col("n_windows") > 0,
            F.floor(
                F.lit(1_000_000) * F.col("dup_windows") / F.col("n_windows")
            ).cast("long"),
        ),
    )


def token_window_fingerprints(
    df,
    k: int,
    hop: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_id: str = "doc_id",
    normalize: bool = True,
):
    """(out_id, out_id_p 1-based token start, __fp md5-of-k-token-window)
    — the positioned window-fingerprint relation shared by the batch
    attribution vote and the persisted passage index (r12): one row per
    ``hop``-strided window, 16-byte fingerprints + integer positions,
    never window text. Docs shorter than one window emit no rows.
    ``normalize=True`` (default) canonicalizes through `normalize_text`
    BEFORE tokenizing — the curate() stage-0 discipline applied here
    too, so byte-level junk (NBSP, curly quotes, control chars) in
    either the passage or the corpus cannot make a verbatim cut miss
    its attribution. Both sides of a vote must use the same setting
    (the index freezes it in meta)."""
    toks = tokens(normalize_text(text_col) if normalize else text_col)
    base = df.select(
        F.col(id_col).alias(out_id),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    starts = F.when(
        F.col("__n") >= k,
        F.sequence(F.lit(1), F.col("__n") - (k - 1), F.lit(hop)),
    ).otherwise(F.array().cast("array<int>"))
    return base.select(
        out_id,
        F.explode(starts).alias(out_id + "_p"),
        F.col("__toks"),
    ).select(
        out_id,
        out_id + "_p",
        F.md5(
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col(out_id + "_p"), k))
        ).alias("__fp"),
    )


def passage_attribution(
    probes,
    corpus,
    k: int = 8,
    min_matches: int = 2,
    corpus_hop: int = 1,
    probe_id_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
):
    """Passage ATTRIBUTION — "which corpus document was this passage cut
    from, and at which token offset" (r12): the media containment vote
    (`ext/media_subseq.py:frame_signature_containment`'s discipline)
    applied to the text plane's exact k-token window fingerprints.
    Where `decontaminate` flags that an eval n-gram leaked and
    `remove_duplicate_spans` cuts corpus-hot windows, this names the
    SOURCE — (probe_id, doc_id, offset, n_matched), one row per
    (probe, corpus doc, offset) supported by ≥ ``min_matches`` window
    matches, ``offset`` the 0-based token position of the probe's first
    token inside the corpus document.

    Semantics: probe windows slide at hop 1 (every window — the probe
    is small); corpus windows slide at ``corpus_hop`` (the scale knob:
    hop h stores 1/h of the corpus's windows and a verbatim cut still
    votes at its exact offset with ~probe_windows/h votes, because for
    every sampled corpus window the hop-1 probe side holds the aligned
    window — the media tier's stride argument with the divisibility
    requirement on the PROBE side removed). A verbatim cut votes at
    every untouched sampled window; a token edit removes exactly the
    ≤ k windows covering it, so attribution degrades linearly with edit
    density and never collapses at the first touched token
    (constant-offset counting, not run detection). Repeated windows
    (boilerplate inside probe AND corpus) cross-vote at spurious
    offsets — exactly the noise ``min_matches`` gates, and why k should
    exceed the corpus's boilerplate shingle length. Probing a corpus
    that CONTAINS the probe document under the same id self-attributes
    at offset 0 — disjoint id spaces are the expected shape (the
    containment tier's contract).

    Scale shape — the span-removal machinery's: windows shuffle as
    (md5 16 bytes, id, int position), never text; candidates are one
    fingerprint equi-join (AQE broadcasts a small probe side); the vote
    is one group-by over matched pairs. Corpus-side volume is
    n_tokens/corpus_hop rows per doc — the honest cost of positioned
    attribution; a steady-state deployment hops the corpus side and
    keeps probes at hop 1. ``normalize=True`` (default) canonicalizes
    both sides through `normalize_text` first — the curate() stage-0
    discipline, so an NBSP-variant copy of a cut passage still
    attributes (pinned)."""
    if k < 2:
        raise ValueError(f"passage_attribution: k={k} must be >= 2")
    if min_matches < 1:
        raise ValueError(
            f"passage_attribution: min_matches={min_matches} must be >= 1"
        )
    if corpus_hop < 1:
        raise ValueError(
            f"passage_attribution: corpus_hop={corpus_hop} must be >= 1"
        )
    pw = token_window_fingerprints(
        probes, k, 1, probe_id_col, text_col, "probe_id", normalize=normalize
    )
    cw = token_window_fingerprints(
        corpus, k, corpus_hop, id_col, text_col, "ref_id", normalize=normalize
    )
    return (
        pw.join(cw, on="__fp")
        .groupBy(
            "probe_id",
            F.col("ref_id").alias(id_col),
            (F.col("ref_id_p") - F.col("probe_id_p")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= min_matches)
    )
