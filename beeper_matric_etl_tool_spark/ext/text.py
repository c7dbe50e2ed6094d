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
