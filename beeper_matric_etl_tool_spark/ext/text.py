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


def cents(col: Column | str) -> Column:
    """Re-export of functions.scalar.cents (the repo-wide money rule)."""
    from beeper_matric_etl_tool_spark.functions.scalar import cents as _cents

    return _cents(col)
