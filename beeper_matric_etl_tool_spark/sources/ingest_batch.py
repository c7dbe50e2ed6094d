"""Batch file-ingest sources with a dead-letter contract (SURVEY §2.1's
ingest plane, batch side — the streaming twin lives in streaming/ingest.py).

The reference ingests wire-format events and refuses to lose a record
silently (failed rows surface in its status plane). The Spark-first batch
equivalent: read the file as LINES, parse each line against the declared
schema with `from_csv`/`from_json`, and route unparseable lines to a
dead-letter frame WITH the raw line preserved — never DROPMALFORMED
(silent loss), never an abort-the-job FAILFAST.

Why lines + from_csv instead of `spark.read.csv(mode=PERMISSIVE,
columnNameOfCorruptRecord=...)`: the reader-level corrupt column carries a
long-standing restriction (queries referencing only the corrupt column
are disallowed, so splitting good/bad requires caching the whole input —
a non-starter at 100 TB). Parsing per line keeps the split a single
shuffle-free pass: text scan → parse expression → two filtered
projections of the same relation, all inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: name of the corrupt-capture field injected into the parse struct; the
#: leading underscores keep it out of every schema the caller declares
CORRUPT_COL = "__corrupt"


def _split_parsed(
    lines: DataFrame, parsed, header_line: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Split parsed lines into (good, dead). ``dead`` carries
    (raw_line, reason) with reason ∈ ('malformed', 'header') — EVERY input
    line lands in exactly one side, so good.count() + dead.count() equals
    the input line count unconditionally (the 'never lose a record
    silently' invariant, now including header stripping)."""
    with_parse = lines.select(
        F.col("value").alias("__raw"), parsed.alias("__p")
    )
    is_header = (
        (F.col("__raw") == header_line) if header_line is not None else F.lit(False)
    )
    bad_pred = is_header | F.col(f"__p.{CORRUPT_COL}").isNotNull()
    good = with_parse.filter(~bad_pred).select("__p.*").drop(CORRUPT_COL)
    dead = with_parse.filter(bad_pred).select(
        F.col("__raw").alias("raw_line"),
        F.when(is_header, F.lit("header")).otherwise(F.lit("malformed")).alias("reason"),
    )
    return good, dead


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"ingest schema may not declare the reserved field {CORRUPT_COL!r}"
        )
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    skip_header: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """CSV/TSV batch ingest under a schema CONTRACT. Returns
    ``(good, dead)``: ``good`` carries exactly the declared schema;
    ``dead`` is one ``(raw_line, reason)`` per line not in ``good`` —
    ``reason='malformed'`` for unparseable input (type mismatch, wrong
    column count, broken quoting), ``reason='header'`` for stripped
    header lines — the batch dead-letter, mirroring streaming/ingest.py's
    error column.

    ``skip_header=True`` classifies lines equal to the schema's rendered
    header (``sep.join(field names)``) as ``reason='header'`` rows of
    ``dead`` — per-line parsing has no file position, so the header is
    recognized by CONTENT, and the stripped lines stay counted/auditable
    in the dead side rather than being silently discarded. A header naming
    different columns than the declared schema parses as a malformed line
    and lands in ``dead`` with ``reason='malformed'`` — the correct loud
    outcome for a file/schema mismatch.

    ALL-STRING-SCHEMA HAZARD: with every declared field a string, a
    legitimate DATA row whose values coincide exactly with the column
    names is indistinguishable from a header by content and is classified
    ``reason='header'`` too. It is never lost — it sits in ``dead``,
    counted — but a caller with an all-string schema whose data domain
    may contain the header tuple should pass ``skip_header=False`` and
    drop the header rows itself (with any non-string field the header
    cannot parse, so such collisions are impossible)."""
    lines = spark.read.text(path)
    header_line = sep.join(f.name for f in schema.fields) if skip_header else None
    parsed = F.from_csv(
        F.col("value"),
        _with_corrupt(schema).simpleString(),
        {"sep": sep, "mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split_parsed(lines, parsed, header_line=header_line)


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """NDJSON batch ingest under a schema contract — same ``(good, dead)``
    split as :func:`read_delimited` (NDJSON has no header concept, so
    every ``dead`` row carries ``reason='malformed'``). Unparseable JSON
    lands in ``dead``;
    parseable JSON MISSING declared fields yields nulls (JSON is sparse by
    design — per-field presence gates belong to the quality tier, e.g.
    functions/scalar.py:validate_schema)."""
    lines = spark.read.text(path)
    parsed = F.from_json(
        F.col("value"),
        _with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split_parsed(lines, parsed)
