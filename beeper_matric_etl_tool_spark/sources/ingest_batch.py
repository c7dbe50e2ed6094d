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


def _split_parsed(lines: DataFrame, parsed) -> tuple[DataFrame, DataFrame]:
    with_parse = lines.select(
        F.col("value").alias("__raw"), parsed.alias("__p")
    )
    bad_pred = F.col(f"__p.{CORRUPT_COL}").isNotNull()
    good = with_parse.filter(~bad_pred).select("__p.*").drop(CORRUPT_COL)
    dead = with_parse.filter(bad_pred).select(F.col("__raw").alias("raw_line"))
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
    ``dead`` is one ``raw_line`` per unparseable input line (type
    mismatch, wrong column count, broken quoting) — the batch dead-letter,
    mirroring streaming/ingest.py's error column.

    ``skip_header=True`` drops lines equal to the schema's rendered
    header (``sep.join(field names)``) — per-line parsing has no file
    position, so the header is recognized by content; a header naming
    different columns than the declared schema is itself a malformed line
    and lands in ``dead``, which is the correct loud outcome for a
    file/schema mismatch."""
    lines = spark.read.text(path)
    if skip_header:
        header_line = sep.join(f.name for f in schema.fields)
        lines = lines.filter(F.col("value") != header_line)
    parsed = F.from_csv(
        F.col("value"),
        _with_corrupt(schema).simpleString(),
        {"sep": sep, "mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split_parsed(lines, parsed)


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """NDJSON batch ingest under a schema contract — same ``(good, dead)``
    split as :func:`read_delimited`. Unparseable JSON lands in ``dead``;
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
