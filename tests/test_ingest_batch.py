"""Batch file ingest with the dead-letter contract (sources/ingest_batch.py):
every input line ends up in exactly one of (good, dead) — schema violations
are loud, never silently dropped or nulled."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from beeper_matric_etl_tool_spark.sources.ingest_batch import (
    CORRUPT_COL,
    read_delimited,
    read_json_lines,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_read_delimited_splits_good_and_dead(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"        # header
        "1,alice,0.5\n"          # good
        "2,bob,0.75\n"           # good
        "notanint,carol,0.1\n"   # bad: type mismatch
        "3,dave\n"               # bad: too few columns
        "4,erin,0.9,extracol\n"  # bad: too many columns
    )
    good, dead = read_delimited(spark, str(p), SCHEMA, skip_header=True)
    good_rows = {r["id"]: r for r in good.collect()}
    dead_by_reason: dict[str, list[str]] = {}
    for r in dead.collect():
        dead_by_reason.setdefault(r["reason"], []).append(r["raw_line"])

    assert good.columns == ["id", "name", "score"]
    assert dead.columns == ["raw_line", "reason"]
    assert set(good_rows) >= {1, 2}
    assert good_rows[1]["name"] == "alice" and good_rows[1]["score"] == 0.5
    # type-mismatch and wrong-column-count lines are dead-lettered
    # verbatim (from_csv treats BOTH too-few and too-many columns as
    # malformed — no silent null-padding)
    assert "notanint,carol,0.1" in dead_by_reason["malformed"]
    assert "3,dave" in dead_by_reason["malformed"]
    assert "4,erin,0.9,extracol" in dead_by_reason["malformed"]
    # the stripped header is COUNTED in dead (reason='header'), never
    # silently discarded — every input line is in exactly one side
    assert dead_by_reason["header"] == ["id,name,score"]
    assert good.count() + dead.count() == 6


def test_skip_header_all_string_collision_is_audited(spark, tmp_path):
    """The documented all-string-schema hazard: a DATA row whose values
    equal the column names is classified reason='header' — auditable in
    dead, not silently lost (the 'never lose a record' invariant holds)."""
    schema = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.StringType())]
    )
    p = tmp_path / "in.csv"
    p.write_text("a,b\nx,y\na,b\n")  # line 3 is DATA colliding with the header
    good, dead = read_delimited(spark, str(p), schema, skip_header=True)
    assert [tuple(r) for r in good.collect()] == [("x", "y")]
    headers = [r["raw_line"] for r in dead.collect() if r["reason"] == "header"]
    assert headers == ["a,b", "a,b"]  # both occurrences counted, none vanished
    assert good.count() + dead.count() == 3


def test_read_json_lines_splits_good_and_dead(spark, tmp_path):
    p = tmp_path / "in.ndjson"
    p.write_text(
        '{"id": 1, "name": "alice", "score": 0.5}\n'
        '{"id": 2, "name": "bob"}\n'          # missing field -> null (sparse JSON)
        'this is not json\n'                  # dead
        '{"id": "x", "name": 3}\n'            # dead: id type mismatch
    )
    good, dead = read_json_lines(spark, str(p), SCHEMA)
    good_rows = {r["id"]: r for r in good.collect() if r["id"] is not None}
    dead_rows = sorted(r["raw_line"] for r in dead.collect())

    assert 1 in good_rows and good_rows[1]["score"] == 0.5
    assert 2 in good_rows and good_rows[2]["score"] is None
    assert "this is not json" in dead_rows
    # NDJSON has no header concept — every dead row is 'malformed'
    assert {r["reason"] for r in dead.collect()} == {"malformed"}
    assert good.count() + dead.count() == 4


def test_reserved_corrupt_field_rejected(spark, tmp_path):
    bad_schema = T.StructType([T.StructField(CORRUPT_COL, T.StringType())])
    with pytest.raises(ValueError, match="reserved"):
        read_delimited(spark, str(tmp_path), bad_schema)


def test_catalog_import_writes_no_fixture(tmp_path):
    """Importing the query catalog is side-effect-free: the ingest
    fixture materializes at first USE (token_positions body /
    registry.oracle_sql()), never at import (round-6 verdict item #8).
    Run in a child process with a private TMPDIR so the check sees a
    clean slate."""
    import subprocess
    import sys

    code = (
        "import glob, tempfile;"
        "import beeper_matric_etl_tool_spark.plans.catalog_ext;"
        "leak = glob.glob(tempfile.gettempdir() + '/spark-graft-ingest-fixture*');"
        "assert not leak, leak;"
        "from beeper_matric_etl_tool_spark.plans import registry;"
        "registry.oracle_sql();"
        "made = glob.glob(tempfile.gettempdir() + '/spark-graft-ingest-fixture*');"
        "assert made, 'oracle_sql() must materialize the fixture'"
    )
    env = dict(**__import__('os').environ, TMPDIR=str(tmp_path))
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert res.returncode == 0, res.stderr
