"""The workhorse correctness gate: every registered query with an oracle is
hash-compared against DuckDB at sf0.001 (fast tier; the driver re-runs the
same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from beeper_matric_etl_tool_spark import plans
from tests.oracle import assert_matches_oracle

_SPECS = plans.specs()
_WITH_ORACLE = [name for name, s in _SPECS.items() if s.oracle is not None]
_ROWS_ONLY = [name for name, s in _SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _SPECS[name]
    assert_matches_oracle(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = _SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_every_oracle_backed_query_fits_driver_window():
    """The grading driver hash-checks only the first DRIVER_WINDOW entries
    of queries(); the catalog is consolidated so EVERY oracle-backed query
    holds a slot — an entry parked outside the window has no driver
    correctness evidence no matter how green pytest is."""
    from beeper_matric_etl_tool_spark.plans.registry import DRIVER_WINDOW

    names = list(_SPECS)
    for name in _WITH_ORACLE:
        assert names.index(name) < DRIVER_WINDOW, (
            f"{name} is oracle-backed but sits outside the driver's "
            f"first-{DRIVER_WINDOW} window"
        )


def test_minhash_oracle_literals_stay_in_sync():
    """near_dup_pairs' oracle predates the _minhash_band_cte builder and
    interleaves the simhash funnel, so it still spells its banding
    literals out by hand; this pins them to the single-source constants
    (ext/dedup.py via catalog_ext) so an engine-default change that
    re-derives the builder-based oracles cannot silently leave this one
    behind."""
    from beeper_matric_etl_tool_spark.plans import catalog_ext as ce

    sql = _SPECS["near_dup_pairs"].oracle
    w = ce.MINHASH_BAND_WIDTH
    assert f"generate_series(0, {ce.MINHASH_NUM_HASHES - 1})" in sql
    assert f"b*{w} + 1, b*{w} + {w}" in sql
    assert f"range(0, {ce.MINHASH_NUM_HASHES // w})" in sql
