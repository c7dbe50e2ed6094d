"""Local mirror of the driver's DuckDB-oracle comparison (BASELINE.md):
row-count + schema-width + order-insensitive value comparison, so every
queries()/oracle_sql() pair is validated in pytest before the driver sees it.
"""

from __future__ import annotations

import datetime as dt
import math
from collections.abc import Iterable

import duckdb

from beeper_matric_etl_tool_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _canon_rows(cols: list[str], rows: Iterable[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)


# DuckDB wire type → the Spark simpleString it pandas-converts compatibly
# with. Anything NOT in this map (notably HUGEINT, DuckDB's integer-sum
# result type, which pandas turns into float64/object) is a driver hash
# hazard even when values are equal — round 1 shipped 10 such red rows.
_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "DATE": "date",
    "BLOB": "binary",
    # JSON pandas-converts to plain str — proven hash-safe vs Spark string
    # (rooms_with_participants was green in CORRECTNESS_r01)
    "JSON": "string",
}


def _spark_equiv(duck_type: str) -> str | None:
    t = str(duck_type).upper()
    if t.endswith("[]"):
        inner = _spark_equiv(t[:-2])
        return f"array<{inner}>" if inner else None
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    return _DUCK_TO_SPARK.get(t)


# Integer widths all pandas-convert to int64 and proved hash-safe in r1
# (text_stats: Spark int vs DuckDB BIGINT was green); HUGEINT did not.
_WIDTH_CLASS = {
    "tinyint": "integer", "smallint": "integer", "int": "integer", "bigint": "integer",
    "float": "floating", "double": "floating",
}


def _canon_type(t: str) -> str:
    return _WIDTH_CLASS.get(t, t)


def _assert_types_compatible(spark_df, rel) -> None:
    spark_types = {name.lower(): dtype for name, dtype in spark_df.dtypes}
    for name, duck_type in zip(rel.columns, rel.types):
        want = _spark_equiv(duck_type)
        got = spark_types.get(name.lower())
        assert want is not None, (
            f"oracle column {name!r} has DuckDB type {duck_type} with no stable "
            f"Spark twin (HUGEINT? array?) — CAST it in the oracle SQL"
        )
        assert got is not None and _canon_type(got) == _canon_type(want), (
            f"column {name!r} type mismatch: spark={got} duckdb={duck_type} "
            f"(expected spark {want}) — the driver's hash is type-sensitive"
        )


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    con = duckdb_conn(sf_dir)
    rel = con.sql(sql)
    _assert_types_compatible(spark_df, rel)
    exp_cols, exp_rows = list(rel.columns), rel.fetchall()
    act_cols = list(spark_df.columns)
    act_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(act_cols) == sorted(
        [c.lower() for c in exp_cols]
    ) or sorted(act_cols) == sorted(exp_cols), f"columns differ: spark={act_cols} duckdb={exp_cols}"
    assert len(act_rows) == len(exp_rows), f"row count differs: spark={len(act_rows)} duckdb={len(exp_rows)}"
    a, e = _canon_rows(act_cols, act_rows), _canon_rows(exp_cols, exp_rows)
    mismatches = [(x, y) for x, y in zip(a, e) if x != y]
    assert not mismatches, f"{len(mismatches)} row(s) differ; first: spark={mismatches[0][0]!r} duckdb={mismatches[0][1]!r}"
