"""Scalar column transforms (SURVEY §2.8 F1–F15).

Each helper re-expresses a hard-coded TS transform from the reference as a
*native* Spark column expression — JVM-side, inside whole-stage codegen, never
a Python UDF. At 100 TB these run fully vectorized over parquet column
batches; a row-at-a-time Python UDF here would be a 10–100× regression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def json_field(col: ColumnOrName, path: str) -> Column:
    """F2 — extract a field from a JSON string column.

    Reference: ``JSON.parse(event.data)`` + property access
    (/root/reference/src/app/components/sync-status.tsx:28). JSONB payloads
    stay `StringType`; `get_json_object` is evaluated inside codegen.
    """
    return F.get_json_object(_col(col), f"$.{path}")


def mxid_domain(col: ColumnOrName) -> Column:
    """F6 — homeserver domain from a Matrix user id (``@alice:example.org``).

    Reference: ``getUserId()?.split(':')[1]``
    (/root/reference/src/server/utils/db.utils.ts:233).
    """
    return F.split(_col(col), ":").getItem(1)


def normalize_matrix_user(col: ColumnOrName) -> Column:
    """F5 — strip an embedded ``https://matrix.`` prefix from the domain half.

    Reference: ``.replace(/^(.+?):https:\\/\\/matrix\\.(.+)$/, '$1:$2')``
    (/root/reference/src/app/matrix/client.ts:151).
    """
    return F.regexp_replace(_col(col), r"^(.+?):https://matrix\.(.+)$", r"$1:$2")


def capitalize(col: ColumnOrName) -> Column:
    """F11 — ``charAt(0).toUpperCase() + slice(1)``
    (/root/reference/src/app/components/sync-status.tsx:121).

    Deliberately NOT `initcap` (which lowercases the tail and splits words);
    the reference only uppercases the first character.
    """
    c = _col(col)
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 2**31 - 1))


def millis_to_ts(col: ColumnOrName) -> Column:
    """F9 — epoch-millis BIGINT → timestamp (event-time plane, SURVEY §1.2)."""
    return F.timestamp_millis(_col(col))


def ts_to_millis(col: ColumnOrName) -> Column:
    """F9 — timestamp → epoch-millis BIGINT."""
    return F.unix_millis(_col(col))


def with_defaults(df: DataFrame, defaults: dict[str, object]) -> DataFrame:
    """F14 — ``?? ''`` / ``?? 0`` null-coalescing applied column-wise
    (/root/reference/src/server/utils/db.utils.ts:92,111,114)."""
    for name, default in defaults.items():
        df = df.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return df


def device_id(col: ColumnOrName, length: int = 10) -> Column:
    """F7 — device-id generation. The reference draws 10 random A–Z chars
    (client.ts:316-321); random output breaks task retries and replay, so
    the engine derives it deterministically: md5 of the seed column,
    hex-digits transliterated into A–P. Same entropy-per-char band, stable
    under recomputation."""
    c = _col(col)
    return F.upper(F.substring(F.translate(F.md5(c.cast("string")),
                                           "0123456789abcdef",
                                           "ABCDEFGHIJKLMNOP"), 1, length))


DOMAIN_RE = r"^[a-z0-9]([a-z0-9-]*[a-z0-9])?(\.[a-z0-9]([a-z0-9-]*[a-z0-9])?)+$"


def is_valid_domain(col: ColumnOrName) -> Column:
    """F13 — URL/domain validity gate (auth-form.tsx:31 `new URL(...)`,
    routes.ts:18 zod `.url()`) as a row-level rlike constraint."""
    return _col(col).rlike(DOMAIN_RE)


def validate_schema(df: DataFrame, expected: "T.StructType") -> DataFrame:
    """F15 — the input-contract gate (zod `loginSchema.parse`,
    routes.ts:15-19): raise unless the frame's schema matches the expected
    (name, type, order) triple. Nullability is advisory in parquet land and
    deliberately not compared."""
    from pyspark.sql import types as T  # noqa: F401

    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in expected.fields]
    if got != want:
        raise ValueError(f"schema contract violation: got {got}, expected {want}")
    return df


def cents(col: ColumnOrName, scale: int = 100) -> Column:
    """Exact integer fixed-point from a 2-decimal-place double column (the
    repo-wide money rule — see ext/text.scaled_ratio for why float round()
    can never appear in a cross-engine-compared output). The
    `floor(x*scale + 0.5)` form runs the same IEEE ops in any engine, so
    identical inputs give identical integers."""
    c = _col(col)
    return F.floor(c * scale + F.lit(0.5)).cast("long")
