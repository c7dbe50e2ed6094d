"""Grouped-map Pandas stage (`applyInPandas`) with a native twin.

Engine policy (SURVEY §2.10): native column algebra first, Arrow-batched
Pandas only where built-ins genuinely can't express the computation. This
module carries BOTH forms of the same operator — per-key standardization
(z-score) — so the policy is testable: the Pandas form exists for logic
that will outgrow SQL (model scoring, scipy transforms), and its output is
pinned equal to the native form while it hasn't.

Scale note: applyInPandas shuffles the full group to one task — a hot key
is a straggler. The native window form partial-aggregates the moments and
never materializes a group in memory. That asymmetry is WHY native-first
is the policy and not a style preference.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zscore_native(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key z-score via window moments — no Python, no group
    materialization; population variance (ddof=0)."""
    w = Window.partitionBy(key)
    mean = F.avg(F.col(value)).over(w)
    std = F.stddev_pop(F.col(value)).over(w)
    # std is NULL for an all-null group — treat like zero spread, matching
    # the pandas twin's isna branch
    z = F.when(std.isNull() | (std == 0), F.lit(0.0)).otherwise((F.col(value) - mean) / std)
    return df.withColumn("zscore", z)


def zscore_pandas(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key z-score via applyInPandas — the grouped-map escape hatch."""
    fields = df.schema.fields
    out_schema = T.StructType(list(fields) + [T.StructField("zscore", T.DoubleType())])

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value].std(ddof=0)
        if std == 0 or pd.isna(std):
            pdf["zscore"] = 0.0
        else:
            pdf["zscore"] = (pdf[value] - pdf[value].mean()) / std
        return pdf

    return df.groupBy(key).applyInPandas(standardize, schema=out_schema)
