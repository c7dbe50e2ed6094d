"""Registered queries — each SURVEY.md §2 operator surfaced as a named
(spark_fn, oracle_sql) pair over the driver testdata.

Role mapping (FIXTURES.md §A): `events` plays `messages` (event_id = natural
key, ts = event time, user_id = sender/room analog, props = JSONB content);
customer/supplier/nation/region play the dimension tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beeper_matric_etl_tool_spark.operators.pagination import keyset_page
from beeper_matric_etl_tool_spark.plans.registry import register
from beeper_matric_etl_tool_spark.sources.tables import table

# --------------------------------------------------------------------------
# Phase 0 flagship — keyset-paginated message page (P3+P4+O2/O3)
# routes.ts:132-143: WHERE room_id=$1 AND timestamp<$3 ORDER BY ts DESC LIMIT $2
# --------------------------------------------------------------------------

PAGE_CURSOR = "2024-06-01 00:00:00"


@register(
    "messages_topk_page",
    headline=True,
    tags=("P3", "P4", "O2", "O3"),
    oracle=f"""
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        WHERE user_id = 12 AND ts < TIMESTAMP '{PAGE_CURSOR}'
        ORDER BY ts DESC, event_id DESC
        LIMIT 50
    """,
)
def messages_topk_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return keyset_page(
        events.select("event_id", "ts", "user_id", "event_type", "value", "props"),
        order_col="ts",
        tie_col="event_id",
        limit=50,
        before=F.lit(PAGE_CURSOR).cast("timestamp"),
        predicate=F.col("user_id") == F.lit(12),
    )
