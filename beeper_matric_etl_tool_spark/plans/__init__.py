from beeper_matric_etl_tool_spark.plans.registry import (
    QuerySpec,
    headline_names,
    oracle_sql,
    queries,
    register,
    specs,
)

__all__ = ["QuerySpec", "register", "queries", "oracle_sql", "specs", "headline_names"]
