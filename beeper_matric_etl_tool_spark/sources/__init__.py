from beeper_matric_etl_tool_spark.sources.tables import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
