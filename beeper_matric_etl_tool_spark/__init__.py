"""beeper_matric_etl_tool_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``bigg-S/Beeper-Matric-ETL-Tool``.

The reference (/root/reference, TypeScript ETL syncing Matrix chat data into
Postgres) is treated as a *semantic spec*: its operator inventory is catalogued
in SURVEY.md §2 and re-expressed here Spark-first — declarative DataFrame plans
that Catalyst/Tungsten optimize (predicate pushdown, broadcast joins,
whole-stage codegen) — never as a mechanical port of its imperative handlers.

Layout
------
- ``session``    SparkSession factory tuned for the 100 TB design point
- ``sources``    batch parquet table readers + streaming event source
- ``functions``  scalar column transforms (SURVEY §2.8 F1–F15)
- ``operators``  relational operators: pagination, joins/nesting, stats,
                 dedup/upsert kernels, change-detection merge, integrity
- ``streaming``  Structured Streaming wiring (SURVEY §2.9 T1–T8)
- ``ext``        LLM-data-pipeline tier: dedup (MinHash/SimHash), similarity
                 search, text analysis, multimodal columns (SURVEY §2.12)
- ``plans``      the query registry that __spark_entry__.py exposes
"""

from beeper_matric_etl_tool_spark.session import get_spark
from beeper_matric_etl_tool_spark.sources.tables import TABLES, load_tables, table

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "table", "TABLES", "__version__"]
