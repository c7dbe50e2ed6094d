from beeper_matric_etl_tool_spark.functions.scalar import (
    capitalize,
    json_field,
    millis_to_ts,
    mxid_domain,
    normalize_matrix_user,
    ts_to_millis,
    with_defaults,
)

__all__ = [
    "json_field",
    "mxid_domain",
    "normalize_matrix_user",
    "capitalize",
    "millis_to_ts",
    "ts_to_millis",
    "with_defaults",
]
