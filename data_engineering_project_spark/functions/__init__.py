from data_engineering_project_spark.functions.scalars import (  # noqa: F401
    compose_datetime,
    decimal_from_struct,
    epoch_millis_to_ts,
    guid_hex,
)
