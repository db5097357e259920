from data_engineering_project_spark.sinks.csv_sink import write_daily_csv  # noqa: F401
from data_engineering_project_spark.sinks.warehouse_sink import (  # noqa: F401
    MergeSpec,
    build_merge_statements,
)
