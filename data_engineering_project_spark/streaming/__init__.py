from data_engineering_project_spark.streaming.pipeline import (  # noqa: F401
    hourly_counts_stream,
    read_event_stream,
    run_incremental_report,
)
