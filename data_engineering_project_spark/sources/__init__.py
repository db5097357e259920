from data_engineering_project_spark.sources.tables import load_table, load_tables  # noqa: F401
from data_engineering_project_spark.sources.events import (  # noqa: F401
    read_event_files,
    with_filename_event_time,
)
