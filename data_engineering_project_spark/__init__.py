"""data_engineering_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (``airidas23/data_engineering_project``), re-expressed as
idiomatic Spark DataFrame plans:

- nested-parquet event ingestion with *filename-derived* batch time
  (reference: ``src/Task1/data_processing.py:238-244``)
- nested-column filters, hourly aggregation, dense hour-spine reports
  (reference: ``src/Task1/data_processing.py:299-366``)
- a declarative data-quality layer with dead-letter routing
  (reference: ``src/Task2/warehouse.py:91-256``)
- idempotent CSV + JDBC warehouse sinks with archive/merge semantics
  (reference: ``src/Task2/warehouse.py:391-485``)
- a Structured Streaming incremental mode replacing cron micro-batching
  (reference: ``docker/cron/schedules.py``)

plus large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing) that the reference does not have
but a 100 TB deployment needs.

Everything is Catalyst-planned: no RDDs, no custom execution engine.
"""

__version__ = "0.1.0"

from data_engineering_project_spark.session import get_spark  # noqa: F401
