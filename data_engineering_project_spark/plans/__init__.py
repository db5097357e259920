from data_engineering_project_spark.plans.catalog import QUERIES, queries, oracle_sql  # noqa: F401
