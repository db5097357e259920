"""Unit tests for the quality rule engine — the reference's validation
semantics (warehouse.py:91-256): reason tagging, first-rule-wins, clip
auto-correction, non-fatal warnings, fatal missing columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_project_spark import quality as Q

SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.StringType()),
        T.StructField("impression_count", T.LongType()),
        T.StructField("click_count", T.LongType()),
    ]
)

ROWS = [
    ("2022-05-26 11:00:00", 100, 10),  # valid
    ("2022-05-26 12:00:00", 10, 20),  # clicks exceed impressions
    ("2022-05-26 13:00:00", -5, 0),  # negative
    (None, 1, 1),  # null datetime
    ("2022-05-26 14:00:00", -1, 5),  # negative AND clicks>impr → first rule wins
]


def _rules():
    return [
        Q.null_rule(["datetime", "impression_count", "click_count"]),
        Q.negative_rule(["impression_count", "click_count"]),
        Q.clicks_exceed_impressions_rule(),
    ]


def test_split_reasons_first_rule_wins(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    res = Q.split_valid_invalid(df, _rules(), source_file="batch_1.csv")
    invalid = {r["datetime"]: r for r in res.invalid.collect()}
    assert res.valid.count() == 1
    assert invalid["2022-05-26 12:00:00"]["validation_error"] == "Clicks exceed impressions"
    assert invalid["2022-05-26 13:00:00"]["validation_error"] == "Contains negative values"
    assert invalid[None]["validation_error"] == "Contains null values"
    # row violating negative AND clicks>impressions: earlier rule tags it
    assert invalid["2022-05-26 14:00:00"]["validation_error"] == "Contains negative values"
    assert all(r["source_file"] == "batch_1.csv" for r in invalid.values())


def test_auto_correct_clips_clicks(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    res = Q.split_valid_invalid(df, _rules(), auto_correct=True)
    assert res.corrected_rules == ["Clicks exceed impressions"]
    valid = {r["datetime"]: r for r in res.valid.collect()}
    # clipped row is now valid with clicks == impressions (reference clip-to-50
    # golden, tests/test_client_report_etl.py:54-123)
    assert valid["2022-05-26 12:00:00"]["click_count"] == 10
    # null/negative rows still routed
    assert res.invalid.count() == 3


def test_observation_counters(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    res = Q.split_valid_invalid(df, _rules(), observe=True)
    res.valid.count(), res.invalid.count()
    got = res.observation.get
    assert got["n_rows"] == 5
    assert got["n_invalid"] == 4


def test_required_columns_fatal(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="missing required columns"):
        Q.required_columns(df, ["datetime", "nonexistent_col"])
    Q.required_columns(df, ["datetime"])  # present → no raise


def test_domain_rule_nulls_violate(spark):
    df = spark.createDataFrame(
        [(0,), (23,), (24,), (-1,), (None,)],
        T.StructType([T.StructField("hour", T.IntegerType())]),
    )
    res = Q.split_valid_invalid(df, [Q.domain_rule("hour", 0, 23)])
    assert res.valid.count() == 2
    assert res.invalid.count() == 3


def test_classifier_three_way(spark):
    df = spark.createDataFrame(
        [(0, 5), (10, 20), (20, 10), (7, 7)],
        T.StructType(
            [
                T.StructField("impression_count", T.LongType()),
                T.StructField("click_count", T.LongType()),
            ]
        ),
    )
    out = {
        (r["impression_count"], r["click_count"]): r["count_relationship"]
        for r in Q.classify_count_relationship(df).collect()
    }
    assert out[(0, 5)] == "clicks_without_impressions"
    assert out[(10, 20)] == "clicks_exceed_impressions"
    assert out[(20, 10)] == "impressions_exceed_clicks"
    assert out[(7, 7)] == "equal"
