"""Boundary semantics of the scalar expression library (F1/F2/F6/F7, P2)."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pyspark.sql.functions as F

from bigdatapipelinepysparksqlserver_spark.functions.expressions import (
    dec,
    decode_map,
    half_open_window,
    null_default,
    year_month,
    year_month_day,
)


def test_half_open_window_exact_boundaries(spark):
    """An event stamped exactly at the cutoff belongs to the NEXT window —
    the CDC exactly-once contract (load_sales_history.py:76-94)."""
    start = datetime(2024, 1, 1, 12, 0, 0)
    end = datetime(2024, 1, 2, 12, 0, 0)
    rows = [
        (1, datetime(2024, 1, 1, 11, 59, 59, 999999)),  # before start
        (2, start),                                      # exactly start -> in
        (3, datetime(2024, 1, 2, 0, 0, 0)),              # inside
        (4, datetime(2024, 1, 2, 11, 59, 59, 999999)),   # last micro inside
        (5, end),                                        # exactly end -> out
    ]
    df = spark.createDataFrame(rows, ["id", "ts"])
    got = sorted(
        r.id for r in df.where(half_open_window("ts", start, end)).collect()
    )
    assert got == [2, 3, 4]


def test_half_open_window_full_load(spark):
    end = datetime(2024, 1, 2)
    df = spark.createDataFrame(
        [(1, datetime(2020, 1, 1)), (2, datetime(2024, 1, 2))], ["id", "ts"]
    )
    got = [r.id for r in df.where(half_open_window("ts", None, end)).collect()]
    assert got == [1]


def test_year_month_and_day(spark):
    df = spark.createDataFrame([(datetime(2024, 3, 7, 23, 59),)], ["ts"])
    r = df.select(
        year_month("ts").alias("ym"), year_month_day("ts").alias("ymd")
    ).first()
    assert (r.ym, r.ymd) == (202403, 20240307)


def test_decode_map_and_null_default(spark):
    df = spark.createDataFrame([("M",), ("F",), ("X",), (None,)], ["g"])
    got = [
        r.d
        for r in df.select(
            decode_map("g", {"M": "Male", "F": "Female"}, "Other").alias("d")
        ).collect()
    ]
    assert got == ["Male", "Female", "Other", "Other"]
    df2 = spark.createDataFrame([(None,), (7,)], "v int")
    assert [r.n for r in df2.select(null_default(F.col("v")).alias("n")).collect()] == [0, 7]


def test_decimal_sum_exact(spark):
    """Decimal aggregation is exact — the reconcile contract."""
    df = spark.createDataFrame([("0.10",), ("0.20",), ("0.70",)], ["v"])
    s = df.select(dec("v").alias("v")).agg(F.sum("v").alias("s")).first().s
    assert s == Decimal("1.00")
