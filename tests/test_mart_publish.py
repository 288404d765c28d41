"""Mart aggregation + atomic staging→final publish (A2/A3/F2/F3, M4/M5)."""

from __future__ import annotations

from datetime import datetime

import pytest

from bigdatapipelinepysparksqlserver_spark.pipelines import (
    MartPublisher,
    mart_client_count_df,
    mart_sales_agg_df,
    run_pipeline_2,
)
from bigdatapipelinepysparksqlserver_spark.sources.lake import LakeTable

REFRESH = datetime(2024, 6, 2, 8, 0)


def _lake(spark, tmp_path):
    lake = LakeTable(spark, str(tmp_path / "lake"))
    rows = [
        # id, sale_date, paid, client_id, gender, product_id, product, size, color, updated_date, ym, country
        (1, datetime(2024, 1, 5), "10.00", 1, "M", 1, "tshirt", "M", "red", None, 202401, "PT"),
        (2, datetime(2024, 1, 6), "20.00", 1, "M", 1, "tshirt", "M", "red", None, 202401, "PT"),
        (3, datetime(2024, 1, 7), "0.00", 2, "F", 2, "hoodie", "L", "blue", None, 202401, "PT"),  # promo → excluded
        (4, datetime(2024, 2, 1), "30.00", 3, "X", 2, "hoodie", "L", "blue", None, 202402, "ES"),
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        rows,
        "id long, sale_date timestamp, paid string, client_id long, gender string, "
        "product_id long, product string, size string, color string, "
        "updated_date timestamp, year_month int, country string",
    ).withColumn("paid", F.col("paid").cast("decimal(18,2)"))
    lake.write_full(df)
    return lake


def test_mart_queries(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    m1 = {(r.country, r.gender): r.client_count for r in mart_client_count_df(lake.read(), REFRESH).collect()}
    # promo (paid=0) excluded; gender decoded; count DISTINCT clients
    assert m1 == {("PT", "Male"): 1, ("ES", "Other"): 1}

    m2 = {
        (r.country, r.product): (r.sales_count, str(r.paid_amount))
        for r in mart_sales_agg_df(lake.read(), REFRESH).collect()
    }
    assert m2 == {("PT", "tshirt"): (2, "30.00"), ("ES", "hoodie"): (1, "30.00")}


def test_publish_swap_atomicity(spark, tmp_path):
    lake = _lake(spark, tmp_path)
    mart = MartPublisher(str(tmp_path / "mart"))
    rep = run_pipeline_2(spark, lake, mart, REFRESH)
    assert rep["published"] == ["sales_history_1", "sales_history_2"]
    assert mart.read(spark, "sales_history_1").count() == 2

    # second publish replaces the snapshot wholesale (truncate semantics)
    run_pipeline_2(spark, lake, mart, REFRESH)
    assert mart.read(spark, "sales_history_1").count() == 2
    # no staging leftovers after publish
    import os

    assert not os.path.isdir(mart.staging_path("sales_history_1"))


def test_publish_without_staging_raises(spark, tmp_path):
    mart = MartPublisher(str(tmp_path / "mart"))
    with pytest.raises(FileNotFoundError):
        mart.publish("sales_history_1")
