"""JDBC wrapper configuration (S1/S9) — no database in the container, so
these verify the constructed reader options and pushdown-subquery shape."""

from __future__ import annotations

import pytest

from bigdatapipelinepysparksqlserver_spark.sources.jdbc import (
    JdbcConfig,
    jdbc_reader,
    jdbc_scan_options,
)

CFG = JdbcConfig(
    url="jdbc:sqlserver://db:1433;databaseName=Production",
    user="sa",
    password="x",
)


def test_scan_options_partitioned():
    opts = jdbc_scan_options(
        CFG, "(SELECT * FROM Sales WHERE Year_Month = 202401) q",
        partition_column="ID", lower_bound=1, upper_bound=100_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "ID"
    assert opts["numPartitions"] == "16"
    assert opts["dbtable"].startswith("(SELECT")
    assert opts["driver"].endswith("SQLServerDriver")


def test_scan_options_requires_bounds():
    with pytest.raises(ValueError, match="bound"):
        jdbc_scan_options(CFG, "Sales", partition_column="ID")


def test_reader_constructs(spark):
    # building the reader performs no connection; load() would
    r = jdbc_reader(spark, CFG, "Sales")
    assert r is not None
