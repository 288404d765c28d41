"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``bigdatapipelinepysparksqlserver_spark.queries``
(the registry maps every operator from SURVEY.md §2 plus the
LLM-data-pipeline extensions to a (Spark callable, DuckDB oracle) pair).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdatapipelinepysparksqlserver_spark.queries import (
    REGISTRY,
    oracle_queries,
    spark_queries,
)

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: mart query 1 (count-distinct clients per
    country/gender — the reference's `load_sales_mart.py:26-29` analog)
    on sf0.001. Driver checks it runs and yields ≥0 rows."""
    return REGISTRY["mart_client_count"].fn(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for ALL 211 registered queries (100% oracle-backed
    since r9; r10 added winnow-based span decontamination + its apply
    census, exact copy-span verification, and the snapshot-diff/
    zone-map golden; r11 adds the duplicate-span scrub APPLY — the
    token-slice rewrite replayed from the scrub plan's own CTE chain —
    the zone-map-pruned read_where demo, and the CDF-fed row-level
    mart demo, both replaying oracles over orders) — including the
    full MinHash/SimHash/hyperplane-LSH
    pipelines via engine-portable hash families, the HLL-distinct and
    approx-top-k sketches via error-corridor / exact-regime oracles,
    and (since r6) the POLICY-SIZED LSH forms, whose oracles recompute
    the sizing policy from COUNT(*) and regenerate the hyperplane
    constants from the same LCG inside SQL — one static string valid
    at every SF. r9 closed the last rows-only entry: the mapInPandas
    decode output (`media_decode_features`) carries its feature vector
    as a fixed-point string (the array column crashes the driver's
    pandas canon), with DuckDB recomputing from hex(BLOB)."""
    return oracle_queries()
