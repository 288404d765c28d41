"""Incremental mart maintenance — partition-granular materialized-view
refresh.

The reference recomputes both marts from the FULL lake every run
(`load_sales_mart.py:26-35,:60-70` scan the whole ``sales_history``
table). That is O(corpus) per run; at 100 TB a 15-minute cadence cannot
re-aggregate everything. This module maintains the marts in two levels:

1. a PARTIAL table per mart, partitioned by ``year_month``, holding the
   per-partition aggregate contribution:
     - sales_agg: (year_month, country, product, size, color,
       sales_count, paid_amount) — count/sum are decomposable, so the
       partials re-aggregate exactly;
     - client_count: COUNT(DISTINCT client) is NOT decomposable into
       per-partition counts, so its partial is the distinct
       (year_month, country, gender, client_id) TUPLES — distinct-ness
       re-aggregates exactly (set union), and the partial's size is
       bounded by distinct clients per partition, not rows.
2. a final aggregate over the partial table — O(groups × partitions),
   megabytes where the lake is terabytes.

``refresh(changed)`` recomputes only the partials of partitions the CDC
loader just rebuilt (partition-pruned lake scan), dynamic-overwrites
them, and drops partials of partitions that vanished (delete-to-empty,
same cleanup contract as ``plans.incremental``). Refresh cost is
∝ change set; the full-scan path remains available as the bootstrap /
repair / validation twin (``pipelines.mart_*_df``).
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.expressions import decode_map
from ..sources.lake import LakeTable

SALES_AGG_PARTIAL = StructType(
    [
        StructField("country", StringType()),
        StructField("product", StringType()),
        StructField("size", StringType()),
        StructField("color", StringType()),
        StructField("sales_count", LongType()),
        # sum(DECIMAL(18,2)) widens to DECIMAL(28,2); money stays exact,
        # so partial-then-final summation is bit-equal to the full scan
        StructField("paid_amount", DecimalType(28, 2)),
        StructField("year_month", IntegerType()),
    ]
)

CLIENT_PAIRS_PARTIAL = StructType(
    [
        StructField("country", StringType()),
        StructField("gender", StringType()),
        StructField("client_id", LongType()),
        StructField("year_month", IntegerType()),
    ]
)

CLIENT_SKETCH_PARTIAL = StructType(
    [
        StructField("country", StringType()),
        StructField("gender", StringType()),
        StructField("sk", BinaryType()),
        StructField("year_month", IntegerType()),
    ]
)


class IncrementalMart:
    """Maintains both mart partial tables under ``root`` and serves the
    final mart aggregates from them."""

    def __init__(self, spark: SparkSession, lake: LakeTable, root: str):
        self.spark = spark
        self.lake = lake
        self.sales_partial = LakeTable(
            spark,
            f"{root}/sales_agg_partial",
            partition_cols=("year_month",),
            schema=SALES_AGG_PARTIAL,
        )
        self.client_partial = LakeTable(
            spark,
            f"{root}/client_pairs_partial",
            partition_cols=("year_month",),
            schema=CLIENT_PAIRS_PARTIAL,
        )
        self.client_sketch_partial = LakeTable(
            spark,
            f"{root}/client_sketch_partial",
            partition_cols=("year_month",),
            schema=CLIENT_SKETCH_PARTIAL,
        )

    # -- partial maintenance ----------------------------------------------

    def _changed_lake_rows(self, changed: list[int]) -> DataFrame:
        """Partition-pruned paid-rows scan of the rebuilt partitions
        (PartitionFilters carries the isin; only changed data is read)."""
        return self.lake.read().where(
            F.col("year_month").isin(changed) & (F.col("paid") > 0)
        )

    def refresh(self, changed: list[int]) -> None:
        """Recompute the partials of ``changed`` year_months only.

        Idempotent (C4): dynamic overwrite rewrites each changed
        partition to a pure function of the lake's current content, so
        replays converge. Partitions with no surviving paid rows are
        dropped from the partials (dynamic overwrite cannot clean them).
        """
        if not changed:
            return
        rows = self._changed_lake_rows(changed)
        sales = (
            rows.groupBy("year_month", "country", "product", "size", "color")
            .agg(
                F.count("id").alias("sales_count"),
                F.sum("paid").alias("paid_amount"),
            )
            .select([f.name for f in SALES_AGG_PARTIAL.fields])
        )
        pairs = rows.select(
            "country", "gender", "client_id", "year_month"
        ).distinct()
        sketches = (
            rows.groupBy("year_month", "country", "gender")
            .agg(F.hll_sketch_agg("client_id").alias("sk"))
            .select([f.name for f in CLIENT_SKETCH_PARTIAL.fields])
        )

        for partial, fresh in (
            (self.sales_partial, sales),
            (self.client_partial, pairs),
            (self.client_sketch_partial, sketches),
        ):
            kept = {
                r.year_month
                for r in fresh.select("year_month").distinct().collect()
            }
            partial.overwrite_partitions(fresh)
            stale = [(ym,) for ym in changed if ym not in kept]
            if stale and partial.exists():
                partial.drop_partition_values(stale)

    # -- final marts (small aggregates over partials) ---------------------

    def client_count(self, refresh: datetime) -> DataFrame:
        """Mart query 1 from partials: distinct pairs union exactly, so
        COUNT(DISTINCT) over the partial tuples equals the full-lake
        answer (gender decoded, refresh stamped — A2+F2+F3 parity with
        ``pipelines.mart_client_count_df``)."""
        return (
            self.client_partial.read()
            .select("country", "gender", "client_id")
            .distinct()
            .groupBy("country", "gender")
            .agg(F.count(F.lit(1)).alias("client_count"))
            .select(
                "country",
                decode_map("gender", {"M": "Male", "F": "Female"}, "Other").alias(
                    "gender"
                ),
                "client_count",
                F.lit(refresh).alias("refresh_date"),
            )
        )

    def sales_agg(self, refresh: datetime) -> DataFrame:
        """Mart query 2 from partials: SUM of per-partition counts/sums
        (decomposable aggregates re-aggregate exactly)."""
        return (
            self.sales_partial.read()
            .groupBy("country", "product", "size", "color")
            .agg(
                F.sum("sales_count").alias("sales_count"),
                # re-sum widens 28,2 → 38,2; cast back so the schema is
                # identical to the full-scan mart (values already exact)
                F.sum("paid_amount").cast(DecimalType(28, 2)).alias("paid_amount"),
            )
            .withColumn("refresh_date", F.lit(refresh))
        )

    def client_count_sketched(self, refresh: datetime) -> DataFrame:
        """Approximate twin of :meth:`client_count` via RE-AGGREGATABLE
        HLL sketches (Datasketches ``hll_sketch_agg`` / ``hll_union_agg``).

        Scale trade-off: the exact path's partial is the distinct client
        TUPLES per partition — worst case O(clients) rows per partition.
        The sketch partial (maintained by ``refresh`` alongside the exact
        tables) is a fixed ~KB binary per (partition, group) regardless
        of client count, and sketches MERGE exactly (unlike plain
        approx_count_distinct numbers, which cannot be re-summed without
        double-counting clients active in several partitions).
        ±~2% error at the default lgConfigK=12; the mart's reconciliation
        contract stays on the exact path — this is the
        dashboard/estimation tier.
        """
        return (
            self.client_sketch_partial.read()
            .groupBy("country", "gender")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                    "client_count_approx"
                )
            )
            .select(
                "country",
                decode_map("gender", {"M": "Male", "F": "Female"}, "Other").alias(
                    "gender"
                ),
                "client_count_approx",
                F.lit(refresh).alias("refresh_date"),
            )
        )

    def bootstrap(self) -> None:
        """Full build of both partials from the whole lake — first run or
        repair path; every subsequent run uses ``refresh``."""
        lake_df = self.lake.read()
        parts = [
            r.year_month
            for r in lake_df.select("year_month").distinct().collect()
        ]
        self.refresh(parts)
