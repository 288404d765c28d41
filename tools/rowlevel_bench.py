"""Row-level mart refresh cost vs partition-grain recompute
(VERDICT r10 #5 done-criterion): one hot month holds N rows, a cycle
changes C=2000 of them. The partition-grain path re-aggregates all N;
the CDF-fed path folds 2C diff rows into the partials. Run at N=30k
and N=3M (100×) to show the row-level cost tracks diff ROWS.

Usage: python tools/rowlevel_bench.py [N ...]   (default: 30000 3000000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from bigdatapipelinepysparksqlserver_spark.plans.mart_rowlevel import (  # noqa: E402
    RowLevelMart,
)
from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (  # noqa: E402
    SnapshotLakeTable,
)

SCHEMA = (
    "id long, paid decimal(18,2), client_id long, gender string,"
    " product string, size string, color string,"
    " year_month int, country string"
)
HOT = 202405


def _rows(spark, n, start=0, price_bump=0):
    return spark.range(start, start + n).select(
        F.col("id"),
        ((F.col("id") % 900 + 100 + price_bump) / 100)
        .cast("decimal(18,2)")
        .alias("paid"),
        (F.col("id") % 5000).alias("client_id"),
        F.when(F.col("id") % 2 == 0, "M").otherwise("F").alias("gender"),
        F.concat(F.lit("p"), (F.col("id") % 40).cast("string")).alias(
            "product"
        ),
        F.element_at(
            F.array(F.lit("S"), F.lit("M"), F.lit("L")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("size"),
        F.element_at(
            F.array(F.lit("red"), F.lit("blue")),
            (F.col("id") % 2 + 1).cast("int"),
        ).alias("color"),
        F.lit(HOT).alias("year_month"),
        F.lit("US").alias("country"),
    )


def run(spark, n, changed=2000):
    root = tempfile.mkdtemp(prefix=f"rl_{n}_")
    try:
        lake = SnapshotLakeTable(
            spark, f"{root}/lake", schema=SCHEMA, retain=4
        )
        lake.write_full(_rows(spark, n))
        mart = RowLevelMart(spark, lake, f"{root}/mart")
        mart.bootstrap()

        # the cycle: `changed` rows get a price bump (update =
        # delete+insert in the CDF); the lake publish itself rewrites
        # the hot partition (the CDC loader's own cost, identical for
        # both mart strategies and NOT timed here)
        old = _rows(spark, changed)
        new = _rows(spark, changed, price_bump=37)
        content = new.unionByName(_rows(spark, n - changed, start=changed))
        cdf = new.withColumn("change", F.lit("insert")).unionByName(
            old.withColumn("change", F.lit("delete"))
        )
        lake.apply_rebuild(content, changed_year_months=[HOT], changes=cdf)

        t0 = time.monotonic()
        touched = mart.refresh_to()
        rowlevel_s = time.monotonic() - t0
        assert touched == [HOT]

        # partition-grain twin: re-aggregate the WHOLE hot partition
        # into both partials and overwrite (plans/mart_incremental's
        # cost model), against throwaway partial tables
        twin = RowLevelMart(spark, lake, f"{root}/twin")
        t0 = time.monotonic()
        sales, client = twin._partials_from(
            lake.read().where(F.col("year_month") == HOT)
        )
        twin.sales_partial.write_full(sales)
        twin.client_partial.write_full(client)
        partition_s = time.monotonic() - t0

        # equivalence spot-check: identical final sales mart
        from datetime import datetime

        a = {
            tuple(r)[:6]
            for r in mart.sales_agg(datetime(2024, 7, 1)).collect()
        }
        b = {
            tuple(r)[:6]
            for r in twin.sales_agg(datetime(2024, 7, 1)).collect()
        }
        assert a == b, "row-level partials diverged from full recompute"
        return {
            "metric": "rowlevel_mart_refresh",
            "hot_rows": n,
            "diff_rows": 2 * changed,
            "rowlevel_refresh_s": round(rowlevel_s, 2),
            "partition_recompute_s": round(partition_s, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [30_000, 3_000_000]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run(spark, n)))
    spark.stop()
