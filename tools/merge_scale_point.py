"""Row-level MERGE scale point: a CONSTANT-size merge batch against a
1x vs 100x lake.

The claim under test (SnapshotLakeTable.merge_rows): merge cost is
dominated by (a) the matched-key LOCATION scan — column-pruned, and
zone-map-pruned to the partitions whose key zones intersect the batch's
key range — and (b) the rewrite of NET-affected partitions only. With a
date-correlated key component in stats_cols, a one-month batch keeps
both ∝ one month of data, so a 100x lake (same month count, 100x rows
per month) should cost ~the one affected month's growth, never the
lake's.

Usage: python tools/merge_scale_point.py [sf_dir_1x] [sf_dir_100x]
Defaults: /root/testdata/sf0.1 and .scaled/sf10li (orders 15M rows).
Prints one JSON line per lake.
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

from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.sources.catalog import Catalog  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (  # noqa: E402
    SnapshotLakeTable,
)

BATCH = 1000
TARGET_YM = 199506


def point(spark, sf_dir: str, label: str) -> dict:
    orders = Catalog(spark, sf_dir).orders
    base = orders.select(
        F.datediff(
            F.col("o_orderdate"), F.lit("1990-01-01").cast("date")
        ).alias("oday"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.date_format("o_orderdate", "yyyyMM").cast("int").alias("ym"),
    )
    root = tempfile.mkdtemp(prefix=f"mergebench_{label}_")
    try:
        lake = SnapshotLakeTable(
            spark,
            f"{root}/lake",
            partition_cols=("ym",),
            schema=base.schema,
            retain=2,
            stats_cols=("oday",),
        )
        t0 = time.time()
        lake.write_full(base)
        t_build = time.time() - t0
        n_rows = base.count()
        total_parts = len(lake.current_manifest() or {})

        # constant-size batch from ONE month: price bump on BATCH keys
        batch = (
            base.where(F.col("ym") == TARGET_YM)
            .limit(BATCH)
            .withColumn("price", (F.col("price") + 1).cast("decimal(18,2)"))
        ).persist()
        batch.count()  # materialize outside the timed section

        # zone-prune decision the location scan will make (metadata)
        r = batch.agg(F.min("oday"), F.max("oday")).first()
        cand = len(lake.pruned_partitions({"oday": (r[0], r[1])}))

        t0 = time.time()
        res = lake.merge_rows(batch, key_cols=["oday", "okey"])
        t_merge = time.time() - t0
        batch.unpersist()
        return {
            "label": label,
            "lake_rows": n_rows,
            "partitions": total_parts,
            "build_s": round(t_build, 2),
            "batch_rows": BATCH,
            "candidate_partitions": cand,
            "replaced_partitions": len(res["replaced"]),
            "merge_s": round(t_merge, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    one = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hundred = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scaled",
            "sf10li",
        )
    )
    spark = get_spark("merge_scale", master="local[32]", shuffle_partitions=32)
    try:
        for sf_dir, label in ((one, "1x"), (hundred, "100x")):
            print(json.dumps(point(spark, sf_dir, label)), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
