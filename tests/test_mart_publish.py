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
    assert mart.current_version("sales_history_1") == 1

    # second publish replaces the snapshot wholesale (truncate semantics)
    run_pipeline_2(spark, lake, mart, REFRESH)
    assert mart.read(spark, "sales_history_1").count() == 2
    assert mart.current_version("sales_history_1") == 2
    # no staging leftovers after publish
    import os

    assert not os.path.isdir(mart.staging_path("sales_history_1"))


def test_publish_without_staging_raises(spark, tmp_path):
    mart = MartPublisher(str(tmp_path / "mart"))
    with pytest.raises(FileNotFoundError):
        mart.publish("sales_history_1")


def test_publish_retains_previous_snapshot_and_gcs_older(spark, tmp_path):
    """retain=1: the previous version stays for in-flight readers; older
    ones are reaped."""
    import os

    lake = _lake(spark, tmp_path)
    mart = MartPublisher(str(tmp_path / "mart"), retain=1)
    for _ in range(3):
        run_pipeline_2(spark, lake, mart, REFRESH)
    root = mart.table_root("sales_history_1")
    dirs = sorted(d for d in os.listdir(root) if d.startswith("v"))
    assert dirs == ["v2", "v3"]  # live + one retained, v1 reaped
    assert mart.current_version("sales_history_1") == 3


@pytest.mark.parametrize("fs_cls", ["LocalFS", "ObjectStoreSimFS"])
@pytest.mark.slow
def test_reader_never_sees_missing_path_during_publishes(spark, tmp_path, fs_cls):
    """The reference's transactional guarantee (load_sales_mart.py:92-102,
    README.md:76): no downtime for readers. Hammer read() from a thread
    while publishing repeatedly — every read must succeed and return a
    complete snapshot. Parametrized over the FS seam: ObjectStoreSimFS
    makes every directory rename a visibly-incomplete copy+delete (the
    S3A/GCS behavior) while keeping only the pointer put atomic — the
    exact asymmetry sources/fs.py contracts — and the invariant must
    hold there too."""
    import threading

    from bigdatapipelinepysparksqlserver_spark.sources import fs as fsmod

    lake = _lake(spark, tmp_path)
    mart = MartPublisher(str(tmp_path / "mart"), fs=getattr(fsmod, fs_cls)())
    run_pipeline_2(spark, lake, mart, REFRESH)  # v1 live

    stop = threading.Event()
    failures: list = []
    reads = [0]

    def hammer():
        while not stop.is_set():
            try:
                n = mart.read(spark, "sales_history_1").count()
                assert n == 2, f"partial snapshot: {n} rows"
                reads[0] += 1
            except Exception as e:  # noqa: BLE001 — collect for the main thread
                failures.append(e)
                return

    t = threading.Thread(target=hammer)
    t.start()
    try:
        for _ in range(8):
            mart.write_staging(
                "sales_history_1", mart_client_count_df(lake.read(), REFRESH)
            )
            mart.publish("sales_history_1")
    finally:
        stop.set()
        t.join()
    assert not failures, f"reader failed during publish: {failures[0]}"
    assert reads[0] > 0, "hammer thread never completed a read"


def test_publish_crash_between_version_rename_and_pointer_swap(spark, tmp_path, monkeypatch):
    """Kill-point: die after staging→vN rename but before the pointer
    swap. Readers stay on the old version. Since the shared protocol
    (r10) a publish failing by EXCEPTION aborts its claim on the way
    out, and a true process death leaves an orphan the next publish's
    begin() reaps (grace=0) — either way the number is reused and the
    GENUINE previous live version stays retained (the old max(dirs)
    numbering kept the unreadable orphan and reaped the real previous
    version instead)."""
    import os

    lake = _lake(spark, tmp_path)
    mart = MartPublisher(str(tmp_path / "mart"))
    run_pipeline_2(spark, lake, mart, REFRESH)  # v1 live

    real_rename = os.rename

    def crashing_rename(src, dst):
        real_rename(src, dst)
        if "/v2" in dst.replace(os.sep, "/"):
            raise RuntimeError("simulated crash after version rename")

    mart.write_staging("sales_history_1", mart_client_count_df(lake.read(), REFRESH))
    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="simulated crash"):
        mart.publish("sales_history_1")
    monkeypatch.undo()

    # pointer untouched → readers still on v1; the failed publish
    # aborted its claim, so no orphan v2 remains either
    assert mart.current_version("sales_history_1") == 1
    assert mart.read(spark, "sales_history_1").count() == 2
    assert not os.path.isdir(
        os.path.join(mart.table_root("sales_history_1"), "v2")
    )
    mart.recover("sales_history_1")  # no-op by design
    assert mart.current_version("sales_history_1") == 1

    # next cycle reuses v2; v1 — the GENUINE previous live version
    # concurrent readers may still be probing — stays retained
    mart.write_staging("sales_history_1", mart_client_count_df(lake.read(), REFRESH))
    mart.publish("sales_history_1")
    assert mart.current_version("sales_history_1") == 2
    assert mart.read(spark, "sales_history_1").count() == 2
    dirs = sorted(
        d for d in os.listdir(mart.table_root("sales_history_1")) if d.startswith("v")
    )
    assert dirs == ["v1", "v2"]

    # the TRUE process-death shape (orphan dir left behind, no abort):
    # reaped by the next publish's begin(), number reused, previous
    # live version still retained
    os.makedirs(os.path.join(mart.table_root("sales_history_1"), "v3"))
    mart.write_staging("sales_history_1", mart_client_count_df(lake.read(), REFRESH))
    mart.publish("sales_history_1")
    assert mart.current_version("sales_history_1") == 3
    dirs = sorted(
        d for d in os.listdir(mart.table_root("sales_history_1")) if d.startswith("v")
    )
    assert dirs == ["v2", "v3"]


def test_recover_falls_back_when_pointer_names_missing_dir(spark, tmp_path):
    import os
    import shutil

    lake = _lake(spark, tmp_path)
    mart = MartPublisher(str(tmp_path / "mart"))
    run_pipeline_2(spark, lake, mart, REFRESH)
    mart.write_staging("sales_history_1", mart_client_count_df(lake.read(), REFRESH))
    mart.publish("sales_history_1")  # v2 live, v1 retained
    shutil.rmtree(os.path.join(mart.table_root("sales_history_1"), "v2"))
    mart.recover("sales_history_1")
    assert mart.current_version("sales_history_1") == 1
    assert mart.read(spark, "sales_history_1").count() == 2


def test_snapshot_time_travel_reads_retained_version(spark, tmp_path):
    """The versioned layout gives mart time travel for free: after two
    publishes with different content, read_version(v1) returns the OLD
    snapshot while read() serves the new one; unknown versions raise
    with the on-disk inventory."""
    import pyspark.sql.functions as F

    lake = _lake(spark, tmp_path)
    mart = MartPublisher(str(tmp_path / "mart"), retain=1)
    run_pipeline_2(spark, lake, mart, REFRESH)  # v1

    # second publish with visibly different content (one extra paid row)
    from datetime import datetime as dt

    extra = spark.createDataFrame(
        [(9, dt(2024, 2, 2), "40.00", 9, "F", 3, "cap", "S", "green",
          None, 202402, "ES")],
        "id long, sale_date timestamp, paid string, client_id long, gender string, "
        "product_id long, product string, size string, color string, "
        "updated_date timestamp, year_month int, country string",
    ).withColumn("paid", F.col("paid").cast("decimal(18,2)"))
    lake.overwrite_partitions(lake.read().unionByName(extra))
    run_pipeline_2(spark, lake, mart, REFRESH)  # v2

    assert mart.list_versions("sales_history_2") == [1, 2]
    v1 = mart.read_version(spark, "sales_history_2", 1)
    live = mart.read(spark, "sales_history_2")
    assert live.count() == v1.count() + 1   # the new row is only in v2
    with pytest.raises(FileNotFoundError, match=r"v9.*\[1, 2\]"):
        mart.read_version(spark, "sales_history_2", 9)

    # r10: mart rollback through the shared protocol — the pointer
    # swings back; the next publish allocates PAST the rolled-back-from
    # v2 (never renumbers over a once-live snapshot). Retention is the
    # union of the lineage tail (v1, the previous LIVE) and the id
    # window (v2, the survivor): both readable after the publish
    assert mart.rollback("sales_history_2", 1) == 1
    assert mart.read(spark, "sales_history_2").count() == v1.count()
    run_pipeline_2(spark, lake, mart, REFRESH)
    assert mart.current_version("sales_history_2") == 3
    assert mart.list_versions("sales_history_2") == [1, 2, 3]
    assert mart.read_version(spark, "sales_history_2", 1).count() == v1.count()
    with pytest.raises(FileNotFoundError):
        mart.rollback("sales_history_2", 99)
