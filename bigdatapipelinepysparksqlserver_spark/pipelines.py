"""End-to-end pipeline compositions mirroring the reference's two
Airflow tasks (`dags/sales_pipeline_dag.py:10-13`): sequential driver
code replaces the DAG; single-flight is enforced by the ledger state
machine (C5 — a RUNNING row blocks a second concurrent start).

Pipeline 1 (`sales_pipeline_1.py` → `load_sales_history.py`):
  ledger start → changed partitions → extract+denormalize → partition
  rebuild → ledger finish → reconcile → ledger validation verdict.
Pipeline 2 (`sales_pipeline_2.py` → `load_sales_mart.py`):
  two mart aggregations over the lake → staging write → atomic swap
  publish (M4+M5 as a directory-rename transaction).

Clock injection throughout (SURVEY §7.5 risk 3).
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .functions.expressions import decode_map
from .operators.relational import grouped_count_distinct
from .plans.incremental import IncrementalLoader
from .plans.ledger import FAILED, RUNNING, SUCCESSFUL, RunLedger, default_cutoff
from .plans.reconcile import reconcile
from .sources.lake import LakeTable
from .workload import SourceTables


class SingleFlightError(RuntimeError):
    """A RUNNING run already holds the ledger (C5 — reference relies on
    Airflow max_active_runs=1, README.md:70; we enforce it in-engine)."""


def run_pipeline_1(
    spark: SparkSession,
    src: SourceTables,
    lake: LakeTable,
    ledger: RunLedger,
    now: datetime,
    lag_minutes: int = 5,
    stale_running_minutes: int = 60,
) -> dict:
    """One incremental load + validation cycle. Returns a run report.

    Single-flight vs crash recovery: a RUNNING ledger row either belongs
    to a live concurrent run (block it — C5) or to a run that died before
    writing FAILED (a hard kill never reaches the except-branch). The two
    are indistinguishable from the row alone, so the tiebreak is a
    heartbeat timeout on ``exec_start``: younger than
    ``stale_running_minutes`` → raise SingleFlightError; older → treat as
    crashed and let ``purge_failed`` erase it (its id is ≥ next_run_id by
    construction, since it never became fully successful). Without the
    timeout, one hard crash would brick the pipeline forever behind its
    own RUNNING row.
    """
    # single-flight check (C5) with stale-crash takeover (C4)
    fresh = [
        r.id
        for r in ledger.read().collect()
        if r.pipeline_status == RUNNING
        and r.exec_start is not None
        and (now - r.exec_start) < timedelta(minutes=stale_running_minutes)
    ]
    if fresh:
        raise SingleFlightError(f"run {fresh} still RUNNING")

    run_id = ledger.next_run_id()
    ledger.purge_failed(run_id)  # idempotent restart (C4) — also erases stale RUNNING rows
    prev = ledger.previous_cutoff(run_id)
    cur = default_cutoff(now, lag_minutes)
    ledger.start_run(run_id, now, prev, cur)

    try:
        loader = IncrementalLoader(
            src.read("sales"), src.read("clients"), src.read("products"),
            src.read("removed"), lake,
        )
        parts = loader.run(prev, cur)
        ledger.finish_run(run_id, now, SUCCESSFUL)
    except Exception:
        ledger.finish_run(run_id, now, FAILED)
        raise

    ledger.start_validation(run_id, now)
    res = reconcile(src.read("sales"), lake.read(), parts, cur)
    ledger.finish_validation(run_id, now, res.status)
    return {
        "run_id": run_id,
        "previous_cutoff": prev,
        "current_cutoff": cur,
        "rebuilt_partitions": parts,
        "validation": res,
    }


# ---------------------------------------------------------------------------
# pipeline 2: mart aggregation + atomic publish
# ---------------------------------------------------------------------------


def mart_client_count_df(lake_df: DataFrame, refresh: datetime) -> DataFrame:
    """Mart query 1 (load_sales_mart.py:26-35): COUNT(DISTINCT client)
    per country×gender over paid sales, gender decoded, refresh stamped
    (A2+P4+F2+F3)."""
    agg = grouped_count_distinct(
        lake_df.where(F.col("paid") > 0), ["country", "gender"], "client_id",
        "client_count",
    )
    return agg.select(
        "country",
        decode_map("gender", {"M": "Male", "F": "Female"}, "Other").alias("gender"),
        "client_count",
        F.lit(refresh).alias("refresh_date"),
    )


def mart_sales_agg_df(lake_df: DataFrame, refresh: datetime) -> DataFrame:
    """Mart query 2 (load_sales_mart.py:60-70): COUNT+SUM per
    country×product×size×color over paid sales (A3+P4+F3)."""
    return (
        lake_df.where(F.col("paid") > 0)
        .groupBy("country", "product", "size", "color")
        .agg(
            F.count("id").alias("sales_count"),
            F.sum("paid").alias("paid_amount"),
        )
        .withColumn("refresh_date", F.lit(refresh))
    )


class MartPublisher:
    """Staging → final atomic swap (M4+M5, load_sales_mart.py:51-53,
    :92-102): write the fresh snapshot to ``<table>_staging``, then swap
    it into place with directory renames — readers of ``final_path``
    never observe a half-written snapshot (the lake-native analog of the
    reference's BEGIN TRAN; TRUNCATE; INSERT; COMMIT)."""

    def __init__(self, root: str):
        self.root = root

    def staging_path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}_staging")

    def final_path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write_staging(self, table: str, df: DataFrame) -> None:
        """M4 — truncate-and-load staging (overwrite = truncate+append)."""
        df.write.mode("overwrite").parquet(self.staging_path(table))

    def publish(self, table: str) -> None:
        """M5 — snapshot swap via two renames.

        Honest semantics: POSIX has no multi-directory atomic swap, so
        there is a sub-millisecond window between rename(final→old) and
        rename(staging→final) where ``final`` does not exist — a reader
        in that instant sees path-not-found (never a HALF-WRITTEN
        snapshot; each rename is itself atomic). A crash inside the
        window is self-healing: the next publish (or ``recover``) puts
        the ``.old`` snapshot back before swapping.
        """
        staging, final = self.staging_path(table), self.final_path(table)
        if not os.path.isdir(staging):
            raise FileNotFoundError(f"no staging snapshot for {table}")
        self.recover(table)
        old = final + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def recover(self, table: str) -> None:
        """Crash recovery: a publish killed between its two renames leaves
        ``<table>.old`` but no ``<table>`` — restore the previous snapshot
        so readers see data again. No-op otherwise."""
        final = self.final_path(table)
        old = final + ".old"
        if not os.path.isdir(final) and os.path.isdir(old):
            os.rename(old, final)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self.final_path(table))


def run_pipeline_2(
    spark: SparkSession, lake: LakeTable, mart: MartPublisher, now: datetime
) -> dict:
    """Aggregate the lake into both mart tables and publish atomically.

    Full-scan form (the reference's semantics, O(lake) per run) — the
    bootstrap / repair / validation twin of
    :func:`run_pipeline_2_incremental`.
    """
    lake_df = lake.read()
    mart.write_staging("sales_history_1", mart_client_count_df(lake_df, now))
    mart.write_staging("sales_history_2", mart_sales_agg_df(lake_df, now))
    mart.publish("sales_history_1")
    mart.publish("sales_history_2")
    return {"published": ["sales_history_1", "sales_history_2"], "refresh": now}


def run_pipeline_2_incremental(
    spark: SparkSession,
    partials: "IncrementalMart",
    mart: MartPublisher,
    changed_partitions: list,
    now: datetime,
) -> dict:
    """Incremental mart publish: refresh only the partial-table
    partitions pipeline 1 just rebuilt, re-aggregate the (compact)
    partials, publish atomically. Per-run cost ∝ change set — the form
    that survives a 15-minute cadence at 100 TB, where
    :func:`run_pipeline_2`'s full lake scan cannot.
    """
    partials.refresh(changed_partitions)
    mart.write_staging("sales_history_1", partials.client_count(now))
    mart.write_staging("sales_history_2", partials.sales_agg(now))
    mart.publish("sales_history_1")
    mart.publish("sales_history_2")
    return {"published": ["sales_history_1", "sales_history_2"], "refresh": now}
