"""Run-ledger state machine (C4/C5/A5/M1-M3, load_sales_history.py:19-48)."""

from __future__ import annotations

from datetime import datetime

from bigdatapipelinepysparksqlserver_spark.plans.ledger import (
    FAILED,
    SUCCESSFUL,
    RunLedger,
    default_cutoff,
)

T0 = datetime(2024, 6, 1, 12, 3, 42, 123456)


def test_default_cutoff_truncates_and_lags():
    assert default_cutoff(T0) == datetime(2024, 6, 1, 11, 58)


def test_empty_ledger_first_run(spark, tmp_path):
    led = RunLedger(spark, str(tmp_path / "ledger"))
    assert led.next_run_id() == 1
    assert led.previous_cutoff(1) is None


def test_state_machine_and_restart(spark, tmp_path):
    led = RunLedger(spark, str(tmp_path / "ledger"))
    cut1 = default_cutoff(T0)

    led.start_run(1, T0, None, cut1)
    led.finish_run(1, T0, SUCCESSFUL)
    led.start_validation(1, T0)
    led.finish_validation(1, T0, SUCCESSFUL)

    # run 2 fails validation -> next id must REUSE 2, not 3
    t1 = datetime(2024, 6, 1, 13, 0)
    cut2 = default_cutoff(t1)
    assert led.next_run_id() == 2
    led.start_run(2, t1, led.previous_cutoff(2), cut2)
    led.finish_run(2, t1, FAILED)
    assert led.next_run_id() == 2

    # restart: purge failed rows, previous_cutoff comes from run 1
    led.purge_failed(2)
    assert [r.id for r in led.read().collect()] == [1]
    assert led.previous_cutoff(2) == cut1


def test_validation_failure_blocks_id_advance(spark, tmp_path):
    led = RunLedger(spark, str(tmp_path / "ledger"))
    led.start_run(1, T0, None, default_cutoff(T0))
    led.finish_run(1, T0, SUCCESSFUL)
    led.start_validation(1, T0)
    led.finish_validation(1, T0, FAILED)
    # pipeline ok but validation failed -> run 1 is not fully successful
    assert led.next_run_id() == 1
