"""Row-level (CDF-fed) incremental mart (VERDICT r10 #5): signed
folds over the writer-recorded change feed must equal a full recompute
after ANY insert/update/delete history — bit-equal money via integer
cents — with the recorded-CDF path preferred, the recomputed-diff
fallback equivalent, and torn states refused, repaired, and re-usable.
"""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from bigdatapipelinepysparksqlserver_spark.plans.mart_rowlevel import RowLevelMart
from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (
    CdfGapError,
    SnapshotLakeTable,
)

SCHEMA = (
    "id long, paid decimal(18,2), client_id long, gender string,"
    " product string, size string, color string,"
    " year_month int, country string"
)
COLS = [c.split()[0] for c in SCHEMA.split(",")]


class _Corpus:
    """Driver-side model of the lake content: applies insert/update/
    delete ops, publishes the changed partitions WITH the row-level
    change feed, and can render the expected marts."""

    def __init__(self, spark, lake):
        self.spark = spark
        self.lake = lake
        self.rows: dict[int, tuple] = {}

    def _df(self, rows):
        return self.spark.createDataFrame(list(rows), SCHEMA)

    def seed(self, rows):
        for r in rows:
            self.rows[r[0]] = tuple(r)
        self.lake.write_full(self._df(self.rows.values()))

    def apply(self, inserts=(), updates=(), deletes=(), record_cdf=True):
        changes = []
        changed_ym = set()
        for r in inserts:
            r = tuple(r)
            assert r[0] not in self.rows
            self.rows[r[0]] = r
            changes.append(r + ("insert",))
            changed_ym.add(r[7])
        for r in updates:
            r = tuple(r)
            old = self.rows[r[0]]
            changes.append(old + ("delete",))
            changes.append(r + ("insert",))
            self.rows[r[0]] = r
            changed_ym.add(old[7])
            changed_ym.add(r[7])
        for rid in deletes:
            old = self.rows.pop(rid)
            changes.append(old + ("delete",))
            changed_ym.add(old[7])
        content = [r for r in self.rows.values() if r[7] in changed_ym]
        cdf = (
            self.spark.createDataFrame(changes, SCHEMA + ", change string")
            if record_cdf
            else None
        )
        self.lake.apply_rebuild(
            self._df(content) if content else self._df([]).limit(0),
            changed_year_months=sorted(changed_ym),
            changes=cdf,
        )

    def expected_sales(self):
        live = self._df(self.rows.values()).where(F.col("paid") > 0)
        return {
            (r.country, r.product, r.size, r.color): (r.n, r.cents)
            for r in live.groupBy("country", "product", "size", "color")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("paid") * 100).cast("long")).alias("cents"),
            )
            .collect()
        }

    def expected_clients(self):
        live = self._df(self.rows.values()).where(F.col("paid") > 0)
        return {
            (r.country, r.gender): r.n
            for r in live.select("country", "gender", "client_id")
            .distinct()
            .groupBy("country", "gender")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }


def _mart_maps(mart):
    refresh = datetime(2024, 7, 1)
    sales = {
        (r.country, r.product, r.size, r.color): (
            r.sales_count,
            int(r.paid_amount * 100),
        )
        for r in mart.sales_agg(refresh).collect()
    }
    # client_count decodes gender; undo for comparison
    dec = {"Male": "M", "Female": "F"}
    clients = {
        (r.country, dec.get(r.gender, r.gender)): r.client_count
        for r in mart.client_count(refresh).collect()
    }
    return sales, clients


def _row(i, paid, client, ym, country, product="p1", size="M", color="red",
         gender="M"):
    return (i, Decimal(paid), client, gender, product, size, color, ym, country)


@pytest.fixture()
def setup(spark, tmp_path):
    lake = SnapshotLakeTable(
        spark, str(tmp_path / "lake"), schema=SCHEMA, retain=8
    )
    corpus = _Corpus(spark, lake)
    corpus.seed(
        [
            _row(1, "10.00", 100, 202405, "US"),
            _row(2, "20.50", 100, 202405, "US", product="p2"),
            _row(3, "99.99", 101, 202406, "DE"),
            _row(4, "5.25", 102, 202406, "DE", gender="F"),
            _row(5, "-1.00", 103, 202406, "DE"),  # unpaid: invisible to marts
        ]
    )
    mart = RowLevelMart(spark, lake, str(tmp_path / "mart"))
    mart.bootstrap()
    return lake, corpus, mart


def _assert_equiv(corpus, mart):
    sales, clients = _mart_maps(mart)
    assert sales == corpus.expected_sales()
    assert clients == corpus.expected_clients()


@pytest.mark.slow
def test_rowlevel_equals_full_recompute_across_iud_cycles(spark, setup):
    """The signed fold over recorded CDFs matches a full recompute
    after every cycle: inserts, updates (same and CROSS-partition,
    group-key changes, paid sign flips), deletes, multiplicity (a
    client's second row deleted keeps the client), and a partition
    emptied to nothing."""
    lake, corpus, mart = setup
    _assert_equiv(corpus, mart)

    # cycle 1: inserts incl. a second row for client 100 in 202405
    corpus.apply(
        inserts=[
            _row(6, "7.00", 100, 202405, "US", product="p2"),
            _row(7, "3.00", 104, 202407, "FR"),
        ]
    )
    assert mart.refresh_to() == [202405, 202407]
    _assert_equiv(corpus, mart)

    # cycle 2: updates — price change, group-key change, cross-
    # partition move, paid flip to unpaid
    corpus.apply(
        updates=[
            _row(1, "11.00", 100, 202405, "US"),             # price
            _row(2, "20.50", 100, 202405, "US", product="p3"),  # group key
            _row(3, "99.99", 101, 202407, "FR"),              # partition move
            _row(4, "-5.25", 102, 202406, "DE", gender="F"),  # now unpaid
        ]
    )
    mart.refresh_to()
    _assert_equiv(corpus, mart)

    # cycle 3: deletes — one of client 100's rows (client must remain),
    # and everything left in 202406 (partition empties)
    corpus.apply(deletes=[6, 5])
    mart.refresh_to()
    _assert_equiv(corpus, mart)
    corpus.apply(deletes=[4])
    mart.refresh_to()
    _assert_equiv(corpus, mart)
    # client 100 still counted once in US
    _, clients = _mart_maps(mart)
    assert clients[("US", "M")] >= 1

    # cycle 4: delete the last 202405 row of client 100's remaining
    # rows one at a time — multiplicity must hit zero exactly when the
    # last row goes
    corpus.apply(deletes=[1])
    mart.refresh_to()
    _assert_equiv(corpus, mart)
    corpus.apply(deletes=[2])
    mart.refresh_to()
    _assert_equiv(corpus, mart)


@pytest.mark.slow
def test_rowlevel_falls_back_when_a_publish_recorded_no_cdf(spark, setup):
    """A publish without changes= leaves a CDF gap; refresh_to must
    silently fall back to the recomputed snapshot_diff_rows and still
    match the full recompute."""
    lake, corpus, mart = setup
    corpus.apply(inserts=[_row(8, "40.00", 105, 202408, "GB")],
                 record_cdf=False)
    corpus.apply(updates=[_row(8, "45.00", 105, 202408, "GB")])
    with pytest.raises(CdfGapError):
        lake.changes_between(1, lake.current_id())
    mart.refresh_to()
    _assert_equiv(corpus, mart)


def test_rowlevel_refuses_torn_state_and_repairs(spark, setup):
    """A partial published outside a completed refresh (the crash-
    between-publishes shape) must be refused by the marker check;
    repair() rebuilds and refreshing works again."""
    lake, corpus, mart = setup
    # simulate a torn refresh: the sales partial moved, marker didn't
    mart.sales_partial.overwrite_partitions(
        spark.createDataFrame(
            [("XX", "p9", "S", "blue", 1, 100, 209901)],
            mart.sales_partial.schema,
        )
    )
    corpus.apply(inserts=[_row(9, "1.00", 106, 202409, "US")])
    with pytest.raises(RuntimeError, match="TORN"):
        mart.refresh_to()
    mart.repair()
    _assert_equiv(corpus, mart)
    corpus.apply(deletes=[9])
    mart.refresh_to()
    _assert_equiv(corpus, mart)


def test_changes_between_walks_parent_chain(spark, tmp_path):
    """changes_between: exact union along the parent chain, empty on
    self-range, CdfGapError past the first publish, and correctness
    across a skipped id (a crashed claim between two publishes)."""
    # grace_seconds > 0: a young foreign claim is an in-flight
    # publisher, so our next publish SKIPS past its id (grace 0 would
    # reap-and-reuse it and no skip could be observed)
    lake = SnapshotLakeTable(
        spark, str(tmp_path / "lake"), schema=SCHEMA, retain=8,
        grace_seconds=3600.0,
    )
    corpus = _Corpus(spark, lake)
    corpus.seed([_row(1, "10.00", 100, 202405, "US")])
    m1 = lake.current_id()
    assert lake.changes_between(m1, m1).count() == 0

    corpus.apply(inserts=[_row(2, "20.00", 101, 202405, "US")])
    m2 = lake.current_id()
    # a crashed claim: the next id is skipped
    assert lake.fs.make_dir_exclusive(f"{lake.root}/data/txn={m2 + 1}")
    corpus.apply(updates=[_row(2, "25.00", 101, 202405, "US")])
    m3 = lake.current_id()
    assert m3 > m2 + 1  # the skip actually happened

    got = {
        (r.id, str(r.paid), r.change)
        for r in lake.changes_between(m1, m3).collect()
    }
    assert got == {
        (2, "20.00", "insert"),
        (2, "20.00", "delete"),
        (2, "25.00", "insert"),
    }
    # sub-range: only the last hop
    assert {
        (r.id, str(r.paid), r.change)
        for r in lake.changes_between(m2, m3).collect()
    } == {(2, "20.00", "delete"), (2, "25.00", "insert")}
    # past the first publish there is no parent: explicit gap
    with pytest.raises(CdfGapError, match="no usable parent"):
        lake.changes_between(0, m1)


def test_deletes_only_publish_keeps_its_cdf_while_retained(spark, tmp_path):
    """A deletes-only publish writes NO partitions — its txn dir holds
    only the recorded CDF. GC must keep that dir for as long as the
    manifest is retained (reaping it would silently downgrade
    changes_between to the scan-based fallback)."""
    lake = SnapshotLakeTable(
        spark, str(tmp_path / "lake"), schema=SCHEMA, retain=4
    )
    corpus = _Corpus(spark, lake)
    corpus.seed([_row(1, "10.00", 100, 202405, "US")])
    m1 = lake.current_id()
    corpus.apply(deletes=[1])  # partition empties; txn carries only _cdf
    m2 = lake.current_id()
    assert lake.current_manifest() == {}
    # the CDF is readable — no CdfGapError, exact content
    got = {(r.id, r.change) for r in lake.changes_between(m1, m2).collect()}
    assert got == {(1, "delete")}
    # and one more publish later (GC ran again) it STILL is
    corpus.apply(inserts=[_row(2, "5.00", 101, 202406, "DE")])
    m3 = lake.current_id()
    assert {
        (r.id, r.change) for r in lake.changes_between(m1, m3).collect()
    } == {(1, "delete"), (2, "insert")}
