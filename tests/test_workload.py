"""Seeded workload generator determinism (F8/F9/M7)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from bigdatapipelinepysparksqlserver_spark.workload import (
    EU_COUNTRIES,
    SourceTables,
    WorkloadGenerator,
)

T = datetime(2024, 6, 1, 12, 0)


def _build(spark, root, seed=42):
    src = SourceTables(spark, str(root))
    gen = WorkloadGenerator(src, seed=seed)
    gen.seed_dimensions(n_clients=30, n_products=10)
    gen.insert_sales(120, batch=1, now=T, spread_days=20)
    gen.update_sales(batch=1, now=T, p=0.05)
    gen.delete_sales(batch=1, now=T, p=0.05)
    return src


def test_same_seed_same_data(spark, tmp_path):
    a = _build(spark, tmp_path / "a")
    b = _build(spark, tmp_path / "b")
    for t in ("sales", "clients", "products", "removed"):
        ra = sorted(map(str, a.read(t).collect()))
        rb = sorted(map(str, b.read(t).collect()))
        assert ra == rb, t


def test_different_seed_differs(spark, tmp_path):
    a = _build(spark, tmp_path / "a", seed=1)
    b = _build(spark, tmp_path / "b", seed=2)
    assert sorted(map(str, a.read("sales").collect())) != sorted(
        map(str, b.read("sales").collect())
    )


def test_distributions_and_integrity(spark, tmp_path):
    src = _build(spark, tmp_path / "w")
    sales = src.read("sales")
    clients = src.read("clients")

    # referential integrity: every sale's client/product exists
    dangling = sales.join(
        clients.select(F.col("id").alias("client_id")), "client_id", "left_anti"
    ).count()
    assert dangling == 0

    # countries drawn from the EU list
    assert {r.country for r in clients.collect()} <= set(EU_COUNTRIES)

    # updates stamped and discounted
    upd = sales.where(F.col("updated_date").isNotNull())
    assert upd.count() > 0

    # tombstones refer to deleted (absent) sales
    removed_ids = {r.id for r in src.read("removed").collect()}
    assert removed_ids
    live_ids = {r.id for r in sales.collect()}
    assert not (removed_ids & live_ids)
