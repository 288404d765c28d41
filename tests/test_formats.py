"""Multi-format ingest: schema-enforced CSV/JSONL/ORC round-trips off
the events table, corrupt-row quarantine, and ORC pushdown."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdatapipelinepysparksqlserver_spark.sources.catalog import Catalog
from bigdatapipelinepysparksqlserver_spark.sources.formats import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    read_orc,
    split_corrupt,
    write_csv,
    write_jsonl,
    write_orc,
)

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)


@pytest.fixture()
def events(spark):
    # project to format-portable columns (timestamps round-trip through
    # text formats with format-string pitfalls; covered separately)
    return (
        Catalog(spark, SF)
        .events.select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


def _canon(df):
    return sorted(tuple(r) for r in df.select("event_id", "user_id", "event_type", "value").collect())


def test_csv_roundtrip(spark, events, tmp_path):
    p = str(tmp_path / "ev_csv")
    write_csv(events, p)
    back, bad = split_corrupt(read_csv(spark, p, EVENT_SCHEMA))
    assert bad.count() == 0
    assert _canon(back) == _canon(events)


def test_jsonl_roundtrip(spark, events, tmp_path):
    p = str(tmp_path / "ev_json")
    write_jsonl(events, p)
    back, bad = split_corrupt(read_jsonl(spark, p, EVENT_SCHEMA))
    assert bad.count() == 0
    assert _canon(back) == _canon(events)


def test_orc_roundtrip_and_pushdown(spark, events, tmp_path):
    p = str(tmp_path / "ev_orc")
    write_orc(events, p)
    back = read_orc(spark, p, EVENT_SCHEMA)
    assert _canon(back) == _canon(events)
    # predicate reaches the ORC scan (columnar pushdown like parquet)
    plan = (
        back.where(F.col("event_id") < 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "event_id" in plan


def test_corrupt_rows_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.5}\n'
        "this is not json at all\n"
        '{"event_id": 2, "user_id": 20, "event_type": "view", "value": 2.5}\n'
    )
    clean, bad = split_corrupt(read_jsonl(spark, str(p), EVENT_SCHEMA))
    assert {r.event_id for r in clean.collect()} == {1, 2}
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert "not json" in quarantined[0][CORRUPT_COL]


def test_csv_header_variants_dropped(spark, tmp_path):
    """Quoted / padded / case-drifted headers are recognized as headers
    (dropped), not leaked into quarantine as corrupt rows."""
    p = tmp_path / "hdrcsv"
    p.mkdir()
    (p / "quoted.csv").write_text(
        '"event_id","user_id","event_type","value"\n1,10,click,1.5\n'
    )
    (p / "padded.csv").write_text(
        "event_id, user_id, event_type, value\n2,20,view,2.5\n"
    )
    (p / "upper.csv").write_text(
        "Event_Id,User_Id,Event_Type,Value\n3,30,click,3.5\n"
    )
    clean, bad = split_corrupt(read_csv(spark, str(p), EVENT_SCHEMA))
    assert bad.count() == 0
    assert {r.event_id for r in clean.collect()} == {1, 2, 3}


def test_csv_malformed_numeric_quarantined(spark, tmp_path):
    p = tmp_path / "badcsv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "event_id,user_id,event_type,value\n"
        "1,10,click,1.5\n"
        "oops,not,numeric,zzz\n"
        "2,20,view,2.5\n"
    )
    clean, bad = split_corrupt(read_csv(spark, str(p), EVENT_SCHEMA))
    assert {r.event_id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1


def test_csv_quoted_field_containing_delimiter_pinned(spark, tmp_path):
    """Pin the header-match's behavior on QUOTED data fields containing
    the delimiter (r4 advice #4): the structural header match splits raw
    lines quote-UNAWARE, so a row like ``3,30,"click,extra",4.5`` splits
    into 5 fragments — which can never equal the 4-element header array,
    so the row is correctly KEPT and then parsed by the quote-AWARE
    from_csv into 4 fields. The quote-unaware split only ever misfires
    toward keeping too much, never dropping a data row — and a kept
    header fragment row would surface in quarantine, not vanish."""
    from pyspark.sql import functions as F

    p = tmp_path / "quotedcsv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        'event_id,user_id,event_type,value\n'
        '1,10,click,1.5\n'
        '3,30,"click,extra",4.5\n'
    )
    clean, bad = split_corrupt(read_csv(spark, str(p), EVENT_SCHEMA))
    rows = {r.event_id: r.event_type for r in clean.collect()}
    assert bad.count() == 0
    # quote-aware parse: the delimiter inside quotes is field CONTENT
    assert rows == {1: "click", 3: "click,extra"}
