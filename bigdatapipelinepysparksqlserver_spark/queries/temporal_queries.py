"""Temporal-join and multidimensional-aggregation query surface.

As-of join and banded range join are the two interval operators Spark has
no built-in for (``operators/temporal.py``); rollup/pivot exercise the
multidimensional GROUP BY surface. All four are oracle-checked — the
as-of/range oracles are written as window/inequality SQL DuckDB executes
exactly, with (ts, event_id) total-order tie-breaks so both engines pick
the same row at timestamp collisions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.expressions import dec
from ..operators.temporal import asof_join, range_join
from ..sources.catalog import Catalog
from .registry import query

# --------------------------------------------------------------------------
# as-of join: last-touch attribution (purchase ← latest prior click/view)
# --------------------------------------------------------------------------

ASOF_ATTRIBUTION_ORACLE = """
WITH src AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('click', 'view')
), p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.event_id, p.user_id, p.ts,
         s.ts AS s_ts, s.event_type AS s_type,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id ORDER BY s.ts DESC, s.event_id DESC
         ) AS rn
  FROM p LEFT JOIN src s
    ON s.user_id = p.user_id
   AND (s.ts < p.ts OR (s.ts = p.ts AND s.event_id < p.event_id))
)
SELECT event_id, user_id, ts,
       s_ts AS last_touch_ts, s_type AS last_touch_type
FROM j WHERE rn = 1
"""


@query("asof_attribution", oracle=ASOF_ATTRIBUTION_ORACLE, headline=True)
def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined as-of to the latest
    preceding click/view of the same user (marketing-attribution shape).

    Scale: the union-window as-of join shuffles ONCE on user_id; the
    oracle's equivalent inequality-join formulation explodes each purchase
    by the user's full click history — that asymmetry is exactly why the
    operator exists. Purchases with no prior touch keep null fields
    (left-outer as-of).
    """
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = asof_join(
        purchases,
        touches,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["ts", "event_type"],
        seq_col="event_id",
        prefix="asof_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("last_touch_ts"),
        F.col("asof_event_type").alias("last_touch_type"),
    )


# --------------------------------------------------------------------------
# banded range join: per-error look-back context window
# --------------------------------------------------------------------------

RANGE_ERROR_CONTEXT_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       COUNT(o.event_id) AS ctx_count,
       CAST(SUM(CAST(o.value AS DECIMAL(18,2))) AS DOUBLE) AS ctx_value_sum
FROM events e
LEFT JOIN events o
  ON o.user_id = e.user_id
 AND o.ts >= e.ts - INTERVAL 10 MINUTE
 AND o.ts <  e.ts
WHERE e.event_type = 'error'
GROUP BY 1, 2, 3
"""


@query("range_error_context", oracle=RANGE_ERROR_CONTEXT_ORACLE)
def range_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: count + value sum of the same user's
    activity in the 10 minutes before it (half-open look-back band).

    Scale: the banded range join turns the ts-inequality join — which
    Catalyst would plan as a per-key nested loop — into an equi-join on
    (user_id, time_bin) with ≤2 candidate bins per error. Errors with an
    empty window are restored by a final left join against the error list
    (count 0, sum null — SQL aggregate semantics).
    """
    ev = Catalog(spark, sf_dir).events
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    context = ev.select("event_id", "user_id", "ts", "value")
    ten_min_us = 10 * 60 * 1_000_000
    pairs = range_join(
        errors,
        context,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_us=-ten_min_us,
        upper_us=0,
    )
    agg = pairs.groupBy("event_id").agg(
        F.count("r_event_id").alias("ctx_count"),
        F.sum(dec("r_value")).alias("ctx_value_sum"),
    )
    return errors.join(agg, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("ctx_count"), F.lit(0)).alias("ctx_count"),
        F.col("ctx_value_sum").cast("double").alias("ctx_value_sum"),
    )


# --------------------------------------------------------------------------
# ROLLUP: event_type × day with subtotal levels
# --------------------------------------------------------------------------

EVENTS_ROLLUP_ORACLE = """
SELECT event_type, day,
       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS lvl,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value
      FROM events) t
GROUP BY ROLLUP (event_type, day)
"""


@query("events_rollup", oracle=EVENTS_ROLLUP_ORACLE)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (event_type, day): detail rows + per-type subtotals + grand
    total in one pass, with an explicit grouping-level column (the CASE the
    two engines' differing GROUPING_ID bit orders is avoided by computing
    the level from individual GROUPING flags identically on both).

    Scale: Spark plans rollup as a single Expand + one hash aggregate —
    3 grouping sets here, so the shuffle carries 3× the (small) group
    domain, not 3× the input; partial aggregation still applies below the
    exchange.
    """
    ev = Catalog(spark, sf_dir).events
    base = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    return (
        base.rollup("event_type", "day")
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("day"))
            .cast("int")
            .alias("lvl"),
            F.count(F.lit(1)).alias("event_count"),
            F.sum(dec("value")).cast("double").alias("value_sum"),
        )
        .select("event_type", "day", "lvl", "event_count", "value_sum")
    )


# --------------------------------------------------------------------------
# PIVOT: daily event-type count matrix
# --------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

EVENTS_PIVOT_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
FROM events
GROUP BY 1
"""


@query("events_pivot", oracle=EVENTS_PIVOT_ORACLE)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type count matrix via an EXPLICIT-values pivot.

    Scale: passing the pivot values up front matters — without them Spark
    runs an extra distinct-collect job over the full input to discover the
    columns before it can even plan. With fixed values the pivot compiles
    to conditional aggregates (same plan as the oracle's CASE columns):
    one scan, one shuffle on day. Missing cells are 0 (count semantics),
    matching COUNT(CASE …) which never returns NULL.
    """
    ev = Catalog(spark, sf_dir).events
    out = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "day", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in EVENT_TYPES]
    )


# --------------------------------------------------------------------------
# funnel: view → click → purchase, strictly ordered per user
# --------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT user_id, ts, event_type, t1,
         MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT user_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2
),
per_user AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
)
SELECT COUNT(t1) AS n_viewed,
       COUNT(t2) AS n_clicked_after_view,
       COUNT(t3) AS n_purchased_after_click
FROM per_user
"""


@query("event_funnel", oracle=FUNNEL_ORACLE)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who viewed, then clicked strictly
    after the first view, then purchased strictly after that click.

    Scale: the sequential-pattern match is three conditional-min window
    passes over ONE user_id partitioning — a single shuffle, three
    chained Window operators, no self-joins and no per-user event-list
    materialization. The final rollup is a user-level aggregate that
    reuses the same partitioning."""
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id")
    ts, typ = F.col("ts"), F.col("event_type")
    staged = (
        ev.select("user_id", "ts", "event_type")
        .withColumn("t1", F.min(F.when(typ == "view", ts)).over(w))
        .withColumn(
            "t2", F.min(F.when((typ == "click") & (ts > F.col("t1")), ts)).over(w)
        )
        .withColumn(
            "t3",
            F.min(F.when((typ == "purchase") & (ts > F.col("t2")), ts)).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


# --------------------------------------------------------------------------
# cohort retention: signup-month cohorts × months-since activity
# --------------------------------------------------------------------------

COHORT_ORACLE = """
WITH user_days AS (
  SELECT DISTINCT user_id,
         DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ad
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(ad) AS cd FROM user_days GROUP BY user_id
)
SELECT c.cd AS cohort_day_index,
       u.ad - c.cd AS days_since,
       COUNT(*) AS n_users
FROM user_days u JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


@query("cohort_retention", oracle=COHORT_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted on each subsequent active day (linearized epoch-day index —
    portable integer arithmetic on both engines; swap the truncation
    expression for weekly/monthly cohorts on longer horizons).

    Scale: no events self-join and no separate distinct pass — ONE
    user_id shuffle builds each user's active-day set (collect_set
    dedups map-side; its size is bounded by the calendar horizon, not
    the event count), the cohort day is array_min of that set, and the
    exploded (cohort, days_since) pairs aggregate into the
    cohort-matrix-sized output."""
    ev = Catalog(spark, sf_dir).events
    ad = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("ad")
    per_user = (
        ev.select("user_id", ad)
        .groupBy("user_id")
        .agg(F.collect_set("ad").alias("days"))
        .select(F.array_min("days").alias("cd"), F.explode("days").alias("ad"))
    )
    return per_user.groupBy(
        F.col("cd").alias("cohort_day_index"),
        (F.col("ad") - F.col("cd")).alias("days_since"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# CUBE: nation × order-year with ALL subtotal combinations
# --------------------------------------------------------------------------

SALES_CUBE_ORACLE = """
SELECT n_name, order_year,
       CAST(GROUPING(n_name) * 2 + GROUPING(order_year) AS INTEGER) AS lvl,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
FROM (SELECT n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
             o.o_totalprice
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey) t
GROUP BY CUBE (n_name, order_year)
"""


@query("sales_cube", oracle=SALES_CUBE_ORACLE)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (nation, order_year): every subtotal combination — detail,
    per-nation, per-year, grand total — in one pass, completing the
    multidimensional-agg family next to ``events_rollup`` (ROLLUP) and
    ``events_pivot`` (PIVOT). The grouping level is computed from
    individual GROUPING flags (engine GROUPING_ID bit orders differ).

    Scale: Spark plans cube as one Expand (4 grouping sets) over rows
    already reduced by the joins' projection — the dims join broadcast
    (nation, customer), and partial aggregation below the exchange
    means the shuffle carries 4× the small group domain, not 4× the
    orders table.
    """
    cat = Catalog(spark, sf_dir)
    t = (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_totalprice",
        )
    )
    return (
        t.cube("n_name", "order_year")
        .agg(
            (F.grouping("n_name") * 2 + F.grouping("order_year"))
            .cast("int")
            .alias("lvl"),
            F.count(F.lit(1)).alias("order_count"),
            F.sum(dec("o_totalprice")).cast("double").alias("price_sum"),
        )
        .select("n_name", "order_year", "lvl", "order_count", "price_sum")
    )


# --------------------------------------------------------------------------
# calendar-spine densification: explicit gap rows for time-series work
# --------------------------------------------------------------------------

ACTIVITY_SPINE_ORACLE = """
WITH d AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS di
  FROM events
),
u AS (
  SELECT user_id, MIN(di) AS mn, MAX(di) AS mx, LIST(DISTINCT di) AS ds
  FROM d GROUP BY user_id
)
SELECT user_id, g.di AS day_index, list_contains(ds, g.di) AS active
FROM u, UNNEST(generate_series(mn, mx)) AS g(di)
"""


@query("user_activity_spine", oracle=ACTIVITY_SPINE_ORACLE)
def user_activity_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine densification: one row per user per calendar day
    between their first and last activity, active days flagged — the
    "date spine" every time-series mart needs before gap-sensitive
    logic (retention curves, streak counting, interpolation), because
    aggregating raw events silently SKIPS silent days.

    Scale: ONE user_id shuffle builds each user's active-day set
    (collect_set dedups map-side; its size is bounded by the calendar
    horizon, not the event count — the cohort_retention contract), and
    the spine is a per-user sequence explode whose output is
    users × horizon rows; no join back to events, no events×days
    cross product. At an unbounded horizon, window the spine per
    (user, month) so no single sequence materializes years.
    """
    ev = Catalog(spark, sf_dir).events
    di = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    u = (
        ev.select("user_id", di.alias("di"))
        .groupBy("user_id")
        .agg(
            F.min("di").alias("mn"),
            F.max("di").alias("mx"),
            F.collect_set("di").alias("ds"),
        )
    )
    return u.select(
        "user_id",
        F.explode(F.sequence("mn", "mx")).alias("day_index"),
        F.col("ds"),
    ).select(
        "user_id",
        "day_index",
        F.array_contains("ds", F.col("day_index")).alias("active"),
    )


# --------------------------------------------------------------------------
# activity streaks: gaps-and-islands over distinct active days
# --------------------------------------------------------------------------

USER_STREAKS_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS di
  FROM events
),
i AS (
  SELECT user_id, di,
         di - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY di) AS isl
  FROM d
),
s AS (
  SELECT user_id, isl, COUNT(*) AS len FROM i GROUP BY user_id, isl
)
SELECT user_id,
       COUNT(*) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM s GROUP BY user_id
"""


@query("user_streaks", oracle=USER_STREAKS_ORACLE)
def user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user (longest streak, streak
    count, total active days) — the engagement metric behind habit
    scoring, computed with the classic day-minus-rank islands trick: a
    run of consecutive distinct days shares ``day − row_number``, so
    streaks fall out of ONE rank window and two subset-keyed
    aggregates, with no self-join and no spine materialization (the
    sibling `user_activity_spine` exists for when the gap ROWS
    themselves are wanted).

    Scale: the (user, day) distinct collapses map-side; the rank window
    and BOTH downstream groupBys share the user_id hash partitioning
    (grouping keys contain user_id), so the whole query is two
    exchanges end to end — asserted in test_plans.
    """
    ev = Catalog(spark, sf_dir).events
    di = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    d = ev.select("user_id", di.alias("di")).distinct()
    w = Window.partitionBy("user_id").orderBy("di")
    i = d.select(
        "user_id", "di", (F.col("di") - F.row_number().over(w)).alias("isl")
    )
    s = i.groupBy("user_id", "isl").agg(F.count(F.lit(1)).alias("len"))
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("active_days"),
    )


# --------------------------------------------------------------------------
# peak concurrency: sweep-line max overlap over sessionized intervals
# --------------------------------------------------------------------------

PEAK_CONCURRENCY_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 30 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
sess AS (
  SELECT epoch_us(MIN(ts)) AS su, epoch_us(MAX(ts)) AS eu
  FROM numbered GROUP BY user_id, session_id
),
spans AS (
  SELECT su, eu,
         UNNEST(generate_series(su // 86400000000, eu // 86400000000)) AS day
  FROM sess
),
b AS (
  SELECT day, GREATEST(su, day * 86400000000) AS ts_us, 1 AS delta FROM spans
  UNION ALL
  SELECT day, LEAST(eu, day * 86400000000 + 86399999999) + 1, -1 FROM spans
),
r AS (
  SELECT day, delta,
         SUM(delta) OVER (PARTITION BY day ORDER BY ts_us, delta
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM b
)
SELECT day,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS active_intervals,
       CAST(MAX(run) AS BIGINT) AS peak_concurrent
FROM r GROUP BY day
"""


@query("session_peak_concurrency", oracle=PEAK_CONCURRENCY_ORACLE)
def session_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user sessions per day — the capacity-planning
    query ("how many sessions were open at the busiest instant?") that
    needs interval-stabbing MAX, not an hourly count. Sessions are the
    same 30-minute-gap intervals as `sessionize`.

    Scale: the oracle's formulation is ONE global running sum per day —
    a partition-less-window shape a 1000-executor cluster serializes.
    :func:`peak_concurrency` decomposes it into a segmented prefix sum
    (per-(day, hour-bucket) windows + a ≤25-row carry cumulation per
    day), so every ordered partition is one bucket's boundaries. The
    session roll-up itself shares the user_id shuffle with the
    sessionize window.
    """
    from ..operators.temporal import peak_concurrency

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            lag_ts.isNull()
            | ((F.unix_micros("ts") - F.unix_micros(lag_ts)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )
    return peak_concurrency(sess, "session_start", "session_end")


# --------------------------------------------------------------------------
# UNPIVOT: wide metric matrix back to long (metric, value) rows
# --------------------------------------------------------------------------

EVENTS_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
         COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
         COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
  FROM events GROUP BY 1
)
SELECT day, metric, CAST(n AS BIGINT) AS n
FROM wide
UNPIVOT (n FOR metric IN (click, error, purchase, signup, view))
"""


@query("events_unpivot", oracle=EVENTS_UNPIVOT_ORACLE)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse reshape of `events_pivot`: the wide
    per-day metric matrix back to long (day, metric, n) rows, the form
    a generic metrics store or alerting rule consumes. Completes the
    reshape family (pivot ⇄ unpivot, rollup, cube).

    Scale: `stack()` lowers to a row-local Expand (5 output rows per
    input row, no shuffle of its own); the only exchange is the
    upstream day aggregate. UNPIVOT semantics note: SQL UNPIVOT drops
    NULL cells — these never arise here (COUNT is 0, not NULL), and
    the pivot side coalesces to 0 under the same contract.
    """
    wide = events_pivot(spark, sf_dir)
    stack_args = ", ".join(f"'{t}', {t}" for t in EVENT_TYPES)
    return wide.select(
        "day",
        F.expr(
            f"stack({len(EVENT_TYPES)}, {stack_args})"
        ).alias("metric", "n"),
    )


# --------------------------------------------------------------------------
# multi-touch attribution: time-decay credit over a look-back band
# --------------------------------------------------------------------------

HALF_LIFE_US = 4 * 3600 * 1_000_000
LOOKBACK_US = 24 * 3600 * 1_000_000

MULTITOUCH_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS p_us FROM events
  WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
  WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT p.event_id, t.event_type,
         CAST(ROUND(POWER(0.5,
           CAST(p.p_us - t.t_us AS DOUBLE) / {float(HALF_LIFE_US)})
           * 1000000000.0, 0) AS BIGINT) AS w9
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND t.t_us >= p.p_us - {LOOKBACK_US} AND t.t_us < p.p_us
),
shared AS (
  SELECT event_id, event_type,
         CAST(ROUND(CAST(w9 AS DOUBLE)
           / CAST(SUM(w9) OVER (PARTITION BY event_id) AS DOUBLE)
           * 1000000.0, 0) AS BIGINT) AS s6
  FROM pairs
),
touch AS (
  SELECT event_type AS touch_type, COUNT(*) AS n_touches,
         ROUND(CAST(SUM(s6) AS DOUBLE) / 1000000.0, 6) AS credit
  FROM shared GROUP BY 1
),
direct AS (
  SELECT 'direct' AS touch_type, COUNT(*) AS n_touches,
         CAST(COUNT(*) AS DOUBLE) AS credit
  FROM p WHERE event_id NOT IN (SELECT event_id FROM pairs)
)
SELECT * FROM touch UNION ALL SELECT * FROM direct
"""


@query("multitouch_attribution", oracle=MULTITOUCH_ORACLE)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase splits one
    unit of credit across the user's clicks/views in the 24 h before
    it, weighted by a 4 h-half-life time decay; purchases with no
    prior touch keep their credit as 'direct'. The fractional-credit
    complement of `asof_attribution`'s last-touch.

    Exactness: each pair's decay weight is ONE double expression
    integer-scaled per row; per-purchase shares renormalize on the
    integer weights and are re-scaled to integers BEFORE the cross-
    purchase credit sum — no unordered double accumulation anywhere
    (module pattern). The oracle is the independent inequality-join
    formulation.

    Scale: the engine path runs the BINNED range join (equi-join on
    (user_id, time-bin), ≤2 candidate bins per purchase) — never the
    oracle's per-user nested loop; the share window partitions by
    purchase (touches-per-24h-bounded); 'direct' is a left-anti join
    on the purchase list.
    """
    ev = Catalog(spark, sf_dir).events
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_type", "ts"
    )
    pairs = range_join(
        purchases,
        touches,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_us=-LOOKBACK_US,
        upper_us=0,
    ).select(
        "event_id",
        F.col("r_event_type").alias("touch_type"),
        F.round(
            F.pow(
                F.lit(0.5),
                (F.unix_micros("ts") - F.unix_micros("r_ts")).cast("double")
                / F.lit(float(HALF_LIFE_US)),
            )
            * F.lit(1_000_000_000.0),
            0,
        )
        .cast("bigint")
        .alias("w9"),
    )
    w_p = Window.partitionBy("event_id")
    shared = pairs.select(
        "event_id",
        "touch_type",
        F.round(
            F.col("w9").cast("double")
            / F.sum("w9").over(w_p).cast("double")
            * F.lit(1_000_000.0),
            0,
        )
        .cast("bigint")
        .alias("s6"),
    )
    touch = shared.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(
            F.sum("s6").cast("double") / F.lit(1_000_000.0), 6
        ).alias("credit"),
    )
    direct = (
        purchases.join(
            pairs.select("event_id").distinct(), "event_id", "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_touches"))
        .select(
            F.lit("direct").alias("touch_type"),
            "n_touches",
            F.col("n_touches").cast("double").alias("credit"),
        )
    )
    return touch.unionByName(direct)


# --------------------------------------------------------------------------
# funnel latency: time-to-convert quantiles per funnel step
# --------------------------------------------------------------------------

FUNNEL_LATENCY_ORACLE = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT user_id, ts, event_type, t1,
         MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT user_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2
),
u AS (
  SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM s3 GROUP BY user_id
),
lat AS (
  SELECT 'view_to_click' AS step,
         (epoch_us(t2) - epoch_us(t1)) // 1000 AS ms
  FROM u WHERE t2 IS NOT NULL
  UNION ALL
  SELECT 'click_to_purchase',
         (epoch_us(t3) - epoch_us(t2)) // 1000
  FROM u WHERE t3 IS NOT NULL
)
SELECT step, COUNT(*) AS n,
       ROUND(quantile_cont(CAST(ms AS DOUBLE), 0.5), 6) AS p50_ms,
       ROUND(quantile_cont(CAST(ms AS DOUBLE), 0.95), 6) AS p95_ms
FROM lat GROUP BY step
"""


@query("funnel_time_to_convert", oracle=FUNNEL_LATENCY_ORACLE)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per funnel step: for users who
    progressed view→click→purchase (same strictly-ordered semantics as
    `event_funnel`), the median and p95 latency of each transition —
    the product metric behind "how long does conversion take".

    Exactness: latencies are integer milliseconds from epoch-micros
    arithmetic (`div 1000`, never double `/`); `percentile` ≡ DuckDB
    `quantile_cont` with 6-dp rounding (the hourly-percentile-band
    contract). Per-step groups hold one row per CONVERTING user.

    Scale: the three conditional-min windows share one user_id
    shuffle (the funnel plan); the latency relation is converter-
    sized; exact per-group percentiles sort within two groups — for
    unbounded converter counts the GK sketch family
    (`sketch_price_quantiles`) is the documented scale path.
    """
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id")
    ts, typ = F.col("ts"), F.col("event_type")
    staged = (
        ev.select("user_id", "ts", "event_type")
        .withColumn("t1", F.min(F.when(typ == "view", ts)).over(w))
        .withColumn(
            "t2",
            F.min(F.when((typ == "click") & (ts > F.col("t1")), ts)).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when((typ == "purchase") & (ts > F.col("t2")), ts)
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    vc = per_user.where(F.col("t2").isNotNull()).select(
        F.lit("view_to_click").alias("step"),
        F.expr("(unix_micros(t2) - unix_micros(t1)) div 1000").alias("ms"),
    )
    cp = per_user.where(F.col("t3").isNotNull()).select(
        F.lit("click_to_purchase").alias("step"),
        F.expr("(unix_micros(t3) - unix_micros(t2)) div 1000").alias("ms"),
    )
    return (
        vc.unionByName(cp)
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(CAST(ms AS DOUBLE), 0.5)"), 6).alias(
                "p50_ms"
            ),
            F.round(F.expr("percentile(CAST(ms AS DOUBLE), 0.95)"), 6).alias(
                "p95_ms"
            ),
        )
    )


# --------------------------------------------------------------------------
# trailing-window distinct: 7-day rolling active users per calendar day
# --------------------------------------------------------------------------

ROLLING_ACTIVE_ORACLE = """
WITH du AS (
  SELECT DISTINCT
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS di,
         user_id
  FROM events
),
b AS (SELECT MIN(di) AS mn, MAX(di) AS mx FROM du),
spine AS (
  SELECT g.di AS win_di FROM b, UNNEST(generate_series(mn, mx)) AS g(di)
),
c AS (
  SELECT s.win_di, COUNT(DISTINCT du.user_id) AS au
  FROM spine s JOIN du ON du.di BETWEEN s.win_di - 6 AND s.win_di
  GROUP BY s.win_di
)
SELECT s.win_di, CAST(COALESCE(c.au, 0) AS BIGINT) AS active_users_7d
FROM spine s LEFT JOIN c ON c.win_di = s.win_di
"""


@query("rolling_active_users", oracle=ROLLING_ACTIVE_ORACLE)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day DISTINCT active users for every calendar day in
    the data range — the rolling-distinct metric a sliding window
    cannot express (COUNT(DISTINCT) has no merge-out over frames), so
    the naive form is a per-day range self-join over 7× the events.

    Algorithm: contribution explode — dedup to (day, user) first (the
    only data-sized shuffle), then each active (day, user) emits the 7
    window-end days it contributes to, and one count-distinct groupBy
    per window day finishes. Work is exactly 7× the DISTINCT
    (day, user) pairs — linear, horizon-independent — and both
    shuffles key on high-cardinality (day, user) pairs, no skew. The
    day spine (one row per calendar day) left-joins at the end so
    silent days report 0, not absence. Day arithmetic runs on epoch-day
    BIGINTs (the ``user_activity_spine`` convention — no DATE-type
    canon differences between engines).

    Scale: at 100 TB the (day, user) dedup dominates — a shuffle the
    metric needs under ANY algorithm; the ×7 explode adds map-side
    rows only. Window length w scales cost ×w: for month-long windows
    switch to per-day HLL sketch merges (``sketch_distinct_clients``)
    — this query is the exact form.
    """
    ev = Catalog(spark, sf_dir).events
    di = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    du = ev.select(di.alias("di"), "user_id").distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("di"), F.col("di") + F.lit(6))
        ).alias("win_di"),
        "user_id",
    )
    counts = contrib.groupBy("win_di").agg(
        F.countDistinct("user_id").alias("au")
    )
    spine = du.agg(
        F.min("di").alias("mn"), F.max("di").alias("mx")
    ).select(F.explode(F.sequence("mn", "mx")).alias("win_di"))
    return spine.join(counts, "win_di", "left").select(
        "win_di", F.coalesce("au", F.lit(0)).alias("active_users_7d")
    )


# --------------------------------------------------------------------------
# resample + gap-fill: hourly series densified by linear interpolation
# --------------------------------------------------------------------------

INTERPOLATE_ORACLE = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT event_type, MIN(h) AS mn, MAX(h) AS mx
  FROM hourly GROUP BY event_type
),
spine AS (
  SELECT b.event_type, g.h FROM b, UNNEST(generate_series(mn, mx)) AS g(h)
),
j AS (
  SELECT s.event_type, s.h, hourly.c
  FROM spine s LEFT JOIN hourly
    ON hourly.event_type = s.event_type AND hourly.h = s.h
),
w AS (
  SELECT event_type, h, c,
         LAST_VALUE(c IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS UNBOUNDED PRECEDING) AS yp,
         LAST_VALUE(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS UNBOUNDED PRECEDING) AS hp,
         FIRST_VALUE(c IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS yn,
         FIRST_VALUE(CASE WHEN c IS NOT NULL THEN h END IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hn
  FROM j
)
SELECT event_type, h,
       CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
            ELSE ROUND(CAST(yp * (hn - h) + yn * (h - hp) AS DOUBLE)
                       / CAST(hn - hp AS DOUBLE), 6)
       END AS filled,
       c IS NOT NULL AS observed
FROM w
"""


@query("hourly_value_interpolate", oracle=INTERPOLATE_ORACLE)
def hourly_value_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: per-type hourly event volume
    densified to every hour between the type's first and last active
    hour, silent hours filled by LINEAR INTERPOLATION between the
    nearest observed neighbors — the resample-then-interpolate
    primitive (pandas ``resample().interpolate()``) feeding anomaly
    detectors and forecasting features, where aggregating raw events
    silently skips the gaps that matter.

    Exactness: observed hours emit the exact count; interpolated hours
    compute (y_prev·(h_next−h) + y_next·(h−h_prev)) / (h_next−h_prev)
    — integer numerator/denominator, ONE double division, ROUND 6 —
    identical on both engines. Spine endpoints are observed hours by
    construction, so prev/next always exist on gap rows.

    Scale: the events scan collapses to (type, hour) counts first
    (map-side combined); the spine explode and the four ignore-nulls
    running picks all run on the HOUR DOMAIN per type — window input
    is horizon-sized, never event-sized; carry-forward/backward needs
    one frame pass each direction.
    """
    ev = Catalog(spark, sf_dir).events
    hourly = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    b = hourly.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    spine = b.select(
        "event_type", F.explode(F.sequence("mn", "mx")).alias("h")
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("c").isNotNull(), F.col("h"))
    w = j.select(
        "event_type",
        "h",
        "c",
        F.last("c", ignorenulls=True).over(w_prev).alias("yp"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("hp"),
        F.first("c", ignorenulls=True).over(w_next).alias("yn"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("hn"),
    )
    interp = F.round(
        (
            F.col("yp") * (F.col("hn") - F.col("h"))
            + F.col("yn") * (F.col("h") - F.col("hp"))
        ).cast("double")
        / (F.col("hn") - F.col("hp")).cast("double"),
        6,
    )
    return w.select(
        "event_type",
        "h",
        F.when(F.col("c").isNotNull(), F.col("c").cast("double"))
        .otherwise(interp)
        .alias("filled"),
        F.col("c").isNotNull().alias("observed"),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival / retention curve — the censoring-aware form of
# cohort retention: a user still active near the observation end is
# CENSORED at their observed lifetime, not counted as churned (naive
# retention curves understate late-period survival by exactly these
# users). Emits the standard KM table: per lifetime-day risk set size,
# churn events, censorings, and the discrete hazard d/n — survival
# S(t) = prod(1 - hazard) derives row-by-row downstream; the product
# itself is NOT emitted because a cross-engine cumulative product would
# route through exp/ln ULPs (the exact-moment discipline: exact
# integers + ONE final division per row).
# --------------------------------------------------------------------------

KM_CENSOR_DAYS = 7

SURVIVAL_KM_ORACLE = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events WHERE user_id IS NOT NULL
),
obs AS (SELECT MAX(d) AS oe FROM ev),
pu AS (SELECT user_id, MIN(d) AS fd, MAX(d) AS ld FROM ev GROUP BY 1),
lab AS (
  SELECT date_diff('day', fd, ld) AS t,
         CASE WHEN date_diff('day', ld, (SELECT oe FROM obs))
                   < {KM_CENSOR_DAYS} THEN 1 ELSE 0 END AS cen
  FROM pu
),
daily AS (
  SELECT t, SUM(1 - cen) AS d, SUM(cen) AS c FROM lab GROUP BY 1
),
risk AS (
  SELECT t, d, c,
         SUM(d + c) OVER (ORDER BY t DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
  FROM daily
)
SELECT CAST(t AS BIGINT) AS day_t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_churned, CAST(c AS BIGINT) AS n_censored,
       ROUND(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE), 6) AS hazard
FROM risk
"""


@query("user_survival_km", oracle=SURVIVAL_KM_ORACLE)
def user_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier estimator over user lifetimes (first event day →
    last event day; users whose last event falls within
    ``KM_CENSOR_DAYS`` of the corpus' final day are right-censored —
    still at risk, not churned).

    The oracle computes the risk set with a suffix-sum window; the
    Spark plan instead uses the CONTRIBUTION-EXPLODE identity
    n_risk(t) = sum over s >= t of (d+c)(s): each lifetime-day row
    explodes into its 0..t prefix days and re-aggregates — day-DOMAIN
    quadratic (bounded by the retention horizon: 3650 days ≈ 6.6 M
    contribution rows at a 10-year horizon, regardless of corpus
    size), which keeps the plan free of the banned global window. The
    observation-end day is a one-row control-plane scalar (the ledger
    cutoff precedent).

    Scale: one user-keyed shuffle (min/max per user, map-side
    combined), then day-domain-sized work only.
    """
    ev = (
        Catalog(spark, sf_dir)
        .events.where(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
    )
    obs_end = ev.agg(F.max("d").alias("oe")).first()["oe"]
    pu = ev.groupBy("user_id").agg(F.min("d").alias("fd"), F.max("d").alias("ld"))
    lab = pu.select(
        F.datediff("ld", "fd").alias("t"),
        (
            F.datediff(F.lit(str(obs_end)).cast("date"), F.col("ld"))
            < F.lit(KM_CENSOR_DAYS)
        )
        .cast("long")
        .alias("cen"),
    )
    daily = lab.groupBy("t").agg(
        (F.count(F.lit(1)) - F.sum("cen")).alias("d"), F.sum("cen").alias("c")
    )
    risk = (
        daily.select(
            F.explode(F.sequence(F.lit(0), F.col("t"))).alias("t2"),
            (F.col("d") + F.col("c")).alias("w"),
        )
        .groupBy("t2")
        .agg(F.sum("w").alias("n_risk"))
    )
    return daily.join(risk, daily["t"] == risk["t2"]).select(
        F.col("t").cast("bigint").alias("day_t"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_churned"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.round(
            F.col("d").cast("double") / F.col("n_risk").cast("double"), 6
        ).alias("hazard"),
    )
