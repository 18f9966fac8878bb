"""Ordered-funnel analytics: how many users progress view -> click ->
purchase IN THAT ORDER — the sequence-sensitive product-analytics
operator (a plain per-type count ignores ordering and overcounts).

Semantics: stage k counts a user iff an event of stage k's type exists
strictly after the user's earliest qualifying stage k-1 event.  All
comparisons are integer epoch-micros.

Scale shape: one shuffle on user_id, then THREE stacked window
operators over the same partitioning (Catalyst plans them in a single
exchange) — the chained conditional mins cannot fold into one
aggregate because stage k's predicate references stage k-1's result,
and a window over a window expression is exactly how engines express
it without a self-join per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def user_chains(ev: DataFrame) -> DataFrame:
    """(user_id, t0, t1, t2) — each user's earliest qualifying ordered
    stage chain over an events frame with (user_id, event_type, ts_us).
    Shared by the batch query below and the streaming twin's
    equivalence test (streaming/funnel.py)."""
    w = Window.partitionBy("user_id")
    s0, s1, s2 = FUNNEL_STAGES
    d = ev.withColumn(
        "t0",
        F.min(F.when(F.col("event_type") == s0, F.col("ts_us"))).over(w),
    )
    d = d.withColumn(
        "t1",
        F.min(
            F.when(
                (F.col("event_type") == s1) & (F.col("ts_us") > F.col("t0")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == s2) & (F.col("ts_us") > F.col("t1")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    return d.groupBy("user_id").agg(
        F.first("t0").alias("t0"),
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
    )


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, depth, n_users) — users reaching each ordered stage."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    users = user_chains(ev)
    counts = users.agg(
        F.sum(F.col("t0").isNotNull().cast("long")).alias("n0"),
        F.sum(F.col("t1").isNotNull().cast("long")).alias("n1"),
        F.sum(F.col("t2").isNotNull().cast("long")).alias("n2"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(s).alias("stage"),
                F.lit(i + 1).alias("depth"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(FUNNEL_STAGES)
        ]
    )
    return counts.select(F.explode(stages).alias("r")).select("r.*")


def _funnel_sql() -> str:
    s0, s1, s2 = FUNNEL_STAGES
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
d0 AS (
  SELECT *, MIN(CASE WHEN event_type = '{s0}' THEN ts_us END)
    OVER (PARTITION BY user_id) AS t0
  FROM e
),
d1 AS (
  SELECT *, MIN(CASE WHEN event_type = '{s1}' AND ts_us > t0
                     THEN ts_us END)
    OVER (PARTITION BY user_id) AS t1
  FROM d0
),
d2 AS (
  SELECT *, MIN(CASE WHEN event_type = '{s2}' AND ts_us > t1
                     THEN ts_us END)
    OVER (PARTITION BY user_id) AS t2
  FROM d1
),
users AS (
  SELECT user_id, ANY_VALUE(t0) AS t0, ANY_VALUE(t1) AS t1,
         ANY_VALUE(t2) AS t2
  FROM d2 GROUP BY user_id
),
c AS (
  SELECT
    CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM users
)
SELECT '{s0}' AS stage, 1 AS depth, n0 AS n_users FROM c
UNION ALL SELECT '{s1}', 2, n1 FROM c
UNION ALL SELECT '{s2}', 3, n2 FROM c
"""


WEEK_US = 7 * 86_400_000_000


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort_week, week_offset, n_users) — weekly cohort retention:
    users bucketed by their first-activity week, counted in every later
    week they return.  Two aggregates: first-week per user (one shuffle
    on user_id), then distinct-user counts per (cohort, offset) over
    the deduplicated (user, week) activity — the standard retention
    matrix, no self-join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) DIV {WEEK_US}").alias("wk")
    )
    active = ev.distinct()  # (user, week) activity grid
    first = active.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (
        active.join(first, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_RETENTION_SQL = f"""
WITH active AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS wk FROM events
),
first AS (
  SELECT user_id, MIN(wk) AS cw FROM active GROUP BY user_id
)
SELECT cw AS cohort_week, wk - cw AS week_offset, COUNT(*) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cw, wk - cw
"""


QUERIES = {
    "funnel_ordered": funnel_counts,
    "funnel_retention_cohorts": retention_cohorts,
}
ORACLE = {
    "funnel_ordered": _funnel_sql(),
    "funnel_retention_cohorts": _RETENTION_SQL,
}
