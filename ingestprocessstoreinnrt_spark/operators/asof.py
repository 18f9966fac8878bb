"""As-of (temporal) join — an operator Spark's join zoo lacks natively,
composed the scale-correct way: tag both sides, union, and carry the
most recent right-side row forward with one `last(ignorenulls)` window
per key.  No join explosion, no range-join quadratic blowup — ONE
shuffle on the join key, then a per-key sort, which is exactly how a
1000-executor cluster wants a temporal join to run (each purchase scans
no further than its own partition's sorted run).

Semantics (deterministic): for every `purchase` event, attach the most
recent `click` event of the same user with click.ts <= purchase.ts.
Right-side rows are first deduplicated per (user, ts) keeping the
highest event_id, so the match is unique and the DuckDB ASOF JOIN twin
is well-defined.  Timestamps compared as integer epoch-micros (the
cross-engine-exact pattern shared with operators.windows).

The oracle uses DuckDB's native ASOF LEFT JOIN — an independent
implementation of the same semantics, not a transliteration of the
union+window trick, which is what makes the check meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

LEFT_TYPE = "purchase"
RIGHT_TYPE = "click"


def asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """purchases ASOF-LEFT-JOIN clicks on user_id, ts (<=)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )

    # right side: one click per (user, ts) — keep the highest event_id
    wdedup = Window.partitionBy("user_id", "ts_us").orderBy(
        F.col("event_id").desc()
    )
    clicks = (
        ev.filter(F.col("event_type") == RIGHT_TYPE)
        .withColumn("_rn", F.row_number().over(wdedup))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "ts_us",
            F.col("ts_us").alias("r_ts"),
            F.col("value").alias("r_val"),
        )
    )
    purchases = ev.filter(F.col("event_type") == LEFT_TYPE).select(
        "user_id", "ts_us", "event_id", "value"
    )

    # union with a side tag; at equal ts the right row sorts first
    # (tag 0 < 1) so the join is inclusive (click.ts <= purchase.ts)
    tagged = purchases.select(
        "user_id",
        "ts_us",
        F.lit(1).alias("tag"),
        "event_id",
        "value",
        F.lit(None).cast("long").alias("r_ts"),
        F.lit(None).cast("double").alias("r_val"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts_us",
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "r_ts",
            "r_val",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_click_ts_us", F.last("r_ts", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_value", F.last("r_val", ignorenulls=True).over(w)
        )
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("value").alias("purchase_value"),
            "last_click_ts_us",
            "last_click_value",
        )
    )


_ASOF_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
  FROM events
),
clicks AS (
  SELECT user_id, ts_us, value FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id, ts_us ORDER BY event_id DESC) AS rn
    FROM e WHERE event_type = '{RIGHT_TYPE}'
  ) WHERE rn = 1
),
purchases AS (
  SELECT event_id, user_id, ts_us, value FROM e
  WHERE event_type = '{LEFT_TYPE}'
)
SELECT p.event_id, p.user_id,
  p.ts_us AS purchase_ts_us,
  p.value AS purchase_value,
  c.ts_us AS last_click_ts_us,
  c.value AS last_click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
"""

QUERIES = {"asof_click_attribution": asof_enrich}
ORACLE = {"asof_click_attribution": _ASOF_SQL}
