"""Event-time windowing queries (additive over the reference, §2.7).

The reference has no event time at all (its only timers are processing
time). These are the event-time capabilities a Spark-native engine adds:
sliding windows and session windows, batch-checkable against SQL
(sessionization = the classic gaps-and-islands rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atiesh_spark.plans.registry import register
from atiesh_spark.sources.tables import load_table


@register(
    "q36_window_sliding",
    oracle="""
    WITH placed AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS w_start,
               event_type FROM events
    )
    SELECT w_start, event_type, count(*) AS cnt
    FROM placed GROUP BY w_start, event_type
    """,
    doc="Sliding window (10 min width, 5 min slide): every event lands in "
    "two windows; the oracle places each event into both window starts "
    "explicitly.",
)
def q36_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "event_type", "cnt")
    )


@register(
    "q37_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    islands AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM islands GROUP BY user_id, session_id
    """,
    headline=True,
    doc="Session windows (30 min inactivity gap) per user — "
    "F.session_window in Spark; the oracle is the gaps-and-islands "
    "rewrite. One shuffle on user_id.",
)
def q37_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
