package graft.analytics

import graft.functions.Exact._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events(event_id, ts, user_id,
  * event_type, value, props)` table — batch forms of the streaming
  * extension (SURVEY §2.11: the reference has no streams; these define the
  * semantics the Structured Streaming path in [[graft.streaming]] must
  * match).
  */
object Events {

  /** Tumbling-hour aggregate per event type. In streaming this is exactly
    * `groupBy(window($"ts","1 hour"), $"event_type")` + watermark; batch
    * `date_trunc` keeps the oracle simple and the semantics identical.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  val hourlyOracle: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events,
      |  CAST(CAST(SUM(CAST(CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 99999999999999.9 THEN NULL ELSE value END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS total_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding (hopping) 2-hour windows on a 1-hour slide — the
    * overlapping-window aggregate (each event lands in exactly two
    * windows), via Spark's native `window(ts, size, slide)` which
    * plans the expansion as a narrow Expand, never a join. Works
    * identically in batch and streaming (StreamingSpec drives the
    * streamed form to completion against this); the oracle replays the
    * two window memberships as a UNION ALL.
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  val slidingOracle: String =
    """WITH x AS (
      |  SELECT date_trunc('hour', ts) AS win_start, event_type, value FROM events
      |  UNION ALL
      |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events)
      |SELECT win_start, event_type, count(*) AS n_events,
      |  CAST(CAST(SUM(CAST(CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 99999999999999.9 THEN NULL ELSE value END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS total_value
      |FROM x GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. Classic two-window
    * pattern: lag to mark session starts, running sum to assign session
    * ids — both windows share one shuffle on user_id (same partitioning),
    * and the per-user ordering a 1000-executor cluster produces is
    * identical because the keys are hash-partitioned and sorted within
    * partitions.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapSec = gapMinutes * 60L
    val marked = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"))
  }

  /** Same sessionization via Spark's native `session_window` (the
    * idiomatic form — works identically in batch and streaming, where it
    * becomes stateful merging under a watermark). Output keyed by session
    * start instead of a sequence number; values identical to
    * [[sessionize]] (tested + oracle-checked).
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"))
      .drop("w")

  def sessionWindowsOracle(gapMinutes: Int): String =
    s"""WITH marked AS (
       |  -- session_window is half-open: a new session starts when the gap
       |  -- REACHES gapMinutes (>=, at full timestamp precision)
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('microsecond', lag(ts) OVER w, ts) >= ${gapMinutes * 60L * 1000000L}
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       |assigned AS (
       |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
       |  FROM marked)
       |SELECT user_id,
       |  min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events,
       |  CAST(CAST(SUM(CAST(CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 99999999999999.9 THEN NULL ELSE value END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS session_value
       |FROM assigned GROUP BY user_id, session_seq""".stripMargin

  def sessionizeOracle(gapMinutes: Int): String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR date_diff('second', lag(ts) OVER w, ts) > ${gapMinutes * 60}
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       |assigned AS (
       |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM marked)
       |SELECT user_id, session_seq,
       |  min(ts) AS session_start, max(ts) AS session_end,
       |  count(*) AS n_events,
       |  CAST(CAST(SUM(CAST(CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 99999999999999.9 THEN NULL ELSE value END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS session_value
       |FROM assigned GROUP BY user_id, session_seq""".stripMargin
}
