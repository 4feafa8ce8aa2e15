package graft.queries

import graft.core.Catalog
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the events stream: calendar resampling
  * with forward fill, and slowly-changing-dimension (SCD2) interval
  * construction from a change log. Neither exists as a built-in Spark
  * operator; both compose from a date spine / window functions into
  * plans whose only shuffles are on the series key.
  */
object TimeSeriesQueries {

  /** q49: regularize each user's purchase series onto a daily calendar
    * spine and forward-fill gaps — the standard time-series
    * gap-filling operator (resample + ffill).
    *
    * Shape: (1) aggregate purchases to one row per (user, day) with an
    * exact-decimal daily total; (2) per user, explode
    * `sequence(min_day, max_day)` into the dense daily spine — the
    * spine is generated WHERE the user's rows already live, so it adds
    * no shuffle of its own; (3) left-join observations back onto the
    * spine and carry the last observed value forward with a running
    * `last(ignoreNulls)` frame, plus the staleness age in days. All
    * three shuffles (daily agg, bounds agg, spine join + window) hash
    * on the user key; per-key cost is linear in the date span. At
    * 100 TB the spine never materializes corpus-wide: each task emits
    * only its own users' days.
    */
  def resampleFfill(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(Exact.dsum(col("value")).as("day_value"))

    val spine = daily
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))

    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(w).as("value_ffill"),
        datediff(col("day"),
          last(when(col("day_value").isNotNull, col("day")), ignoreNulls = true)
            .over(w)).as("gap_days"))
  }

  val resampleFfillOracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(CAST(SUM(CAST(CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 99999999999999.9 THEN NULL ELSE value END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS day_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id,
      |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                                     CAST(d1 AS TIMESTAMP),
      |                                     INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)),
      |j AS (
      |  SELECT s.user_id, s.day, d.day_value
      |  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day, day_value,
      |  last_value(day_value IGNORE NULLS) OVER w AS value_ffill,
      |  CAST(datediff('day',
      |    last_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) OVER w,
      |    day) AS INT) AS gap_days
      |FROM j
      |WINDOW w AS (PARTITION BY user_id ORDER BY day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** q50: build SCD2 (slowly-changing-dimension type 2) validity
    * intervals from an event change log — the warehouse pattern for
    * point-in-time dimension state, and the batch complement of the
    * [[graft.transform.AsOfJoin]] lookup.
    *
    * The user's spend tier is re-derived at every purchase; the
    * operator keeps only rows where the tier CHANGED (gaps-and-islands
    * via `lag`), then closes each change's interval with the next
    * change's start (`lead`), yielding half-open `[valid_from,
    * valid_to)` intervals with a version counter and an `is_current`
    * flag (open interval). Both windows share one user-key sort — a
    * single exchange, two linear passes.
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)

    val log = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("value") < 20, "low")
          .when(col("value") < 60, "mid")
          .otherwise("high").as("tier"))

    val changes = log
      .withColumn("prev_tier", lag(col("tier"), 1).over(wOrd))
      .filter(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))

    changes
      .select(col("user_id"), col("tier"), col("ts").as("valid_from"),
        lead(col("ts"), 1).over(wOrd).as("valid_to"),
        row_number().over(wOrd).as("version"))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
  }

  val scd2IntervalsOracle: String =
    """WITH log AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN value < 20 THEN 'low'
      |         WHEN value < 60 THEN 'mid' ELSE 'high' END AS tier
      |  FROM events WHERE event_type = 'purchase'),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT user_id, ts, event_id, tier,
      |      lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier
      |    FROM log)
      |  WHERE prev_tier IS NULL OR prev_tier <> tier)
      |SELECT user_id, tier, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  CAST(row_number() OVER w AS INT) AS version,
      |  CAST(CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
      |FROM changes
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** q53: trailing 7-day spend per user via a RANGE window frame over
    * the SPARSE daily series — the range frame does the gap handling
    * (missing days simply contribute nothing), so unlike q49 no spine
    * is materialized; this is the shape for sliding-window features at
    * 100 TB where densifying first would multiply the row count by the
    * calendar. The frame sums exact decimals (decimal addition is
    * associative, so Spark's sliding-frame evaluation order and
    * DuckDB's agree bit-for-bit), cast once to double on the way out.
    */
  def trailingWindow(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(sum(Exact.dec(col("value"))).as("day_dec"))
      .withColumn("day_idx", datediff(col("day"), lit("2024-01-01").cast("date")))
    val w7 = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
      .rangeBetween(-6, 0)
    daily.select(col("user_id"), col("day"),
      col("day_dec").cast("double").as("day_value"),
      sum(col("day_dec")).over(w7).cast("double").as("trailing_7d"),
      count(lit(1)).over(w7).cast("int").as("n_obs_7d"))
  }

  val trailingWindowOracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         SUM(CAST(CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 99999999999999.9 THEN NULL ELSE value END AS DECIMAL(18,4))) AS day_dec,
      |         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 4)
      |SELECT user_id, day,
      |  CAST(day_dec AS DOUBLE) AS day_value,
      |  CAST(sum(day_dec) OVER w7 AS DOUBLE) AS trailing_7d,
      |  CAST(count(*) OVER w7 AS INT) AS n_obs_7d
      |FROM daily
      |WINDOW w7 AS (PARTITION BY user_id ORDER BY day_idx
      |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** q56: conversion funnel (view -> click -> purchase, order
    * enforced): each user's first view, first click AT OR AFTER that
    * view, first purchase at or after that click. Cascading minima
    * need the previous stage's timestamp, so each stage is one
    * conditional aggregate joined back on the user key — three
    * user-key shuffles, no self-join fan-out, reached_* flags carried
    * as ints for the funnel report.
    */
  def funnel(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.join(v, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.join(c, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_click").isNotNull, 1).otherwise(0).as("reached_click"),
        when(col("t_purchase").isNotNull, 1).otherwise(0).as("reached_purchase"))
  }

  val funnelOracle: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
      |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
      |  CAST(CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END AS INT) AS reached_click,
      |  CAST(CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS INT) AS reached_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  /** q57: INCREMENTAL SCD2 maintenance — apply an arriving batch of
    * changes to a standing dimension without recomputing closed
    * history. This is the daily-merge warehouse operation q50 is the
    * batch form of; at 100 TB the standing dimension's closed
    * intervals are the overwhelming bulk and must pass through
    * untouched (here: only rows for users PRESENT IN THE BATCH are
    * rewritten, everything else is a pass-through union branch).
    *
    * Mechanics: the affected users' open intervals become seed rows
    * (their tier + version anchor the tail), unioned with the batch's
    * change log; the q50 gaps-and-islands pass then recomputes only
    * that tail, with versions continued from the seed's counter. A
    * batch row repeating the open tier is absorbed (no new interval) —
    * exactly the collapse the batch form performs.
    *
    * The CORRECTNESS CLAIM is the gate itself: the oracle is q50's
    * FULL-RECOMPUTE SQL over all events, so the hash match proves
    * incremental == batch, row for row — the same claim d12 makes for
    * incremental dedup.
    */
  def scd2Merge(events: DataFrame, cutoff: String = "2024-01-21 00:00:00"): DataFrame = {
    val cutTs = lit(cutoff).cast("timestamp")
    val base = scd2Intervals(events.filter(col("ts") < cutTs))
    val delta = events
      .filter(col("ts") >= cutTs && col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("value") < 20, "low")
          .when(col("value") < 60, "mid")
          .otherwise("high").as("tier"))

    val affected = delta.select(col("user_id")).distinct()
    val untouched = base.join(affected, Seq("user_id"), "left_anti")
    val closedAffected = base.filter(col("is_current") === 0)
      .join(affected, Seq("user_id"), "left_semi")

    // seed rows: the open interval as a pseudo-change (Long.MinValue
    // event_id keeps it first under any tie; base/delta never tie on ts
    // anyway — the cutoff separates them)
    val seed = base.filter(col("is_current") === 1)
      .join(affected, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("valid_from").as("ts"),
        lit(Long.MinValue).as("event_id"), col("tier"),
        col("version").as("base_version"))

    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val changes = seed
      .unionByName(delta.withColumn("base_version", lit(null).cast("int")))
      .withColumn("prev_tier", lag(col("tier"), 1).over(wOrd))
      .filter(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
    // version offset: the seed's counter (its row re-emerges as the
    // first tail row), or 1 for batch-new users with no seed
    val tail = changes
      .withColumn("voff",
        max(coalesce(col("base_version"), lit(1)))
          .over(Window.partitionBy(col("user_id"))))
      .select(col("user_id"), col("tier"), col("ts").as("valid_from"),
        lead(col("ts"), 1).over(wOrd).as("valid_to"),
        (col("voff") + row_number().over(wOrd) - 1).cast("int").as("version"))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))

    untouched.unionByName(closedAffected).unionByName(tail)
  }

  /** q58: keyless interval-overlap join — user activity sessions
    * ([[graft.analytics.Events.sessionize]]) × the top-50-purchase
    * incident windows (±30 min around each), via
    * [[graft.transform.IntervalJoin.overlapBinned]] on a 1-hour grid.
    * With no equi-key Spark's only native plan is a nested-loop cross
    * product; the grid turns it into a hash join on the cell id with
    * the pair emitted exactly once from its first overlap cell. The
    * overlap duration rides along as exact epoch-microsecond integers.
    */
  private def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Catalog(s, d).events
    val sessions = graft.analytics.Events.sessionize(ev, 30)
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"))
    val windows = ev.filter(col("event_type") === "purchase")
      .orderBy(col("value").desc, col("event_id").asc).limit(50)
      .select(col("event_id").as("window_id"),
        (col("ts") - expr("INTERVAL 30 MINUTES")).as("w_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    graft.transform.IntervalJoin.overlapBinned(
        sessions, "session_start", "session_end",
        windows, "w_start", "w_end", binSeconds = 3600L)
      .select(col("window_id"), col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"),
        (unix_micros(least(col("session_end"), col("w_end"))) -
          unix_micros(greatest(col("session_start"), col("w_start"))))
          .as("overlap_us"))
  }

  /** q63: trailing 7-day distinct users per active day — the rolling
    * COUNT(DISTINCT) that range-frame windows cannot express (distinct
    * is not decomposable over a sliding frame, so `count(distinct)
    * OVER (RANGE 6 PRECEDING)` is unsupported in Spark and quadratic
    * where engines do allow it). Scale-safe exact form: reduce the
    * fact table to distinct (user, day) once, then each active
    * user-day CONTRIBUTES ITSELF to the 7 days it is visible from
    * (explode of a 7-element date sequence — bounded map-side fan-out,
    * not a range self-join), dedupe (user, covered day) so multiple
    * active days inside one window count once, and count per day.
    * Total work is 7×|distinct user-days| regardless of window
    * overlap; the naive day×events range join is |days|× the fact
    * scan. Output keeps days that had ≥1 event (the trailing count on
    * a silent day is the previous day's semantics question, q49's
    * spine+ffill territory).
    */
  private def slidingDistinct(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val covered = userDays
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .distinct()
    val activeDays = userDays.select(col("day")).distinct()
    covered.join(activeDays, Seq("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_users_7d"))
      .orderBy(col("day"))
  }

  private val slidingDistinctOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |cov AS (
      |  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
      |  FROM ud, generate_series(0, 6) t(i)),
      |active AS (SELECT DISTINCT day FROM ud)
      |SELECT cov.day AS day, CAST(count(*) AS BIGINT) AS n_users_7d
      |FROM cov JOIN active ON cov.day = active.day
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def intervalJoinOracle: String =
    s"""WITH sess AS (
       |${graft.analytics.Events.sessionizeOracle(30)}
       |),
       |wins AS (
       |  SELECT event_id AS window_id,
       |         ts - INTERVAL 30 MINUTE AS w_start,
       |         ts + INTERVAL 30 MINUTE AS w_end
       |  FROM events WHERE event_type = 'purchase'
       |  ORDER BY value DESC, event_id ASC LIMIT 50)
       |SELECT window_id, user_id, session_seq, session_start, session_end,
       |  epoch_us(least(session_end, w_end))
       |    - epoch_us(greatest(session_start, w_start)) AS overlap_us
       |FROM sess JOIN wins
       |  ON session_start <= w_end AND w_start <= session_end""".stripMargin

  def registry: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    // daily calendar spine + forward fill (time-series gap filling)
    "q49_resample_ffill" -> (
      ((s: SparkSession, d: String) => resampleFfill(Catalog(s, d).events)),
      Some(resampleFfillOracle)),

    // SCD2 validity intervals from the purchase change log
    "q50_scd2_intervals" -> (
      ((s: SparkSession, d: String) => scd2Intervals(Catalog(s, d).events)),
      Some(scd2IntervalsOracle)),

    // trailing 7-day range-frame features over the sparse daily series
    "q53_trailing_window" -> (
      ((s: SparkSession, d: String) => trailingWindow(Catalog(s, d).events)),
      Some(trailingWindowOracle)),

    // ordered conversion funnel with cascading stage minima
    "q56_funnel" -> (
      ((s: SparkSession, d: String) => funnel(Catalog(s, d).events)),
      Some(funnelOracle)),

    // incremental SCD2 merge; the oracle is q50's FULL RECOMPUTE, so
    // the hash match proves incremental == batch
    "q57_scd2_merge" -> (
      ((s: SparkSession, d: String) => scd2Merge(Catalog(s, d).events)),
      Some(scd2IntervalsOracle)),

    // keyless interval-overlap join on the time grid (no nested loop)
    "q58_interval_join" -> (intervalJoin _, Some(intervalJoinOracle)),

    // exact trailing 7-day distinct users via bounded contribution
    // fan-out (no range self-join, no quadratic distinct-over-frame)
    "q63_sliding_distinct" -> (
      ((s: SparkSession, d: String) => slidingDistinct(Catalog(s, d).events)),
      Some(slidingDistinctOracle))
  )
}
