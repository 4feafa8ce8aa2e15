package graft

import graft.queries.TimeSeriesQueries
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the time-series operators on hand-built fixtures (the
  * sf-scale oracle gates cover the real tables; these pin the edge
  * behavior a gate row can't show directly).
  */
class TimeSeriesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("resampleFfill: gap days carry the last observation and its age") {
    // one user, purchases on day 1 and day 4 -> 4-row spine, 2 filled
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 10.0, "{}"),
      (2L, "2024-01-04 09:00:00", 1L, "purchase", 30.0, "{}"),
      (3L, "2024-01-02 09:00:00", 1L, "click", 99.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val got = TimeSeriesQueries.resampleFfill(ev)
      .orderBy("day")
      .collect()
      .map(r => (r.getDate(1).toString, Option(r.get(2)), r.getDouble(3), r.getInt(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", Some(10.0), 10.0, 0),
      ("2024-01-02", None, 10.0, 1),
      ("2024-01-03", None, 10.0, 2),
      ("2024-01-04", Some(30.0), 30.0, 0)))
  }

  test("trailingWindow: the 7-day range frame drops observations older than 6 days") {
    // purchases on day 0, 1, and 8: the day-8 trailing sum must NOT
    // include days 0-1 (range semantics over the sparse series)
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 10.0, "{}"),
      (2L, "2024-01-02 10:00:00", 1L, "purchase", 20.0, "{}"),
      (3L, "2024-01-09 10:00:00", 1L, "purchase", 40.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val got = TimeSeriesQueries.trailingWindow(ev)
      .orderBy("day").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(got.toSeq == Seq((10.0, 10.0, 1), (20.0, 30.0, 2), (40.0, 40.0, 1)))
  }

  test("funnel: stage order is enforced — pre-view clicks never count") {
    // user 1: click BEFORE first view, none after -> reaches view only;
    // user 2: full ordered path
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 0.0, "{}"),
      (2L, "2024-01-02 00:00:00", 1L, "view", 0.0, "{}"),
      (3L, "2024-01-01 00:00:00", 2L, "view", 0.0, "{}"),
      (4L, "2024-01-02 00:00:00", 2L, "click", 0.0, "{}"),
      (5L, "2024-01-03 00:00:00", 2L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val got = TimeSeriesQueries.funnel(ev).collect()
      .map(r => r.getLong(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    assert(got == Map(1L -> ((0, 0)), 2L -> ((1, 1))))
  }

  test("scd2Merge: incremental == full recompute at several cutover points") {
    val ev = graft.core.Catalog(spark, sf).events
    val batch = TimeSeriesQueries.scd2Intervals(ev).collect().toSet
    for (cut <- Seq("2024-01-08 00:00:00", "2024-01-21 00:00:00", "2024-01-28 12:00:00")) {
      val inc = TimeSeriesQueries.scd2Merge(ev, cut).collect().toSet
      assert(inc == batch, s"cutover $cut diverged from the batch recompute")
    }
  }

  test("scd2Intervals: consecutive same-tier rows collapse; intervals chain half-open") {
    // tiers low(5) low(6) mid(30) low(7): collapses to low/mid/low
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 9L, "purchase", 5.0, "{}"),
      (2L, "2024-01-02 00:00:00", 9L, "purchase", 6.0, "{}"),
      (3L, "2024-01-03 00:00:00", 9L, "purchase", 30.0, "{}"),
      (4L, "2024-01-04 00:00:00", 9L, "purchase", 7.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    val got = TimeSeriesQueries.scd2Intervals(ev)
      .orderBy("version")
      .collect()
      .map(r => (r.getString(1), r.getTimestamp(2).toString.take(10),
        Option(r.getTimestamp(3)).map(_.toString.take(10)), r.getInt(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      ("low", "2024-01-01", Some("2024-01-03"), 1, 0),
      ("mid", "2024-01-03", Some("2024-01-04"), 2, 0),
      ("low", "2024-01-04", None, 3, 1)))
    // every interval's valid_to = next interval's valid_from (half-open chain)
  }
}
