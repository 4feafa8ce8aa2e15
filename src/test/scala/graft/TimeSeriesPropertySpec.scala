package graft

import graft.queries.TimeSeriesQueries
import graft.transform.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.sql.{Date, Timestamp}

/** Property-based invariants for the time-series family:
  *
  *  1. the as-of join equals a driver per-row lookup — for every left
  *     row, the LAST right row at-or-before its timestamp on the same
  *     key, ties at an identical (key, ts) resolving to the greatest
  *     tie value, same-instant right rows visible — on generated
  *     frames dense with exactly the tie/duplicate structure the
  *     union-window implementation has to get right;
  *  2. resample+ffill equals a driver carry-forward — complete daily
  *     spine per user from first to last active day, day sums
  *     carried forward, gap_days counting the distance to the last
  *     observed day — on event sets with duplicate days and multi-day
  *     gaps.
  *
  * Seeded generators; failures are permanent regression cases.
  */
class TimeSeriesPropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def samples[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("as-of join ≡ driver last-at-or-before lookup with max-tie resolution") {
    // small key/time domains on purpose: same-instant collisions and
    // multi-row ties are the semantics under test
    val gen = for {
      nl <- Gen.choose(1, 30)
      nr <- Gen.choose(0, 30)
      lefts <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 20L)))
      rights <- Gen.listOfN(nr, for {
        k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 20L)
        tie <- Gen.choose(0L, 9L); v <- Gen.choose(0, 99)
      } yield (k, t, tie, v))
    } yield (lefts, rights)
    for (((lefts, rights), i) <- samples(gen, seed = 180001L, n = 6).zipWithIndex) {
      val left = lefts.zipWithIndex.map { case ((k, t), id) => (k, t, id.toLong) }
        .toDF("key", "lts", "lid")
      val right = rights.toDF("key", "rts", "tie", "rv")
      val got = AsOfJoin.leftAsOf(left, right, Seq("key"), "lts", "rts", "tie")
        .select("lid", "key", "lts", "rts", "tie", "rv")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long]),
            Option(r.get(5)).map(_.asInstanceOf[Int]))).toMap
      val want = lefts.zipWithIndex.map { case ((k, t), id) =>
        val cands = rights.filter(r => r._1 == k && r._2 <= t)
        val pick = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2, r._3))) // latest ts, then max tie
        id.toLong -> (k, t, pick.map(_._2), pick.map(_._3), pick.map(_._4))
      }.toMap
      assert(got == want, s"sample $i: " +
        s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
    }
  }

  private val eventLogGen: Gen[List[(Long, Long, Long, String, Double)]] =
    Gen.choose(1, 45).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 1209600L) // 14 days of seconds
      typ <- Gen.oneOf("purchase", "view", "click")
      v <- Gen.choose(0, 99)
    } yield (u, t, 0L, typ, v.toDouble)))
      .map(_.zipWithIndex.map { case ((u, t, _, ty, v), id) => (u, t, id.toLong, ty, v) })

  private val LogBase = Timestamp.valueOf("2024-01-10 00:00:00").getTime / 1000L

  private def logDf(rows: List[(Long, Long, Long, String, Double)]): DataFrame =
    rows.map { case (u, t, id, ty, v) =>
      (id, new Timestamp((LogBase + t) * 1000L), u, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def tierOf(v: Double): String = if (v < 20) "low" else if (v < 60) "mid" else "high"

  test("SCD2 intervals ≡ driver gaps-and-islands over the change log") {
    for ((rows, i) <- samples(eventLogGen, seed = 180201L, n = 6).zipWithIndex) {
      val got = TimeSeriesQueries.scd2Intervals(logDf(rows))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime, Option(r.getTimestamp(3)).map(_.getTime),
          r.getInt(4), r.getInt(5))).toSet
      val want = rows.filter(_._4 == "purchase").groupBy(_._1).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        val changes = sorted.zip(None +: sorted.map(e => Some(tierOf(e._5))))
          .collect { case (e, prev) if !prev.contains(tierOf(e._5)) => e }
        changes.zipWithIndex.map { case (e, idx) =>
          val to = changes.lift(idx + 1).map(n => (LogBase + n._2) * 1000L)
          (u, tierOf(e._5), (LogBase + e._2) * 1000L, to, idx + 1,
            if (to.isEmpty) 1 else 0)
        }
      }.toSet
      assert(got == want, s"sample $i: " +
        s"diff=${(got -- want) ++ (want -- got)}")
    }
  }

  test("funnel ≡ driver sequential first-reach scan") {
    for ((rows, i) <- samples(eventLogGen, seed = 180301L, n = 6).zipWithIndex) {
      val got = TimeSeriesQueries.funnel(logDf(rows))
        .collect().map(r => r.getLong(0) ->
          (r.getTimestamp(1).getTime,
            Option(r.getTimestamp(2)).map(_.getTime),
            Option(r.getTimestamp(3)).map(_.getTime),
            r.getInt(4), r.getInt(5))).toMap
      val byUser = rows.groupBy(_._1)
      val want = byUser.flatMap { case (u, evs) =>
        def minAtOrAfter(typ: String, lo: Long): Option[Long] =
          evs.filter(e => e._4 == typ && e._2 >= lo).map(_._2).minOption
        evs.filter(_._4 == "view").map(_._2).minOption.map { tv =>
          val tc = minAtOrAfter("click", tv)
          val tp = tc.flatMap(c => minAtOrAfter("purchase", c))
          u -> ((LogBase + tv) * 1000L,
            tc.map(t => (LogBase + t) * 1000L), tp.map(t => (LogBase + t) * 1000L),
            if (tc.isDefined) 1 else 0, if (tp.isDefined) 1 else 0)
        }
      }
      assert(got == want, s"sample $i: " +
        s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
    }
  }

  test("incremental SCD2 merge ≡ full recompute, for any cutoff") {
    val gen = for {
      rows <- eventLogGen
      cutoffT <- Gen.choose(0L, 1209600L)
    } yield (rows, cutoffT)
    for (((rows, cutoffT), i) <- samples(gen, seed = 180401L, n = 5).zipWithIndex) {
      val df = logDf(rows)
      val cutoff = new Timestamp((LogBase + cutoffT) * 1000L).toString.stripSuffix(".0")
      def canon(out: DataFrame): Set[(Long, String, Long, Option[Long], Int, Int)] =
        out.collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime, Option(r.getTimestamp(3)).map(_.getTime),
          r.getInt(4), r.getInt(5))).toSet
      val merged = canon(TimeSeriesQueries.scd2Merge(df, cutoff)
        .select("user_id", "tier", "valid_from", "valid_to", "version", "is_current"))
      val full = canon(TimeSeriesQueries.scd2Intervals(df)
        .select("user_id", "tier", "valid_from", "valid_to", "version", "is_current"))
      assert(merged == full, s"sample $i (cutoff $cutoff): " +
        s"diff=${(merged -- full) ++ (full -- merged)}")
    }
  }

  test("resample+ffill ≡ driver carry-forward over the per-user daily spine") {
    val base = Date.valueOf("2024-03-01").toLocalDate
    val gen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      d <- Gen.choose(0, 14)
      sec <- Gen.choose(0L, 86399L)
      typ <- Gen.oneOf("purchase", "view")
      v <- Gen.choose(0, 50)
    } yield (u, d, sec, typ, v.toDouble)))
    for ((rows, i) <- samples(gen, seed = 180101L, n = 6).zipWithIndex) {
      val events = rows.zipWithIndex.map { case ((u, d, sec, typ, v), id) =>
        (id.toLong, Timestamp.valueOf(base.plusDays(d).atStartOfDay.plusSeconds(sec)),
          u, typ, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = TimeSeriesQueries.resampleFfill(events)
        .collect().map(r => (r.getLong(0), r.getDate(1).toString) ->
          (Option(r.get(2)).map(_.asInstanceOf[Double]),
            Option(r.get(3)).map(_.asInstanceOf[Double]),
            Option(r.get(4)).map(_.asInstanceOf[Int]))).toMap
      // driver: integer-valued doubles sum exactly; spine per user from
      // first to last purchase day; ffill carries the last observed sum
      val daily = rows.filter(_._4 == "purchase")
        .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._5).sum).toMap
      val want = daily.keys.groupBy(_._1).flatMap { case (u, ks) =>
        val days = ks.map(_._2)
        (days.min to days.max).map { d =>
          val obs = daily.get((u, d))
          val lastObs = (days.min to d).reverse.find(dd => daily.contains((u, dd)))
          (u, base.plusDays(d).toString) ->
            (obs, lastObs.map(dd => daily((u, dd))), lastObs.map(dd => d - dd))
        }
      }.toMap
      assert(got == want, s"sample $i: " +
        s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
    }
  }
}
