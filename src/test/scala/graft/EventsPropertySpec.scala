package graft

import graft.analytics.Events
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Property-based invariants for gap sessionization — the law lane for
  * the event-analytics core the streaming family builds on (e2's batch
  * form is the oracle the stateful/`session_window` variants are gated
  * against, so its own semantics deserve generated-input coverage):
  *
  *  1. sessionize ≡ a driver-side reference fold on any event set
  *     (arbitrary tie/ordering structure, duplicate timestamps);
  *  2. sessionize ≡ sessionWindows session-for-session (the docstring's
  *     "values identical" claim, fuzzed rather than example-tested);
  *  3. the gap boundary is strict: a gap of exactly `gapMinutes` stays
  *     one session, one second more splits.
  *
  * Values are small integers (exact in double AND in the decimal-exact
  * dsum), so equality is bitwise everywhere. Seeded generators — any
  * failure is a permanent regression case.
  */
class EventsPropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def samples[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** (event_id, ts-seconds, user_id, value) with clustered timestamps so
    * both same-session runs and >gap breaks arise naturally, plus exact
    * duplicate timestamps to exercise tie handling.
    */
  private val eventsGen: Gen[List[(Long, Long, Long, Double)]] =
    Gen.choose(1, 50).flatMap { n =>
      Gen.listOfN(n, for {
        user <- Gen.choose(1L, 5L)
        cluster <- Gen.choose(0L, 3L)
        offset <- Gen.choose(0L, 2400L) // 40 min — straddles the 30-min gap
        value <- Gen.choose(0, 100)
      } yield (cluster * 7200L + offset, user, value.toDouble))
        .map(_.zipWithIndex.map { case ((t, u, v), id) => (id.toLong, t, u, v) })
    }

  private val Epoch = 800000000L // fixed base so timestamps are stable

  private def toDf(rows: List[(Long, Long, Long, Double)]): DataFrame =
    rows.map { case (id, t, u, v) =>
      (id, new Timestamp((Epoch + t) * 1000L), u, v) }
      .toDF("event_id", "ts", "user_id", "value")

  /** Driver-side reference: per user, sort by (ts, event_id), split when
    * the gap to the previous event strictly exceeds gapSec, aggregate.
    */
  private def reference(rows: List[(Long, Long, Long, Double)], gapSec: Long)
  : Set[(Long, Long, Long, Long, Double)] =
    rows.groupBy(_._3).flatMap { case (user, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._1))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2 - cur.last._2 <= gapSec => (cur :+ e) :: rest
          case _ => List(e) :: acc
        }
      }
      sessions.map { s =>
        (user, Epoch + s.head._2, Epoch + s.last._2,
          s.size.toLong, s.map(_._4).sum)
      }
    }.toSet

  private def collectSessions(df: DataFrame): Set[(Long, Long, Long, Long, Double)] =
    df.select("user_id", "session_start", "session_end", "n_events", "session_value")
      .collect().map { r =>
        (r.getLong(0), r.getTimestamp(1).getTime / 1000L,
          r.getTimestamp(2).getTime / 1000L, r.getLong(3), r.getDouble(4))
      }.toSet

  test("sessionize ≡ driver-side gap fold on generated event sets") {
    for ((rows, i) <- samples(eventsGen, seed = 150001L, n = 8).zipWithIndex) {
      val got = collectSessions(Events.sessionize(toDf(rows), gapMinutes = 30))
      val want = reference(rows, gapSec = 1800L)
      assert(got == want,
        s"sample $i (${rows.size} events): missing=${want -- got} spurious=${got -- want}")
    }
  }

  test("sessionize ≡ sessionWindows session-for-session") {
    for ((rows, i) <- samples(eventsGen, seed = 150101L, n = 8).zipWithIndex) {
      val df = toDf(rows)
      val a = collectSessions(Events.sessionize(df, gapMinutes = 30))
      val b = collectSessions(Events.sessionWindows(df, gapMinutes = 30))
      assert(a == b, s"sample $i: the two sessionization forms diverged: ${a -- b} / ${b -- a}")
    }
  }

  test("the gap boundary is strict: exactly gapMinutes stays, one second more splits — in BOTH forms") {
    def sessionsAt(gapDelta: Long, f: (DataFrame, Int) => DataFrame): Long = {
      val rows = List((0L, 0L, 1L, 1.0), (1L, 1800L + gapDelta, 1L, 1.0))
      f(toDf(rows), 30).count()
    }
    for ((name, f) <- Seq[(String, (DataFrame, Int) => DataFrame)](
      "sessionize" -> (Events.sessionize(_, _)),
      "sessionWindows" -> (Events.sessionWindows(_, _)))) {
      assert(sessionsAt(0, f) == 1, s"$name: a gap of exactly gapMinutes must NOT split")
      assert(sessionsAt(1, f) == 2, s"$name: a gap one second past gapMinutes must split")
    }
  }
}
