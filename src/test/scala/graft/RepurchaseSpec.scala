package graft

import graft.analytics.Repurchase
import graft.core.Catalog
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the repurchase window join (SURVEY §7 hard part
  * 1: strict lower bound, inclusive upper bound — reference
  * `src/main/java/com/retail/ml/ChurnPrediction.java:152-153`).
  */
class RepurchaseSpec extends AnyFunSuite with SharedSpark {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def label(days: Seq[Int], window: Int): (Int, Long) = {
    // one (custkey=1, partkey=1) pair purchased on the given days; build
    // synthetic orders/lineitem shaped frames
    val orders = days.zipWithIndex.map { case (d, i) =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(1995, 1, 1).plusDays(d - 1).atStartOfDay()))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = days.indices.map(i => (i.toLong, 1L)).toDF("l_orderkey", "l_partkey")
    val out = Repurchase(orders, lineitem, window).collect()(0)
    (out.getAs[Int]("repurchased"), out.getAs[Long]("n_repurchases"))
  }

  test("same-day later purchase does NOT count (strict >)") {
    assert(label(Seq(10, 10), 30) == ((0, 0L)))
  }

  test("purchase exactly at first_day + W counts (inclusive <=)") {
    assert(label(Seq(10, 40), 30) == ((1, 1L)))
  }

  test("purchase at first_day + W + 1 does not count") {
    assert(label(Seq(10, 41), 30) == ((0, 0L)))
  }

  test("band join produces identical results to the naive range join") {
    val c = Catalog(spark, sf)
    val naive = Repurchase(c.orders, c.lineitem, 30)
    val band = Repurchase.bandJoin(c.orders, c.lineitem, 30)
    assert(naive.exceptAll(band).isEmpty && band.exceptAll(naive).isEmpty)
  }
}
