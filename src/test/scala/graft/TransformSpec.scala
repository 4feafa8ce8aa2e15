package graft

import graft.transform.{Cleaning, Dedup, Derive}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TransformSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("Derive.pricing: guarded division and flags") {
    val li = Seq(
      (1L, 1, 10.0, 100.0, 0.05, "1996-03-07 00:00:00"),
      (1L, 2, 0.0, 50.0, 0.0, "1995-01-01 00:00:00")
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "s")
      .withColumn("l_shipdate", col("s").cast("timestamp")).drop("s")
    val out = Derive.pricing(li).collect().sortBy(_.getAs[Int]("l_linenumber"))
    val r1 = out(0)
    assert(r1.getAs[Double]("net_price") == 95.0)
    assert(r1.getAs[Double]("unit_price") == 10.0)
    assert(r1.getAs[Int]("is_discounted") == 1)
    assert(r1.getAs[String]("disc_band") == "MID")
    val r2 = out(1)
    assert(r2.getAs[Double]("unit_price") == 0.0)   // qty=0 guarded
    assert(r2.getAs[Int]("day") == 1)               // epoch day is 1-based
    assert(r2.getAs[Int]("week_no") == 1)
    assert(r2.getAs[Int]("day_of_week") == 1)
  }

  test("Cleaning.nonNullCounts: single pass, correct per-column counts") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")), (Some(3), Some("y")))
      .toDF("a", "b")
    val row = Cleaning.nonNullCounts(df).head()
    assert(row.getAs[Long]("a") == 2L)
    assert(row.getAs[Long]("b") == 2L)
    assert(row.getAs[Long]("n_rows") == 3L)
  }

  test("Cleaning.dropAllNullColumns drops only fully-null columns") {
    val df = Seq((Some(1), Option.empty[String]), (Some(2), None)).toDF("keep", "dead")
    assert(Cleaning.dropAllNullColumns(df).columns.toSeq == Seq("keep"))
  }

  test("Dedup.dedupByKeys keeps the first row under explicit ordering") {
    val df = Seq((1, "b", 2), (1, "a", 1), (2, "c", 9)).toDF("k", "v", "ord")
    val out = Dedup.dedupByKeys(df, Seq("k"), Seq("ord")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "a"), (2, "c")))
  }

  test("Dedup.dedupByKeys is idempotent") {
    val df = Seq((1, 1), (1, 2), (2, 1)).toDF("k", "ord")
    val once = Dedup.dedupByKeys(df, Seq("k"), Seq("ord"))
    val twice = Dedup.dedupByKeys(once, Seq("k"), Seq("ord"))
    assert(once.collect().toSet == twice.collect().toSet)
  }
}
