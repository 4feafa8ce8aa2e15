package graft

import graft.functions.SortedIntersectCount
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SortedIntersectSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("matches size(array_intersect) on sorted distinct long arrays") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L), Seq(5L)),
      (Seq(1L, 10L, 100L), Seq(2L, 20L, 200L))
    ).toDF("a", "b")
    val out = df.select(
      SortedIntersectCount.ofSorted(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    assert(out.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("property: equals set-intersection size for random sets (scalacheck gen, fixed seeds)") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 50L))
    val cases = (0 until 40).flatMap { i =>
      for {
        xs <- gen.apply(Gen.Parameters.default, Seed(i.toLong))
        ys <- gen.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } yield (xs.distinct.sorted, ys.distinct.sorted)
    }
    val df = cases.toDF("a", "b")
      .select(col("a"), col("b"), SortedIntersectCount.ofSorted(col("a"), col("b")).as("n"))
    df.collect().foreach { r =>
      val a = r.getSeq[Long](0).toSet
      val b = r.getSeq[Long](1).toSet
      assert(r.getInt(2) == a.intersect(b).size)
    }
  }
}
