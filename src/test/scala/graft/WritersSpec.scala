package graft

import graft.core.Catalog
import graft.sources.{CsvIo, Writers}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sink coverage (S4-S9, S11) + the 100 TB approximate-aggregation
  * variant (SURVEY §7 hard part 6).
  */
class WritersSpec extends AnyFunSuite with SharedSpark {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_w").toString

  test("json sink round-trips [S7]") {
    val dir = tmp()
    val df = Catalog(spark, sf).region
    Writers.json(df, s"$dir/r")
    assert(spark.read.json(s"$dir/r").count() == df.count())
  }

  test("text sink writes formatted lines [S9]") {
    val dir = tmp()
    val df = Catalog(spark, sf).region
      .select(concat_ws("\t", col("r_regionkey"), col("r_name")).as("value"))
    Writers.textLines(df, s"$dir/t")
    val back = spark.read.text(s"$dir/t")
    assert(back.count() == 5)
    assert(back.head().getString(0).contains("\t"))
  }

  test("single-file CSV with stable rename [S6+S11]") {
    val dir = tmp()
    val path = Writers.singleCsvFile(Catalog(spark, sf).nation, dir, "nations.csv")
    assert(path.endsWith("/nations.csv"))
    val back = CsvIo.readInferred(spark, path)
    assert(back.count() == 25)
  }

  test("approx_count_distinct tracks exact within 5% (the scale variant of A2)") {
    val o = Catalog(spark, sf).orders
    val r = o.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
