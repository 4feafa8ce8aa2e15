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

  test("dynamic partition overwrite rewrites only the written slice") {
    import spark.implicits._
    val dir = tmp()
    val base = Seq((1L, "a", 10), (2L, "a", 10), (3L, "b", 20)).toDF("id", "v", "pk")
    Writers.partitionedParquet(base, s"$dir/t", "pk")
    // upsert partition pk=20 only: row 3 replaced by rows 30/31
    val fix = Seq((30L, "x", 20), (31L, "y", 20)).toDF("id", "v", "pk")
    Writers.overwritePartitions(fix, s"$dir/t", "pk")
    val got = spark.read.parquet(s"$dir/t")
      .select("id", "pk").as[(Long, Int)].collect().toSet
    // pk=10 untouched (static overwrite mode would have truncated it),
    // pk=20 fully replaced
    assert(got == Set((1L, 10), (2L, 10), (30L, 20), (31L, 20)), got.toString)
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
