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

  test("CsvIo.writeSingleFile emits exactly one part-file that round-trips [S6]") {
    val dir = tmp() + "/single_csv"
    CsvIo.writeSingleFile(Catalog(spark, sf).nation, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(parts.length == 1,
      s"coalesce(1) report sink must write ONE part-file, got ${parts.length}")
    assert(CsvIo.readInferred(spark, dir).count() == 25)
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

  test("range-sorted layout: output files cover disjoint o_orderdate slices") {
    val dir = tmp()
    Writers.rangeSortedParquet(Catalog(spark, sf).orders, s"$dir/r", "o_orderdate", 4)
    // per-file min/max must not overlap — this disjointness is exactly
    // what lets parquet row-group stats skip files outside a range
    // predicate at read time
    val files = new java.io.File(s"$dir/r").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath)
    assert(files.length >= 2, s"expected multiple range files, got ${files.length}")
    val ranges = files.map { f =>
      // epoch micros (NTZ timestamps surface as LocalDateTime in rows)
      val r = spark.read.parquet(f)
        .selectExpr("min(unix_micros(to_utc_timestamp(o_orderdate, 'UTC')))",
          "max(unix_micros(to_utc_timestamp(o_orderdate, 'UTC')))").head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, prevMax), (nextMin, _)) =>
      assert(prevMax <= nextMin, s"overlapping file ranges: $prevMax > $nextMin")
    }
  }

  test("mergePartitioned: updates matched, inserts unmatched, other partitions untouched") {
    import spark.implicits._
    val dir = tmp()
    val base = Seq((1L, "a", 10), (2L, "b", 10), (3L, "c", 20), (4L, "d", 20))
      .toDF("id", "v", "pk")
    Writers.partitionedParquet(base, s"$dir/t", "pk")
    // merge into pk=20 only: update id=3, insert id=30
    val updates = Seq((3L, "C", 20), (30L, "x", 20)).toDF("id", "v", "pk")
    Writers.mergePartitioned(updates, s"$dir/t", "pk", Seq("id"), s"$dir/staging")
    val got = spark.read.parquet(s"$dir/t")
      .select("id", "v", "pk").as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "b", 10), (3L, "C", 20), (4L, "d", 20), (30L, "x", 20)),
      got.toString)
    // idempotent: re-merging the same updates changes nothing
    Writers.mergePartitioned(updates, s"$dir/t", "pk", Seq("id"), s"$dir/staging")
    assert(spark.read.parquet(s"$dir/t")
      .select("id", "v", "pk").as[(Long, String, Int)].collect().toSet == got)
  }

  test("training shards: filename order is the seeded global shuffle order") {
    val mix = graft.ext.TextStats.mixtureEpochs(
      Catalog(spark, sf).documents,
      Map("src0" -> 300, "src1" -> 230, "src2" -> 50, "src3" -> 0), 100, "graft-r9")
    val dir = tmp()
    Writers.rangeSortedParquet(mix, s"$dir/shards", "order_key", 8)
    val files = new java.io.File(s"$dir/shards").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).map(_.getPath)
    assert(files.length >= 2, s"expected multiple shards, got ${files.length}")
    // ascending filenames must hold ascending, disjoint order_key slices:
    // a trainer consuming part files in name order replays the exact
    // seeded global shuffle order with no cross-file interleaving
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).selectExpr("min(order_key)", "max(order_key)").head()
      (r.getString(0), r.getString(1))
    }
    ranges.sliding(2).foreach { case Array((_, prevMax), (nextMin, _)) =>
      assert(prevMax <= nextMin, s"shard ranges overlap or misorder: $prevMax > $nextMin")
    }
    // and the cycle is lossless (multiset equality via exceptAll both ways)
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == mix.count())
    assert(back.exceptAll(mix).isEmpty && mix.exceptAll(back).isEmpty)
  }

  test("z-order layout: per-file bounding boxes are compact in BOTH dimensions") {
    import spark.implicits._
    val dir = tmp()
    // a full 64x64 grid: perfectly z-clustered into 16 files each file
    // should cover a 16x16 block (area 256) — 1/16 of the 64x64 domain
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b)).toDF("a", "b")
    Writers.zOrderedParquet(grid, s"$dir/z", "a", "b", 16, bits = 6)
    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath)
    assert(files.length >= 8, s"expected many z files, got ${files.length}")
    val areas = files.map { f =>
      val r = spark.read.parquet(f)
        .selectExpr("min(a)", "max(a)", "min(b)", "max(b)").head()
      (r.getInt(1) - r.getInt(0) + 1).toLong * (r.getInt(3) - r.getInt(2) + 1)
    }
    // a single-column sort on `a` would leave every file's b-range at the
    // full 64 (area >= 64 * 4 = 256 only if a-range collapses to 4 —
    // but with ties it's 64 * file-share). z-order bounds BOTH: mean
    // bounding-box area must be a small fraction of the 4096 domain
    val mean = areas.sum.toDouble / areas.length
    assert(mean <= 4096.0 / 8, s"z files are not compact: mean area $mean, areas ${areas.toSeq}")
    // and the layout is lossless
    assert(spark.read.parquet(s"$dir/z").count() == 64L * 64)
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
