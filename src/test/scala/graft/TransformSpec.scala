package graft

import graft.transform.{Cleaning, Cumulative, Dedup, Derive, SchemaCompat}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TransformSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("Exact.qavg: grid-quantized average is exact for on-grid values and order-independent") {
    import graft.functions.Exact
    val df = Seq(1.25, 2.5, 3.75, 10.0).map(Tuple1(_)).toDF("x")
    val got = df.agg(Exact.qavg(col("x")).as("a")).collect()(0).getDouble(0)
    assert(got == (12500L + 25000L + 37500L + 100000L) / (10000.0 * 4))
    // repartitioning (different partial-aggregation order) changes nothing
    val re = df.repartition(7).agg(Exact.qavg(col("x"))).collect()(0).getDouble(0)
    assert(re == got)
  }

  test("SchemaCompat: case-insensitive resolve, probe order, intersection") {
    val df = Seq((1L, 10L, "a")).toDF("Basket_ID", "product_id_y", "Age_Desc")
    assert(SchemaCompat.resolve(df, "basket_id").contains("Basket_ID"))
    assert(SchemaCompat.resolve(df, "nope").isEmpty)
    // probe returns the first candidate present, under its actual spelling
    assert(SchemaCompat.probe(df, SchemaCompat.productIdCandidates).contains("product_id_y"))
    val probed = Seq((1L, 2L)).toDF("product_id_x", "product_id_y")
    assert(SchemaCompat.probe(probed, SchemaCompat.productIdCandidates).contains("product_id_x"))
    // intersection keeps request order, actual spellings, drops absentees
    assert(SchemaCompat.intersect(df, Seq("age_desc", "income_desc", "basket_id")) ==
      Seq("Age_Desc", "Basket_ID"))
    // loud failure lists the observed schema
    val e = intercept[IllegalArgumentException](SchemaCompat.probeOrThrow(df, Seq("x", "y")))
    assert(e.getMessage.contains("Basket_ID"))
  }

  test("SchemaCompat.ensureWeekNo: derives only when absent; day defaults to 1") {
    // day present, week_no absent -> ceil(day/7)
    val d1 = SchemaCompat.ensureWeekNo(Seq((1, 13), (2, 14), (3, 15)).toDF("id", "day"))
    assert(d1.select("id", "week_no").as[(Int, Long)].collect().sorted.toSeq ==
      Seq((1, 2L), (2, 2L), (3, 3L)))
    // both absent -> day=1, week_no=1
    val d2 = SchemaCompat.ensureWeekNo(Seq(Tuple1(9)).toDF("id"))
    assert(d2.select("day", "week_no").as[(Int, Long)].collect().toSeq == Seq((1, 1L)))
    // week_no already present (any case) -> untouched, no day added
    val d3 = SchemaCompat.ensureWeekNo(Seq((9, 42L)).toDF("id", "Week_No"))
    assert(d3.columns.toSeq == Seq("id", "Week_No", "day"))
    assert(d3.select("Week_No").as[Long].collect().toSeq == Seq(42L))
  }

  test("SchemaCompat.writePartitionedIfPresent: partitions only when the column exists") {
    val dir = java.nio.file.Files.createTempDirectory("schemacompat").toString
    val df = Seq((1L, "A"), (2L, "B")).toDF("k", "dept")
    SchemaCompat.writePartitionedIfPresent(df, s"$dir/p", "department")
    assert(!new java.io.File(s"$dir/p").listFiles().exists(_.getName.startsWith("dept")))
    SchemaCompat.writePartitionedIfPresent(df, s"$dir/q", "DEPT")
    assert(new java.io.File(s"$dir/q").listFiles().exists(_.getName.startsWith("dept=")))
    assert(spark.read.parquet(s"$dir/q").count() == 2)
  }

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

  test("AsOfJoin.leftAsOf: same-instant match, max-tie pick, null when no prior row") {
    import graft.transform.AsOfJoin
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0"), (2L, 10L, "p2"))
      .toDF("k", "lts", "lid")
    // two right rows tie at (k=1, ts=100): the greater rid must win;
    // k=2 has no right row at-or-before ts=10
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 40L, 3L), (2L, 11L, 5L))
      .toDF("k", "rts", "rid")
    val got = AsOfJoin.leftAsOf(left, right, Seq("k"), "lts", "rts", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
    assert(got == Set((1L, 100L, 9L), (1L, 50L, 3L), (2L, 10L, -1L)))
  }

  test("Dedup.distinctRows is full-row distinct; dropDuplicateKeys keeps one row per key [P13]") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    assert(Dedup.distinctRows(df).collect().toSet.size == 3)
    val byKey = Dedup.dropDuplicateKeys(df, Seq("k")).collect()
    assert(byKey.map(_.getInt(0)).toSet == Set(1, 2) && byKey.length == 2)
  }

  test("Cleaning.fillCategorical imputes the sentinel only in the named columns [P12]") {
    val df = Seq((1, null.asInstanceOf[String], null.asInstanceOf[String]),
      (2, "kept", "kept")).toDF("k", "a", "b")
    val out = Cleaning.fillCategorical(df, Seq("a")).orderBy("k").collect()
    assert(out(0).getString(1) == "UNKNOWN", "named null column must be imputed")
    assert(out(0).isNullAt(2), "unnamed column must keep its null")
    assert(out(1).getString(1) == "kept")
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

  test("IntervalJoin: binned overlap == naive cross-product overlap, one row per pair") {
    import graft.transform.IntervalJoin
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    // spans multiple cells, zero-length, same-cell-non-overlapping
    val l = Seq((1L, t(0), t(200)), (2L, t(10), t(10)), (3L, t(500), t(520)))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, t(150), t(400)), (20L, t(10), t(12)), (30L, t(530), t(540)))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapBinned(l, "ls", "le", r, "rs", "re", 3600L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naive && got == Set((1L, 10L), (1L, 20L), (2L, 20L)))
    // multi-cell overlaps emitted exactly once each
    val n = IntervalJoin.overlapBinned(l, "ls", "le", r, "rs", "re", 3600L).count()
    assert(n == 3L)
  }

  test("IntervalJoin: NTZ and mixed NTZ/LTZ inputs join on one coherent timeline") {
    import graft.transform.IntervalJoin
    import org.apache.spark.sql.types.TimestampNTZType
    import java.sql.Timestamp
    def t(min: Long) = new Timestamp(min * 60000L)
    val l = Seq((1L, t(0), t(200)), (2L, t(10), t(10)), (3L, t(500), t(520)))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, t(150), t(400)), (20L, t(10), t(12)), (30L, t(530), t(540)))
      .toDF("rid", "rs", "re")
    def ntz(df: org.apache.spark.sql.DataFrame, cols: String*) =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampNTZType)))
    val want = Set((1L, 10L), (1L, 20L), (2L, 20L))
    def pairs(lf: org.apache.spark.sql.DataFrame, rf: org.apache.spark.sql.DataFrame) =
      IntervalJoin.overlapBinned(lf, "ls", "le", rf, "rs", "re", 3600L)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // both sides NTZ — the r9 footer shape
    assert(pairs(ntz(l, "ls", "le"), ntz(r, "rs", "re")) == want)
    // mixed: one side NTZ, one LTZ — epochMicros puts both on one timeline
    assert(pairs(ntz(l, "ls", "le"), r) == want)
    assert(pairs(l, ntz(r, "rs", "re")) == want)
  }

  test("Cumulative: two-level prefix sum == single-partition running sum") {
    import org.apache.spark.sql.expressions.Window
    // keys deliberately adversarial for bucketing: clustered + outliers
    val rows = (1 to 400).map(i => (i.toLong * 7 % 1009, 1L, i.toLong % 5))
    val df = rows.toDF("k", "one", "w").dropDuplicates("k").repartition(13)
    val bucket = floor(col("k") * lit(16L) / lit(1010L)).cast("int")
    val got = Cumulative.runningTotals(df, "k", bucket,
      Seq("one" -> "idx", "w" -> "cw"))
      .select("k", "idx", "cw").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val wAll = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("k"),
      sum(col("one")).over(wAll).as("idx"), sum(col("w")).over(wAll).as("cw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the hex-prefix bucket is monotone in the md5 string order
    val hexed = df.select(md5(col("k").cast("string").cast("binary")).as("h"))
      .select(col("h"), Cumulative.hexPrefixBucket(col("h"), 2).as("b"))
      .orderBy("h").collect().map(_.getInt(1))
    assert(hexed.toSeq == hexed.toSeq.sorted)
  }
}
