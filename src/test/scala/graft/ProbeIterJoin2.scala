package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop probe #2: (a) does PageRank's window-built cache already
  * expose a src ordering (no per-iteration Sort)?  (b) what does
  * pre-sorting the oriented cache buy the triangle wedge self-join?
  */
object ProbeIterJoin2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-iterjoin2", 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
    li.count()
    def edges: DataFrame = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))

    def timed(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-34s min ${ts.map(_._1).min}%.2f s  (${ts.map(t => f"${t._1}%.2f").mkString(", ")})  n=${ts.head._2}")
    }

    // (a) g1 superstep plan under the current window-built cache
    {
      val withDeg = edges.repartition(col("src"))
        .withColumn("outdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
        .cache()
      withDeg.count()
      val nodes = withDeg.select(col("src").as("node"))
        .union(withDeg.select(col("dst").as("node"))).distinct()
      val rank = nodes.select(col("node"), lit(1000L).as("rank")).localCheckpoint(true)
      val inSum = withDeg.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst", "rank DIV outdeg AS contrib")
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_sum"))
      println("[probe] === g1 superstep plan ===")
      inSum.explain("formatted")
      withDeg.unpersist()
    }

    // (b) triangle wedge self-join: sorted vs unsorted oriented cache
    def triRun(sortCache: Boolean): Long = {
      val und = edges.selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
        .where(col("u") =!= col("v")).distinct().cache()
      val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg")).cache()
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val base = und
        .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
        .select(
          when(uFirst, col("u")).otherwise(col("v")).as("src"),
          when(uFirst, col("v")).otherwise(col("u")).as("dst"),
          when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
        .repartition(col("src"))
      val oriented = (if (sortCache) base.sortWithinPartitions(col("src")) else base).cache()
      oriented.count()
      und.unpersist(); deg.unpersist()
      val x = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("da"))
      val y = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("db"))
      val wedges = x.join(y, Seq("src"))
        .where(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")))
      val n = wedges.count()
      oriented.unpersist()
      n
    }
    timed("g2 wedge, unsorted cache")(triRun(sortCache = false))
    timed("g2 wedge, sorted cache")(triRun(sortCache = true))
    spark.stop()
  }
}
