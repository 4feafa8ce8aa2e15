package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop probe (r21, VERDICT item 2): PageRank superstep fusion —
  * the shipped form runs per superstep (a) contrib agg by dst, (b) a
  * left join of the cached node set against the agg to re-attach
  * dangling nodes. The fused arm unions a zero-contrib row per node
  * into the contrib stream so ONE aggregate produces the next rank
  * frame — same integer arithmetic (sum over {contribs, 0} ==
  * coalesce(sum(contribs), 0)), one fewer per-round join. Prints
  * interleaved end-to-end rank-chain timings + hash equality of the
  * final frame.
  *
  * Usage: Test/runMain graft.ProbeRankFuse [runs] [sfDir]
  */
object ProbeRankFuse {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-rankfuse", 32)
    spark.sparkContext.setLogLevel("WARN")

    def edges: DataFrame = {
      val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    }

    def run(arm: String): (Double, Long) = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val scale = 1000000000000L
      val withDeg = edges
        .repartition(col("src"))
        .withColumn("outdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
        .cache()
      val nodes = withDeg.select(col("src").as("node"))
        .union(withDeg.select(col("dst").as("node")))
        .distinct()
        .cache()
      try {
        val n = nodes.count()
        val teleport = (scale * 15L) / (100L * n)
        var rank = nodes.select(col("node"), lit(scale / n).as("rank"))
        for (_ <- 1 to 5) {
          val contribs = withDeg
            .join(rank.withColumnRenamed("node", "src"), Seq("src"))
            .selectExpr("dst", "rank DIV outdeg AS contrib")
          rank = arm match {
            case "join" =>
              nodes
                .join(contribs.groupBy(col("dst")).agg(sum(col("contrib")).as("in_sum"))
                  .withColumnRenamed("dst", "node"), Seq("node"), "left")
                .selectExpr("node",
                  s"${teleport}L + (85 * coalesce(in_sum, 0L)) DIV 100 AS rank")
                .localCheckpoint(true)
            case "fused" =>
              contribs.selectExpr("dst AS node", "contrib")
                .union(nodes.select(col("node"), lit(0L).as("contrib")))
                .groupBy(col("node")).agg(sum(col("contrib")).as("in_sum"))
                .selectExpr("node",
                  s"${teleport}L + (85 * in_sum) DIV 100 AS rank")
                .localCheckpoint(true)
          }
        }
        val top = rank.orderBy(col("rank").desc, col("node").asc).limit(100)
        val h = top.selectExpr("CAST(bit_xor(hash(node, rank)) AS BIGINT) AS h").head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, h)
      } finally { withDeg.unpersist(); nodes.unpersist() }
    }

    run("join"); run("fused") // warm
    val rows = (1 to runs).map(_ => (run("join"), run("fused")))
    val hj = rows.map(_._1._2).distinct; val hf = rows.map(_._2._2).distinct
    println(f"[probe] join min ${rows.map(_._1._1).min}%.2f  fused min ${rows.map(_._2._1).min}%.2f  hashEqual=${hj == hf} ($hj vs $hf)")
    rows.foreach(r => println(f"[probe]   (${r._1._1}%.2f, ${r._2._1}%.2f)"))
    spark.stop()
  }
}
