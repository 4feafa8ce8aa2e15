package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for g2 (triangles) — dev-loop only. */
object ProbeG2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-g2", 32)
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Catalog(spark, sf).lineitem.select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))

    val und = edges
      .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
      .where(col("u") =!= col("v"))
      .distinct()
      .cache()
    println(s"[probe] und edges: ${timed("und build")(und.count())}")
    val deg = und
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .cache()
    println(s"[probe] nodes: ${timed("deg build")(deg.count())}")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
      .repartition(col("src"))
      .cache()
    println(s"[probe] oriented: ${timed("orient")(oriented.count())}")
    val x = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("da"))
    val y = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("db"))
    val wedges = x.join(y, Seq("src"))
      .where(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
    println(s"[probe] wedges: ${timed("wedge count")(wedges.count())}")
    val tri = wedges.join(oriented.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"))
    println(s"[probe] triangles: ${timed("closure")(tri.count())}")
    timed("per-node agg") {
      tri.select(explode(array(col("src"), col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles")).count()
    }
    spark.stop()
  }
}
