package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for g3 (BFS hops) — dev-loop only. */
object ProbeG3 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-g3", 32)
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

    val adj = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .dropDuplicates(Seq("src", "dst"))
      .cache()
    println(s"[probe] adj rows: ${timed("adj build")(adj.count())}")
    val nodes = adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node")))
      .distinct()
    var dist = nodes.where(col("node") % 50L === 0)
      .select(col("node"), lit(0L).as("hops"))
      .cache()
    println(s"[probe] seeds: ${timed("seed")(dist.count())}")
    var frontier = dist
    for (k <- 1 to 4) {
      val next = frontier
        .join(adj, col("node") === col("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(k.toLong).as("hops"))
        .cache()
      val n = timed(s"round $k expand")(next.count())
      println(s"[probe]   frontier $k size: $n")
      val grown = dist.union(next).cache()
      timed(s"round $k union")(grown.count())
      dist.unpersist()
      if (k > 1) frontier.unpersist()
      dist = grown
      frontier = next
    }
    timed("final sort")(dist.orderBy(col("node")).count())
    spark.stop()
  }
}
