package graft

import graft.ext.LabelPropagation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe for the g4 superstep-state mechanism at 10x edges —
  * dev-loop only. The r11 GraphScaleProbe runs measured g4_labelprop_10x
  * at 35.5–38.1 s where r10 (cache-based supersteps) recorded 23.8 s,
  * while the min-of-3 BENCH number at sf0.1 IMPROVED (5.13 → 4.07–4.88);
  * the only code change is superstep labels moving from CacheManager
  * `.cache()` entries to ContextCleaner-managed `localCheckpoint`s.
  * This probe times the shipped form against an inline replica of the
  * old cache-based superstep loop in ONE session, alternating, so
  * cross-day machine drift cancels and the mechanism cost is isolated.
  */
object ProbeG4AB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("probe-g4ab", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scale", "edges10x.parquet").toString
    val edges = spark.read.parquet(path)
    println(s"[probe] edges: ${edges.count()}")

    def timed(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }

    // variant B: the pre-r11 cache-based superstep loop (r10 shipped form)
    def communitiesCached(edges: DataFrame, iterations: Int = 3): DataFrame = {
      val adj = edges.select(col("src"), col("dst")).repartition(col("src")).cache()
      val nodes = adj.select(col("src").as("node"))
        .union(adj.select(col("dst").as("node")))
        .distinct()
      var labels = nodes.select(col("node"), col("node").as("label"))
      var prevCached: Option[DataFrame] = None
      for (i <- 1 to iterations) {
        val votes = adj
          .join(labels.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("votes"))
        val picked = votes
          .groupBy(col("dst"))
          .agg(max(struct(col("votes"), (-col("label")).as("neg"))).as("m"))
          .select(col("dst").as("node"), (-col("m.neg")).as("new_label"))
        val next = labels
          .join(picked, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("new_label"), col("label")).as("label"))
          .cache()
        next.count()
        prevCached.foreach(_.unpersist())
        prevCached = Some(next)
        labels = next
      }
      val out = labels.orderBy(col("node")).localCheckpoint(true)
      prevCached.foreach(_.unpersist())
      adj.unpersist()
      out
    }

    for (r <- 1 to 2) {
      timed(s"A shipped (localCkpt) #$r") { LabelPropagation.communities(edges).count() }
      timed(s"B cache supersteps  #$r") { communitiesCached(edges).count() }
    }
    spark.stop()
  }
}
