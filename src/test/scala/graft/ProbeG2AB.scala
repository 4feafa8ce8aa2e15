package graft

import graft.ext.Triangles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe for the g2 result-materialization cost at 10x edges —
  * dev-loop only. r11 saw g2_triangles_10x at ~100-109 s across three
  * GraphScaleProbe runs where r10 recorded 57 s; the only code change in
  * the path is the final eager `localCheckpoint(true)` AFTER the global
  * `orderBy` (the cache-release contract's materialization barrier).
  * Hypothesis: under the old lazy return, the probe's `.count()` let
  * EliminateSorts drop the range-partitioned sort entirely; the eager
  * checkpoint now executes it — including the range-boundary sampling
  * pass — inside the operator. This probe times the shipped form against
  * a checkpoint-before-sort form on the same cached 10x edge list.
  */
object ProbeG2AB {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("probe-g2ab", 32)
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

    // variant B: identical to Triangles.countUnd but checkpoints the
    // UNSORTED aggregate and returns the sort lazily
    def perNodeB(edges: DataFrame): DataFrame = {
      val und = edges
        .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
        .where(col("u") =!= col("v"))
        .distinct()
        .cache()
      val deg = und
        .select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .cache()
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
      val m = oriented.count()
      und.unpersist(); deg.unpersist()
      val x = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("da"))
      val y = oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("db"))
      val wedges = x.join(y, Seq("src"))
        .where(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")))
      val bf = oriented.stat.bloomFilter(expr("xxhash64(src, dst)"), m, 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val mightContain = {
        import org.apache.spark.sql.GraftColumnBridge._
        column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          expression(lit(bos.toByteArray)), expression(expr("xxhash64(a, b)"))))
      }
      val tri = wedges.where(mightContain)
        .join(oriented.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"))
      val counts = tri
        .select(explode(array(col("src"), col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
        .localCheckpoint(true)          // checkpoint BEFORE the sort
      oriented.unpersist()
      counts.orderBy(col("node"))       // sort stays lazy over 200k rows
    }

    for (r <- 1 to 2) {
      timed(s"A shipped (sort+ckpt) #$r") { Triangles.perNode(edges).count() }
      timed(s"B ckpt-then-lazy-sort #$r") { perNodeB(edges).count() }
    }
    spark.stop()
  }
}
