package graft

import graft.ext._
import org.apache.spark.sql.functions._

/** Dev-only: per-round timing of d8 label propagation on the 10x probe
  * corpus (not part of the suite). Expects ScaleProbe to have written
  * /tmp/graft_scale/docs10x.parquet.
  */
object ProbeD8 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("probed8", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_scale", "docs10x.parquet").toString
    val raw = spark.read.parquet(tmp)
    val docs = CorpusPipeline.spreadText(raw)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"D8PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val pairs = t("verifiedPairs+count") {
      val p = MinHashDedup.verifiedPairs(docs, 5, 0.5)
      println("  pairs=" + p.count())
      p
    }
    // replicate components() with per-round timing
    val edges = t("edges cache") {
      val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))).cache()
      e.count(); e
    }
    var labels = t("seed") {
      val l = edges.groupBy(col("src")).agg(min(col("dst")).as("nmin"))
        .select(col("src").as("doc_id"), least(col("src"), col("nmin")).as("cluster_id")).cache()
      l.count(); l
    }
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      t(s"round $iter") {
        val neighborMin = edges.join(labels, col("dst") === col("doc_id"))
          .groupBy(col("src")).agg(min(col("cluster_id")).as("nmin"))
        val nextRaw = labels.join(neighborMin, col("doc_id") === col("src"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("cluster_id"),
            (coalesce(col("nmin"), col("cluster_id")) < col("cluster_id")).as("relabeled"))
        val next = nextRaw.localCheckpoint()
        val changed = next.filter(col("relabeled")).limit(1).count()
        labels.unpersist()
        labels = next
        converged = changed == 0
        iter += 1
      }
    }
    println("D8PROBE rounds=" + iter)
    t("final join+groupBy") {
      println("  clusters=" + raw.select(col("doc_id"))
        .join(labels.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members")).count())
    }
    spark.stop()
  }
}
