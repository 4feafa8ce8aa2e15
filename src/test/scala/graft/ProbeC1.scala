package graft

import org.apache.spark.sql.functions._
import graft.ext._

/** Dev-only: stage-by-stage timing of the c1 curation pipeline at sf0.1
  * (not part of the suite).
  */
object ProbeC1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("probec1", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // replicate curate()'s stages with explicit materialization points
    spark.catalog.clearCache(); System.gc()
    val prep = time("prep build+cache") {
      val p = MinHashDedup.prepared(
        docs.repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("text"),
            TextStats.nWordsCol(col("text")).as("n_words"),
            TextStats.qualityScoreCol(col("text")).as("quality_score"),
            TextStats.predictedLangCol(col("text")).as("predicted_lang")))
        .cache()
      p.count()
      p
    }
    val pairs = time("verified pairs (from prep)") {
      val pr = MinHashDedup.verifiedPairsFromPrepared(prep, 0.5)
      println("  pairs=" + pr.count())
      pr
    }
    time("components") {
      val c = DedupClusters.components(prep, pairs)
      println("  comp rows=" + c.count())
    }
    time("c1 end-to-end (fresh)") {
      spark.catalog.clearCache(); System.gc()
      println("  rows=" + CorpusPipeline.curate(docs).count())
    }
    time("c1 end-to-end (again)") {
      spark.catalog.clearCache(); System.gc()
      println("  rows=" + CorpusPipeline.curate(docs).count())
    }
    spark.stop()
  }
}
