package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext._

/** Dev-only profiling harness for the c1/c2 corpus pipelines (not part
  * of the bench contract; run via scripts/ sourcepath).
  */
object ProfileC2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    println("docs=" + docs.count() + " avg_len=" +
      docs.agg(avg(length(col("text")))).head().getDouble(0))
    val keep = TextStats.qualityScoreCol(col("text")) >= 0.8 &&
      TextStats.predictedLangCol(col("text")) === "en"
    time("plain count")(docs.count())
    time("filter count")(docs.filter(keep).count())
    time("filter count x2")(docs.filter(keep).count() + docs.filter(keep).count())
    time("signatures full")(MinHashDedup.signatures(docs).count())
    val surv = docs.filter(keep).select(col("doc_id"), col("text"))
    time("signatures survivors")(MinHashDedup.signatures(surv).count())
    time("verifiedPairs full")(MinHashDedup.verifiedPairs(docs, 5, 0.5).count())
    time("verifiedPairs survivors")(MinHashDedup.verifiedPairs(surv, 5, 0.5).count())
    time("components full") {
      DedupClusters.components(docs, MinHashDedup.verifiedPairs(docs, 5, 0.5)).count()
    }
    time("components survivors") {
      DedupClusters.components(surv, MinHashDedup.verifiedPairs(surv, 5, 0.5)).count()
    }
    time("c1 full")(CorpusPipeline.curate(docs).count())
    time("c2 full")(CorpusPipeline.curateFiltered(docs).count())
    spark.stop()
  }
}
