package graft

import graft.core.GraftSession
import graft.ext._
import org.apache.spark.sql.functions._

/** Dev-loop probe: stage attribution for the c1/c2 curation pipeline at
  * sf0.1 — prepared-frame build, pair generation, component rounds, and
  * the final join — to see where the remaining seconds live.
  */
object ProbeCorpusStages {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-corpus", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.count()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // replicate preparedCorpus (private) inline
    val prep = MinHashDedup.prepared(
      docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("text"),
          TextStats.nWordsCol(col("text")).as("n_words"),
          TextStats.qualityScoreCol(col("text")).as("quality_score"),
          TextStats.predictedLangCol(col("text")).as("predicted_lang")))
      .cache()
    timed("prep build+materialize")(prep.count())
    val pairs = timed("verified pairs (lazy)")(
      MinHashDedup.verifiedPairsFromPrepared(prep, 0.5))
    val pairsC = pairs.cache()
    timed("pairs materialize")(pairsC.count())
    val comp = timed("components")(DedupClusters.components(prep, pairsC).cache())
    timed("components materialize")(comp.count())
    timed("final join+filter")(
      prep.join(comp, "doc_id")
        .filter(col("quality_score") >= 0.8 &&
          col("predicted_lang") === "en" &&
          col("doc_id") === col("cluster_id"))
        .select(col("doc_id"), col("n_words"), col("quality_score")).count())
    prep.unpersist(); pairsC.unpersist(); comp.unpersist()

    // full operator timings for reference (min-of-2, cold)
    def timedCold(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-28s min ${ts.map(_._1).min}%.2f s  (${ts.map(t => f"${t._1}%.2f").mkString(", ")})  n=${ts.head._2}")
    }
    timedCold("c1 curate")(CorpusPipeline.curate(docs).count())
    timedCold("c2 curateFiltered")(CorpusPipeline.curateFiltered(docs).count())
    spark.stop()
  }
}
