package graft

import graft.core.{Catalog, GraftSession}
import graft.ext.{MinHashDedup, TextStats}
import org.apache.spark.sql.functions._

/** Dev-loop probe (r21): per-kernel cost of the corpus text pass —
  * regex stats vs MinHash signature vs gram hashes vs both shingle
  * kernels in one projection. Says whether fusing sig+grams into one
  * digest pass is worth a native expression.
  *
  * Usage: Test/runMain graft.ProbeTextKernels [runs] [sfDir]
  */
object ProbeTextKernels {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-textkernels", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Catalog(spark, sf).documents
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)

    def timed(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s min ${ts.min}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val shingled = length(col("text")) >= 5
    timed("baseline scan")(docs.select(col("doc_id"), length(col("text"))))
    timed("regex stats")(docs.select(col("doc_id"),
      TextStats.nWordsCol(col("text")), TextStats.qualityScoreCol(col("text")),
      TextStats.predictedLangCol(col("text"))))
    timed("sig only")(docs.select(col("doc_id"),
      when(shingled, graft.functions.MinHashSignature.of(col("text"), 5,
        MinHashDedup.numHashes, MinHashDedup.P))))
    timed("grams only")(docs.select(col("doc_id"),
      when(shingled, graft.functions.HashedNgrams.of(col("text"), 5))))
    timed("sig+grams (2 kernels)")(docs.select(col("doc_id"),
      when(shingled, graft.functions.MinHashSignature.of(col("text"), 5,
        MinHashDedup.numHashes, MinHashDedup.P)),
      when(shingled, graft.functions.HashedNgrams.of(col("text"), 5))))
    timed("full prep projection")(MinHashDedup.prepared(docs))
    spark.stop()
  }
}
