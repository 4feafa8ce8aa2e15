package graft

import graft.core.{Catalog, GraftSession}
import graft.ext.MinHashDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop probe (r21, VERDICT item 7): join-strategy A/B on the
  * minhash verify stage — candidates joined to the (doc_id, grams) side
  * twice. Arms: `auto` (planner + AQE, the shipped form), `shuffle_hash`
  * (hint both gram joins), `bcast` (broadcast the candidate side, gram
  * side never shuffles). Prints the joins actually planned plus
  * interleaved min-of-N timings.
  *
  * Usage: Test/runMain graft.ProbeVerifyJoin [runs] [sfDir]
  */
object ProbeVerifyJoin {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-verifyjoin", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Catalog(spark, sf).documents

    def pipeline(arm: String): DataFrame = {
      val g = docs.select(
        col("doc_id"), graft.functions.HashedNgrams.of(col("text"), 5).as("grams"))
        .cache()
      val cand0 = MinHashDedup.candidatePairs(docs, 5, 50)
      val cand = if (arm == "bcast") broadcast(cand0) else cand0
      def gramSide(as: String, key: String) = {
        val s = g.select(col("doc_id").as(key), col("grams").as(as))
        if (arm == "shuffle_hash") s.hint("shuffle_hash") else s
      }
      val joined = cand
        .join(gramSide("grams_a", "doc_a"), "doc_a")
        .join(gramSide("grams_b", "doc_b"), "doc_b")
        .withColumn("n_inter",
          graft.functions.SortedIntersectCount.ofSorted(col("grams_a"), col("grams_b")))
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (size(col("grams_a")) + size(col("grams_b")) - col("n_inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      try joined.localCheckpoint(true) finally g.unpersist()
    }

    // one warm pass + show the planned joins per arm (pre-execution plan)
    for (arm <- Seq("auto", "shuffle_hash", "bcast")) {
      val n = pipeline(arm).count()
      println(s"[probe] warm $arm n=$n")
    }
    def timed(arm: String): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); pipeline(arm).count()
      (System.nanoTime() - t0) / 1e9
    }
    val rows = (1 to runs).map(_ => (timed("auto"), timed("shuffle_hash"), timed("bcast")))
    println(f"[probe] auto min ${rows.map(_._1).min}%.2f  shuffle_hash min ${rows.map(_._2).min}%.2f  bcast min ${rows.map(_._3).min}%.2f")
    rows.foreach { r => println(f"[probe]   (${r._1}%.2f, ${r._2}%.2f, ${r._3}%.2f)") }
    spark.stop()
  }
}
