package graft

import graft.ext._

/** Dev-only: isolated c1-vs-c2 timing on a given corpus parquet (arg 0:
  * path, arg 1: c1|c2, arg 2: repeats). Fresh session per invocation.
  */
object ProbeC1C2 {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val which = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.GraftSession.local("probec1c2", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(path)
    for (i <- 0 until reps) {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = (if (which == "c1") CorpusPipeline.curate(raw)
               else CorpusPipeline.curateFiltered(raw)).count()
      println(f"C1C2PROBE $which rep$i ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
    }
    spark.stop()
  }
}
