package graft

import graft.core.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import scala.collection.mutable

/** Dev-loop probe: per-Spark-job wall-time attribution for a registry
  * query — run the query once (warm), then once measured with a job
  * listener, and print every job's duration and first-stage name. Shows
  * where a multi-job operator (driver fits, iterative rounds, sink
  * writes) actually spends its wall clock.
  *
  * Usage: Test/runMain graft.ProbeJobs <queryName> [sfDir]
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-jobs", 32)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm run (codegen, staging memos)
    fn(spark, sf).count()
    spark.catalog.clearCache(); System.gc()

    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name.split("\n").head))
          .getOrElse("?")
        starts(js.jobId) = (System.nanoTime(), desc.take(90))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          rows += ((je.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sf).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"[probe] $name total ${total}%.2f s, rows $n, jobs ${rows.size}")
    rows.sortBy(_._1).foreach { case (id, sec, d) =>
      println(f"[probe] job $id%4d ${sec}%7.3f s  $d")
    }
    println(f"[probe] sum-of-jobs ${rows.map(_._2).sum}%.2f s (gaps = driver time)")
    spark.stop()
  }
}
