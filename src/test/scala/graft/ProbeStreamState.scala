package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** Dev-loop probe: how much of each run-to-completion streaming gate is
  * state-store bring-up at the batch session's 32 shuffle partitions?
  * A stateful streaming query pins its state partitioning to
  * `spark.sql.shuffle.partitions` AT START; e6/e12 already size it to
  * the gate's kilobytes of state (statePartitions=8). This measures the
  * same clone-session treatment for e4/e5/e7/e8-shaped runs.
  */
object ProbeStreamState {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-streamstate", 32)
    spark.sparkContext.setLogLevel("WARN")

    def clone8(n: Int): SparkSession = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", n.toString)
      s2
    }

    // self-staged single-file dirs (the gates' staging shape: one part
    // file = one micro-batch)
    val events = graft.core.Scratch.path("probe_events_dir")
    spark.read.parquet(s"$sf/events.parquet").coalesce(1)
      .write.mode("overwrite").parquet(events)
    val dups = graft.core.Scratch.path("probe_docs_dir")
    spark.read.parquet(s"$sf/documents.parquet").coalesce(1)
      .write.mode("overwrite").parquet(dups)

    def timed(name: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $name%-26s min ${ts.map(_._1).min}%.2f s  (${ts.map(t => f"${t._1}%.2f").mkString(", ")})  n=${ts.head._2}")
    }

    timed("e4 totals @32")(
      graft.streaming.EventStream.runStatefulToCompletion(spark, events).count())
    timed("e4 totals @8")(
      graft.streaming.EventStream.runStatefulToCompletion(clone8(8), events).count())
    timed("e5 sessions @32")(
      graft.streaming.EventStream.runStatefulSessionsToCompletion(spark, events, 30).count())
    timed("e5 sessions @8")(
      graft.streaming.EventStream.runStatefulSessionsToCompletion(clone8(8), events, 30).count())
    timed("e7 file sink @32")(
      graft.streaming.EventStream.runHourlyToParquet(spark, events,
        graft.core.Scratch.path("probe_e7a")).count())
    timed("e7 file sink @8")(
      graft.streaming.EventStream.runHourlyToParquet(clone8(8), events,
        graft.core.Scratch.path("probe_e7b")).count())
    timed("e8 dedup @32")(
      graft.streaming.DocStream.runDedupToCompletion(spark, dups).count())
    timed("e8 dedup @8")(
      graft.streaming.DocStream.runDedupToCompletion(clone8(8), dups).count())
    spark.stop()
  }
}
