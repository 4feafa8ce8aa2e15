package graft

import graft.core.GraftSession
import graft.streaming.{DocStream, EventStream}

/** Dev-loop probe (r21): 8 vs 4 state partitions across ALL the
  * run-to-completion streaming gates, interleaved min-of-N. r20 settled
  * min(8, cores); the e6 phase probe (ProbeStreamGaps) showed batch
  * addBatch time still scales with the store count at these state
  * volumes, so this measures whether 4 wins across the whole family
  * before moving the shared gateStateParts bound.
  *
  * Usage: Test/runMain graft.ProbeStateParts4 [runs] [cores] [sfDir]
  */
object ProbeStateParts4 {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val cores = if (args.length > 1) args(1).toInt else 32
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-stateparts", cores)
    spark.sparkContext.setLogLevel("WARN")

    val events = graft.core.Scratch.path("probe_events_dir")
    spark.read.parquet(s"$sf/events.parquet").coalesce(1)
      .write.mode("overwrite").parquet(events)
    val dups = graft.core.Scratch.path("probe_docs_dir")
    spark.read.parquet(s"$sf/documents.parquet").coalesce(1)
      .write.mode("overwrite").parquet(dups)
    // e10's two-file split (time-ordered halves, the gate's staging shape)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val cut = "2024-01-16"
    val fa = graft.core.Scratch.path("probe_e10_a")
    val fb = graft.core.Scratch.path("probe_e10_b")
    ev.filter(org.apache.spark.sql.functions.col("ts") < cut)
      .coalesce(1).write.mode("overwrite").parquet(fa)
    ev.filter(org.apache.spark.sql.functions.col("ts") >= cut)
      .coalesce(1).write.mode("overwrite").parquet(fb)
    def onePart(d: String): String =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet")).head.toString
    val customer = spark.read.parquet(s"$sf/customer.parquet")

    val gates: Seq[(String, Int => Long)] = Seq(
      ("e4 totals", p => EventStream.runStatefulToCompletion(spark, events,
        statePartitions = Some(p)).count()),
      ("e5 sessions", p => EventStream.runStatefulSessionsToCompletion(spark, events, 30,
        statePartitions = Some(p)).count()),
      ("e6 attrib inner", p => EventStream.runAttributionToCompletion(spark, events, 30,
        statePartitions = Some(p)).count()),
      ("e12 attrib outer", p => EventStream.runAttributionToCompletion(spark, events, 30,
        queryName = "probe_e12", statePartitions = Some(p), joinType = "left_outer").count()),
      ("e7 file sink", p => EventStream.runHourlyToParquet(spark, events,
        graft.core.Scratch.path(s"probe_e7_$p"), statePartitions = Some(p)).count()),
      ("e8 doc dedup", p => DocStream.runDedupToCompletion(spark, dups,
        statePartitions = Some(p)).count()),
      ("e9 stream static", p => EventStream.runStreamStaticToCompletion(spark, events,
        customer, statePartitions = Some(p)).count()),
      ("e10 restart", p => EventStream.runHourlyRestart(spark, onePart(fa), onePart(fb),
        graft.core.Scratch.path(s"probe_e10_$p"), statePartitions = Some(p)).count())
    )

    // warm pass (codegen, staging)
    gates.foreach { case (_, f) => f(8) }

    def timed(f: => Long): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for ((name, f) <- gates) {
      val pairs = (1 to runs).map { _ => (timed(f(8)), timed(f(4))) }
      val m8 = pairs.map(_._1).min; val m4 = pairs.map(_._2).min
      println(f"[probe] $name%-18s @8 min $m8%.2f  @4 min $m4%.2f  " +
        pairs.map(p => f"(${p._1}%.2f,${p._2}%.2f)").mkString(" "))
    }
    spark.stop()
  }
}
