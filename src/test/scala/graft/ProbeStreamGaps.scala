package graft

import graft.core.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Dev-loop probe: wall-clock attribution INSIDE a run-to-completion
  * streaming gate (e6/e12 shape) — the ProbeJobs view showed ~half the
  * gate's cost is driver gaps, this one says which streaming phase:
  * per-batch durationMs from StreamingQueryProgress (triggerExecution,
  * queryPlanning, walCommit, stateStore commit...) plus the start/stop
  * walls the progress events cannot see.
  *
  * Arms: `two` = current two-source attribution join; `one` = shared
  * single-source self-join variant; stateParts from args.
  *
  * Usage: Test/runMain graft.ProbeStreamGaps <two|one> <stateParts> [sfDir]
  */
object ProbeStreamGaps {
  def main(args: Array[String]): Unit = {
    val arm = args(0)
    val parts = args(1).toInt
    val sf = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-stream-gaps", 32)
    spark.sparkContext.setLogLevel("WARN")

    // stage the events dir exactly as the gate does (memoized helper is
    // private; one coalesced copy is equivalent for timing)
    val dir = graft.core.Scratch.dir("probe_e6_events")
    spark.read.parquet(s"$sf/events.parquet").coalesce(1)
      .write.mode("overwrite").parquet(dir)

    def run(tag: String): Unit = {
      val t0 = System.nanoTime()
      val session = spark.newSession()
      session.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val tClone = System.nanoTime()
      val windowMinutes = 30
      def src() = graft.streaming.EventStream.readStream(session, dir)
      val joined = arm match {
        case "two" =>
          val views = src().filter(col("event_type") === "view")
            .select(col("user_id").as("v_user"), col("event_id").as("view_event_id"),
              col("ts").as("v_ts"))
            .withWatermark("v_ts", "1 hour")
          val buys = src().filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user"), col("event_id").as("purchase_event_id"),
              col("ts").as("p_ts"))
            .withWatermark("p_ts", "1 hour")
          views.join(buys, expr(
            s"v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval $windowMinutes minutes"),
            "inner")
        case "one" =>
          val ev = src()
          val views = ev.filter(col("event_type") === "view")
            .select(col("user_id").as("v_user"), col("event_id").as("view_event_id"),
              col("ts").as("v_ts"))
            .withWatermark("v_ts", "1 hour")
          val buys = ev.filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user"), col("event_id").as("purchase_event_id"),
              col("ts").as("p_ts"))
            .withWatermark("p_ts", "1 hour")
          views.join(buys, expr(
            s"v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval $windowMinutes minutes"),
            "inner")
      }
      val out = joined.select(
        col("v_user").as("user_id"),
        col("view_event_id"), col("purchase_event_id"),
        col("v_ts").as("view_ts"), col("p_ts").as("purchase_ts"))
      val tPlan = System.nanoTime()
      session.catalog.dropTempView("probe_e6")
      val q: StreamingQuery = out.writeStream
        .outputMode("append")
        .format("memory")
        .queryName("probe_e6")
        .start()
      val tStart = System.nanoTime()
      q.processAllAvailable()
      val tAvail = System.nanoTime()
      q.stop()
      val tStop = System.nanoTime()
      val n = session.table("probe_e6").count()
      val tEnd = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
      println(s"[gaps] $tag arm=$arm parts=$parts rows=$n total=${s(t0, tEnd)}" +
        s" clone=${s(t0, tClone)} planBuild=${s(tClone, tPlan)} start=${s(tPlan, tStart)}" +
        s" process=${s(tStart, tAvail)} stop=${s(tAvail, tStop)} count=${s(tStop, tEnd)}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"[gaps]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${d.entrySet().toArray.mkString(", ")} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString("/")}")
      }
    }
    run("warm")
    spark.catalog.clearCache(); System.gc()
    run("run1")
    run("run2")
    spark.stop()
  }
}
