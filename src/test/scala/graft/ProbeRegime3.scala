package graft

import graft.ext.Triangles
import org.apache.spark.sql.functions._

/** Dev-only probe for the r15 verdict's item 1: the closure ladder's
  * REGIME 3 — the partitioned shuffled-hash semi-join past
  * `bloomBroadcastMaxEdges` (`ext/Triangles.scala`) — is plan-audited
  * but was never MEASURED beyond 24M directed edges (the r13 ladder
  * probe, `bench_records/r13_closure_prune_probe.json`, which stopped
  * in regime 2). This probe forces the regime with the existing `-1`
  * sentinel on synthesized co-purchase graphs up to ~96M directed
  * edges and fits the scaling exponent, so the endgame path's posture
  * ("linear in the wedge count, embarrassingly partitioned") is a
  * measured claim rather than an argued one.
  *
  * Shape: the sf0.1 co-purchase edge list (~2.4M directed edges)
  * replicated as N DISJOINT copies with key offsets — per-order
  * fan-out, degree distribution, and triangle density are exactly the
  * original's (weak scaling), so row counts must scale exactly Nx and
  * the honest exponent of a partition-parallel plan is ~1.0; a
  * superlinear bend would name a real bottleneck (reducer memory,
  * spill, driver state). At each scale BOTH cross-over forms run —
  * the regime-2 broadcast-Bloom (`-2`) first (cheap-before-heavy),
  * then the regime-3 semi-join (`-1`) — min-of-2 each with
  * clearCache+GC hygiene and per-run loadavg stamps, so the
  * regime-2-vs-3 cost ratio is measured within ONE session at every
  * scale instead of against r13's ambient.
  *
  * Per-measurement shuffle telemetry rides a SparkListener: total
  * shuffle write bytes and the PEAK single-stage write (the number
  * that sizes reducer disk at the design point; listener events are
  * async, so counters settle behind a short drain sleep).
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "Test/runMain graft.ProbeRegime3"`;
  * paste the JSON line into `bench_records/r16_regime3_probe.json` and
  * the exponent into SCALING.md §4. Scales env-tunable:
  * `SPARK_GRAFT_R3_SCALES=10,20,40` (of the sf0.1 edge list).
  */
object ProbeRegime3 {

  private val Scales: Seq[Int] = sys.env.get("SPARK_GRAFT_R3_SCALES")
    .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(10, 20, 40))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("regime3", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_regime3").toString

    // per-stage shuffle-write telemetry (local mode: metrics on the
    // listener's StageInfo are complete once the stage event lands)
    val stageWrites = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          if (w > 0) stageWrites.add(w)
        }
      })

    // ---- synthesize the replicated edge lists (disjoint key offsets) ----
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges1x = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    val e1xPath = s"$tmp/edges_base.parquet"
    edges1x.write.mode("overwrite").parquet(e1xPath)
    def scalePath(n: Int) = s"$tmp/edges${n}x.parquet"
    for (n <- Scales) {
      val replicas = spark.range(0, n).select(col("id").as("replica"))
      spark.read.parquet(e1xPath).crossJoin(broadcast(replicas))
        .select((col("src") + col("replica") * 10000000L).as("src"),
          (col("dst") + col("replica") * 10000000L).as("dst"))
        .write.mode("overwrite").parquet(scalePath(n))
      println(s"synthesized ${n}x edges under ${scalePath(n)}")
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    val minSecs = scala.collection.mutable.LinkedHashMap.empty[(String, Int), Double]
    def measure(name: String, scale: Int)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        stageWrites.clear()
        val load = osBean.getSystemLoadAverage
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // listener drain
        import scala.jdk.CollectionConverters._
        val writes = stageWrites.asScala.toSeq
        val totalGb = math.rint(writes.sum / 1e7) / 100
        val peakGb = math.rint((if (writes.isEmpty) 0L else writes.max) / 1e7) / 100
        (math.rint(sec * 1000) / 1000, math.rint(load * 100) / 100, rows,
          totalGb, peakGb)
      }
      val best = runs.minBy(_._1)
      minSecs += (name, scale) -> best._1
      val tag = s"${name}_${scale}x"
      println(f"PROBE $tag%-16s min=${best._1}%8.3f s  " +
        f"runs=${runs.map(_._1).mkString("/")}  rows=${runs.head._3}  " +
        f"shuffleTotal=${best._4}%.2f GB  shufflePeakStage=${best._5}%.2f GB")
      results += s"${name}_${scale}x_sec" -> best._1
      results += s"${name}_${scale}x_runs" -> runs.map(_._1).mkString("[", ",", "]")
      results += s"${name}_${scale}x_loads" -> runs.map(_._2).mkString("[", ",", "]")
      results += s"${name}_${scale}x_rows" -> runs.head._3
      results += s"${name}_${scale}x_shuffle_total_gb" -> best._4
      results += s"${name}_${scale}x_shuffle_peak_stage_gb" -> best._5
    }

    for (scale <- Scales) {
      val edges = spark.read.parquet(scalePath(scale))
      results += s"${scale}x_edges" -> edges.count()
      // oriented m = the ladder's regime selector (distinct undirected
      // pairs; the orientation is a bijection on them) — recorded so the
      // JSON states where each point sits against the 4e8 auto-bound
      results += s"${scale}x_oriented_m" -> edges
        .selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
        .where(col("u") =!= col("v")).distinct().count()
      // optional regime-1 point (SPARK_GRAFT_R3_LITERAL=1): the
      // plan-literal Bloom form FORCED past the auto bound — after the
      // r16 retune the auto path selects the literal only at
      // m <= bloomLiteralMaxEdges = 2e6, under every synthesizable
      // probe scale (1x is already ~1.2M oriented), so the probe must
      // force the form explicitly to measure its cost curve (at 8x,
      // m = 9.57M, that is ~11.5 MB of per-task plan payload with
      // honest sketches; the r16 boundary probe's 'literal' points
      // after the retune had silently measured regime 2)
      if (sys.env.get("SPARK_GRAFT_R3_LITERAL").contains("1"))
        measure("literal", scale) {
          Triangles.perNodeLiteralBloomClosure(edges).count()
        }
      measure("bcastbloom", scale) {
        Triangles.perNodeBroadcastBloomClosure(edges).count()
      }
      measure("semijoin", scale) {
        Triangles.perNodeSemiJoinClosure(edges).count()
      }
    }

    // least-squares slope of log(min sec) on log(scale) — the measured
    // exponent (1.0 = linear weak scaling)
    for (q <- minSecs.keys.map(_._1).toSeq.distinct) {
      val pts = Scales.map(s => (math.log(s.toDouble), math.log(minSecs((q, s)))))
      val mx = pts.map(_._1).sum / pts.size
      val my = pts.map(_._2).sum / pts.size
      val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
        pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
      results += s"${q}_exponent" -> math.rint(slope * 100) / 100
      println(f"EXPONENT $q%-12s ${math.rint(slope * 100) / 100}%5.2f")
    }

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("REGIME3_JSON " + json)
    spark.stop()
  }
}
