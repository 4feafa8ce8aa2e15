package graft

import graft.transform.SkewJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe: measure the hot-key join ladder that SCALING.md and
  * `transform/SkewJoin.scala` describe but no round had measured — and
  * pin down WHEN each defense actually engages.
  *
  * The probe's headline finding (see `r17_skew_probe.json`): **AQE's
  * skew-join detection thresholds on COMPRESSED shuffle bytes
  * (`skewedPartitionThresholdInBytes`), and a hot KEY is exactly the
  * most compressible data there is** — a mega-key partition is a run of
  * identical key values, so a partition carrying 13× the median ROWS
  * can sit under the byte threshold and never split (measured here: a
  * 20M-row hot partition compresses to ~51 MB against the 256 MB
  * default — 13× the rows, invisible to the default detector; the
  * first probe cut at a 16 MB threshold saw ZERO splits at 6M hot
  * rows for the same reason). At 100 TB the motivating skew case — a
  * boilerplate duplicate document, one mega-customer — is exactly this
  * shape. The engine's deterministic salting
  * ([[SkewJoin.innerSalted]]) is row-oriented and engages regardless,
  * which is the measured justification for carrying it alongside AQE.
  *
  * Corpus: fact = 40M rows, `hotPct`% on ONE key, rest uniform over 2M
  * keys; dim = 2M keys. Both shuffle-joined (auto-broadcast disabled
  * both statically and at AQE re-plan — the 100 TB fact-dim posture).
  * Variants, interleaved across passes:
  *
  *   - aqe_default: AQE skew-split at DEFAULT thresholds (256 MB/5×) —
  *     expected NOT to fire on a compressible mega-key (the evasion).
  *   - aqe_tuned: thresholds the hot partition's compressed bytes can
  *     actually cross (1 MB/2×, advisory 4 MB) — the split fires
  *     (`SortMergeJoin(skew=true)`, skewSplits in telemetry).
  *   - skew_off: the naive plan — the hot key joins in ONE task
  *     (maxTaskMs in the telemetry is the straggler).
  *   - salted8: [[SkewJoin.innerSalted]] at default AQE thresholds —
  *     the row-oriented defense, costing a dim replication (visible as
  *     ~2× shuffle bytes) to cut the straggler 8×.
  *
  * Per-variant telemetry (a straggler is invisible to wall clock under
  * ambient noise): per-stage task counts, CPU seconds, shuffle bytes,
  * and MAX task duration; every variant's aggregate output is
  * checksummed and asserted identical.
  *
  * Run: `sbt "Test/runMain graft.ProbeSkew"`; paste the JSON line into
  * `bench_records/r17_skew_probe.json`. Env-tunable:
  * `SPARK_GRAFT_SKEW_FACT=40000000`, `SPARK_GRAFT_SKEW_DIM=2000000`,
  * `SPARK_GRAFT_SKEW_HOT_PCT=50`.
  */
object ProbeSkew {

  def main(args: Array[String]): Unit = {
    val nFact = sys.env.get("SPARK_GRAFT_SKEW_FACT").map(_.toLong).getOrElse(40000000L)
    val nDim = sys.env.get("SPARK_GRAFT_SKEW_DIM").map(_.toLong).getOrElse(2000000L)
    val hotPct = sys.env.get("SPARK_GRAFT_SKEW_HOT_PCT").map(_.toInt).getOrElse(50)

    val spark = graft.core.GraftSession.local("skew_probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    results += "fact_rows" -> nFact
    results += "dim_rows" -> nDim
    results += "hot_pct" -> hotPct

    val fact = spark.range(0, nFact).select(
      when(pmod(col("id"), lit(100)) < hotPct, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nDim))).as("k"),
      (col("id") % 1000).as("v"))
      .localCheckpoint(true)
    val dim = spark.range(0, nDim)
      .select(col("id").as("k"), (col("id") * 2 + 1).as("w"))
      .localCheckpoint(true)

    // the 100 TB posture: neither side broadcasts, at plan time or at
    // AQE re-plan time
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val defaultConf = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")
    val tunedConf = defaultConf ++ Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m")
    val offConf = defaultConf + ("spark.sql.adaptive.skewJoin.enabled" -> "false")

    def agg(joined: DataFrame): DataFrame =
      joined.agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("chk"))

    // per-stage telemetry: task counts, CPU, shuffle write, and the MAX
    // task duration (the straggler metric wall clock hides under noise)
    case class StageRec(tasks: Int, runMs: Long, shuffleWrite: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          stages.add(StageRec(sc.stageInfo.numTasks, m.executorRunTime,
            m.shuffleWriteMetrics.bytesWritten))
        }
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          var cur = maxTaskMs.get()
          while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
        }
      })

    def run(df: => DataFrame): (Double, (Long, Long), String) = {
      import scala.jdk.CollectionConverters._
      stages.clear(); maxTaskMs.set(0)
      spark.sparkContext.setJobGroup("probe", "skew")
      val adf = agg(df)
      val t0 = System.nanoTime()
      val row = adf.collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      val ss = stages.asScala.toSeq
      val plan = adf.queryExecution.executedPlan.toString
      val splits = if (plan.contains("skew=true"))
        s" skewSplits=${"AQEShuffleRead skewed".r.findAllIn(plan).size}" else ""
      val tel = f"tasks=${ss.map(_.tasks).sum}%d " +
        f"cpuSec=${ss.map(_.runMs).sum / 1000.0}%.1f " +
        f"shuffleGB=${ss.map(_.shuffleWrite).sum / 1e9}%.2f " +
        f"maxTaskSec=${maxTaskMs.get() / 1000.0}%.1f$splits"
      (math.rint(sec * 1000) / 1000, (row.getLong(0), row.getLong(1)), tel)
    }

    val variants: Seq[(String, Map[String, String], () => DataFrame)] = Seq(
      ("aqe_default", defaultConf, () => fact.join(dim, "k")),
      ("aqe_tuned", tunedConf, () => fact.join(dim, "k")),
      ("skew_off", offConf, () => fact.join(dim, "k")),
      ("salted8", defaultConf, () => SkewJoin.innerSalted(fact, dim, "k", saltBuckets = 8)))

    var checksum: Option[(Long, Long)] = None
    val secs = scala.collection.mutable.Map.empty[String, List[Double]]
    val maxTasks = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to 2; (name, conf, mk) <- variants) {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      System.gc()
      val load = osBean.getSystemLoadAverage
      val (sec, chk, tel) = run(mk())
      checksum match {
        case None => checksum = Some(chk)
        case Some(c) => assert(c == chk,
          s"$name returned $chk, expected $c — a rewrite changed the answer")
      }
      println(f"PROBE pass=$pass $name%-12s $sec%8.3f s load=$load%.2f $tel chk=$chk")
      secs(name) = secs.getOrElse(name, Nil) :+ sec
      maxTasks(name) = maxTasks.getOrElse(name, Nil) :+
        ("maxTaskSec=([0-9.]+)".r.findFirstMatchIn(tel).map(_.group(1).toDouble).getOrElse(0.0))
      results += s"${name}_pass${pass}_load" -> (math.rint(load * 100) / 100)
      results += s"${name}_pass${pass}_telemetry" -> tel
    }
    defaultConf.foreach { case (k, v) => spark.conf.set(k, v) }

    for ((name, _, _) <- variants) {
      results += s"${name}_secs" -> secs(name).mkString("[", ",", "]")
      results += s"${name}_min_sec" -> secs(name).min
      results += s"${name}_min_max_task_sec" -> maxTasks(name).min
    }
    results += "checksum_n" -> checksum.get._1
    results += "checksum_sum" -> checksum.get._2

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("SKEW_PROBE_JSON " + json)
    spark.stop()
  }
}
