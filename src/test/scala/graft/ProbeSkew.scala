package graft

import graft.transform.SkewJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe: measure the hot-key join ladder that SCALING.md and
  * `transform/SkewJoin.scala` describe but no round has measured —
  * "AQE's skew join splits oversized partitions; when a single key
  * exceeds a partition the classic fix is salting". q37 gates the
  * salted rewrite's CORRECTNESS (row-identical to the plain join); this
  * probe measures what each form actually COSTS under a planted
  * mega-key, so the engine's skew advice is a measurement, not folklore.
  *
  * Corpus: fact = 40M rows, 30% of them (12M) on ONE key — the
  * one-mega-customer shape — the rest uniform over 2M keys; dim = 2M
  * keys. Both shuffle-joined (auto-broadcast disabled at both the
  * static and AQE layer — at 100 TB neither side of a fact-dim join
  * this ratio broadcasts). Variants, min-of-2 each, interleaved:
  *
  *   - plain_skew_on:  plain inner join, AQE skew-split enabled with
  *     cluster-tuned thresholds (16 MB skew threshold / 8 MB advisory —
  *     the defaults' 256 MB floor never fires at probe scale; a real
  *     cluster tunes these to its partition budget).
  *   - plain_skew_off: the naive plan — the hot key's entire 12M-row
  *     frame sorts and joins in ONE task.
  *   - salted8/salted32: [[SkewJoin.innerSalted]] — the build side
  *     replicated R times, the probe side scattered by a deterministic
  *     hash of its full row, AQE skew-split left on (the forms compose).
  *
  * Every variant's aggregate output is checksummed and asserted
  * identical — a speed number for a wrong answer is worthless.
  *
  * Run: `sbt "Test/runMain graft.ProbeSkew"`; paste the JSON line into
  * `bench_records/r17_skew_probe.json`. Sizes env-tunable:
  * `SPARK_GRAFT_SKEW_FACT=40000000`, `SPARK_GRAFT_SKEW_DIM=2000000`,
  * `SPARK_GRAFT_SKEW_HOT_PCT=30`.
  */
object ProbeSkew {

  def main(args: Array[String]): Unit = {
    val nFact = sys.env.get("SPARK_GRAFT_SKEW_FACT").map(_.toLong).getOrElse(40000000L)
    val nDim = sys.env.get("SPARK_GRAFT_SKEW_DIM").map(_.toLong).getOrElse(2000000L)
    val hotPct = sys.env.get("SPARK_GRAFT_SKEW_HOT_PCT").map(_.toInt).getOrElse(30)

    val spark = graft.core.GraftSession.local("skew_probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    results += "fact_rows" -> nFact
    results += "dim_rows" -> nDim
    results += "hot_pct" -> hotPct

    // fact: `hotPct`% of ids land on key 0 (the mega-key), the rest
    // hash-uniform over the dim keyspace; v is a per-row payload so the
    // salted form's full-row salt actually scatters the hot key
    val fact = spark.range(0, nFact).select(
      when(pmod(col("id"), lit(100)) < hotPct, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(nDim))).as("k"),
      col("id").as("rid"),
      (col("id") % 1000).as("v"))
      .localCheckpoint(true)
    val dim = spark.range(0, nDim)
      .select(col("id").as("k"), (col("id") * 2 + 1).as("w"))
      .localCheckpoint(true)

    // the 100 TB posture: neither side broadcasts, at plan time or at
    // AQE re-plan time
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // let AQE's skew split actually fire at probe scale (its default
    // 256 MB threshold is a cluster-sized floor)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")

    def agg(joined: DataFrame): DataFrame =
      joined.agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("chk"))

    def run(df: => DataFrame): (Double, (Long, Long)) = {
      spark.sparkContext.setJobGroup("probe", "skew")
      val t0 = System.nanoTime()
      val row = agg(df).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      (math.rint(sec * 1000) / 1000, (row.getLong(0), row.getLong(1)))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "plain_skew_on" -> (() => fact.join(dim, "k")),
      "plain_skew_off" -> (() => fact.join(dim, "k")),
      "salted8" -> (() => SkewJoin.innerSalted(fact, dim, "k", saltBuckets = 8)),
      "salted32" -> (() => SkewJoin.innerSalted(fact, dim, "k", saltBuckets = 32)))

    var checksum: Option[(Long, Long)] = None
    val secs = scala.collection.mutable.Map.empty[String, List[Double]]
    // two interleaved passes so ambient drift hits every variant equally
    for (pass <- 1 to 2; (name, mk) <- variants) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        (name != "plain_skew_off").toString)
      val load = osBean.getSystemLoadAverage
      val (sec, chk) = run(mk())
      checksum match {
        case None => checksum = Some(chk)
        case Some(c) => assert(c == chk,
          s"$name returned $chk, expected $c — a rewrite changed the answer")
      }
      println(f"PROBE pass=$pass $name%-15s $sec%8.3f s load=$load%.2f chk=$chk")
      secs(name) = secs.getOrElse(name, Nil) :+ sec
      results += s"${name}_pass${pass}_load" -> (math.rint(load * 100) / 100)
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    for ((name, _) <- variants) {
      results += s"${name}_secs" -> secs(name).mkString("[", ",", "]")
      results += s"${name}_min_sec" -> secs(name).min
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
