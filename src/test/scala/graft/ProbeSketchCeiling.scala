package graft

import graft.ext.Triangles
import org.apache.spark.sql.functions._

/** Dev-only probe for the r16 verdict's item 2: `Triangles.closureBloom`
  * is measured honest to 5·10⁷ keys (ClosureBloomSpec + the r16 probes),
  * but the regime-2 ceiling `bloomBroadcastMaxEdges` = 4·10⁸
  * (`ext/Triangles.scala`) ASSUMES honesty through 4·10⁸ — exactly the
  * class of silent sketch failure r16 caught at 5·10⁷ (Spark's
  * stat.bloomFilter saturating past its 64M-bit clamp). SCALING.md §4's
  * lesson is "verify built sketches empirically, never trust requested
  * params" — this probe applies it to the engine's own bound.
  *
  * Sketch-only (no graph, no closure): build the filter over synthetic
  * disjoint (src, dst) key ranges at n = 2·10⁸ and 4·10⁸ (the ceiling),
  * then record what the r16 fix made checkable — honest BIT SIZE
  * (optimal sizing ~9.585 bits/key at 1% FPP; a clamped/saturated build
  * fails this first), ZERO false negatives on an inserted sample, and
  * the MEASURED false-positive rate on a disjoint probe sample (the
  * "done" bar: FP ≤ ~1.5× the requested 1%; anything worse and the
  * ceiling must drop with the same honesty as the r16 retune). Build
  * wall-clock is recorded per run so the ~480 MB ceiling build's cost
  * is a measured number, not an estimate.
  *
  * The probe seam hashes with Catalyst's xxhash64 — sample hashes are
  * computed by the engine exactly as countUnd's UDF and literal probe
  * would compute them.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "Test/runMain graft.ProbeSketchCeiling"`;
  * paste the JSON line into `bench_records/r17_sketch_ceiling_probe.json`.
  * Sizes env-tunable: `SPARK_GRAFT_SKETCH_NS=200000000,400000000`.
  */
object ProbeSketchCeiling {

  private val Ns: Seq[Long] = sys.env.get("SPARK_GRAFT_SKETCH_NS")
    .map(_.split(",").map(_.trim.toLong).toSeq)
    .getOrElse(Seq(200000000L, 400000000L))

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("sketch_ceiling", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]

    for (n <- Ns) {
      // inserted keys (i, i + 10^10); probe keys live 2·10^10 away, a
      // disjoint range — same construction as ClosureBloomSpec, scaled
      val inserted = spark.range(0, n)
        .select(col("id").as("src"), (col("id") + 10000000000L).as("dst"))

      // min-of-2 build (the second run also proves the first's filter
      // was not a fluke of partial loss — both must measure honest)
      var bf: org.apache.spark.util.sketch.BloomFilter = null
      val buildSecs = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val load = osBean.getSystemLoadAverage
        val t0 = System.nanoTime()
        bf = Triangles.closureBloom(inserted, n)
        val sec = (System.nanoTime() - t0) / 1e9
        results += s"n${n}_load" -> (math.rint(load * 100) / 100)
        math.rint(sec * 1000) / 1000
      }

      val optimalBits = math.ceil(-n * math.log(0.01) /
        (math.log(2) * math.log(2))).toLong
      def hashes(df: org.apache.spark.sql.DataFrame): Array[Long] =
        df.select(expr("xxhash64(src, dst)")).collect().map(_.getLong(0))
      // 200k inserted keys spread across the full range: zero may probe absent
      val step = math.max(1L, n / 200000L)
      val insSample = hashes(inserted.where(col("id") % step === 0))
      val falseNeg = insSample.count(h => !bf.mightContainLong(h))
      // 400k disjoint keys: the measured FP rate
      val probeSample = hashes(spark.range(0, 400000L)
        .select((col("id") + 20000000000L).as("src"),
          (col("id") + 30000000000L).as("dst")))
      val fpRate = probeSample.count(bf.mightContainLong).toDouble / probeSample.length

      println(f"PROBE n=$n%d buildSecs=${buildSecs.mkString("/")} " +
        f"bits=${bf.bitSize()}%d optimal=$optimalBits%d " +
        f"falseNeg=$falseNeg%d/${insSample.length}%d fp=$fpRate%.5f")
      results += s"n${n}_build_secs" -> buildSecs.mkString("[", ",", "]")
      results += s"n${n}_bit_size" -> bf.bitSize()
      results += s"n${n}_optimal_bits" -> optimalBits
      results += s"n${n}_bits_per_key" -> (math.rint(bf.bitSize() * 100.0 / n) / 100)
      results += s"n${n}_false_negatives" -> falseNeg
      results += s"n${n}_inserted_sample" -> insSample.length
      results += s"n${n}_probe_sample" -> probeSample.length
      results += s"n${n}_fp_rate" -> (math.rint(fpRate * 100000) / 100000.0)
      bf = null; System.gc()
    }

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("SKETCH_CEILING_JSON " + json)
    spark.stop()
  }
}
