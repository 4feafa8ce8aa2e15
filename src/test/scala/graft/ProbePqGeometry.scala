package graft

import graft.functions.{PqCodes, PqDistanceTable}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev-only probe (r17 verdict item 2): the PQ kernel scans timed at the
  * industry-standard 8×256 codebook geometry (8-bit codes per subspace)
  * next to the 8×16 gate geometry the r17 A/B
  * (`bench_records/r17_pq_codegen_ab.json`) was recorded at.
  *
  * The kernel's generated code is constant-size in geometry by
  * construction, so the expectation is pure arithmetic scaling: 16× the
  * codes per subspace ⇒ ~16× the inner-loop work per row for both scans —
  * no compile cliff, no interpreted downgrade (PqExprSpec pins the 8×256
  * compile under `codegen.fallback=false`). The probe makes that
  * expectation a NUMBER: "verified only below its design point" was the
  * r17 lesson, and 8×16 was below this kernel's design point.
  *
  * Same measurement discipline as [[ProbePqEncodeAB]]: synthetic n×64-dim
  * float corpus (localCheckpointed, generation off the clock), each
  * variant a pure projection reduced task-side via `sum(xxhash64(out))`
  * accumulator, min-of-2, per-rep loadavg stamped. Codes checksums are
  * geometry-dependent (more codes ⇒ different argmins), so cross-geometry
  * checksums differ by design; within a geometry the two reps must agree.
  *
  * Run: `sbt "Test/runMain graft.ProbePqGeometry"`; paste the JSON line
  * into `bench_records/r18_pq_geometry.json`.
  * Size env-tunable: `SPARK_GRAFT_PQ_N=2000000`.
  */
object ProbePqGeometry {

  def main(args: Array[String]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_PQ_N").map(_.toLong).getOrElse(2000000L)
    val spark = graft.core.GraftSession.local("pq_geometry", 32)
    spark.sparkContext.setLogLevel("ERROR")
    // a silent interpreted downgrade would invalidate the measurement —
    // fail the probe instead (the r17 forest failed exactly this way)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    results += "n" -> n

    def codebook(nCodes: Int): Array[Array[Array[Float]]] =
      Array.tabulate(8, nCodes)((m, j) =>
        Array.tabulate(8)(i => (math.sin(m * 131 + j * 17 + i) / 2).toFloat))

    val vecs = spark.range(0, n).select(
      col("id").as("vec_id"),
      array((1 to 64).map(i => sin(col("id") * 31 + i).cast("float")): _*).as("embedding"))
      .localCheckpoint(true)

    def measure(name: String, out: Column): Long = {
      var chk = 0L
      val secs = (1 to 2).map { _ =>
        val acc = spark.sparkContext.longAccumulator(name)
        val load = osBean.getSystemLoadAverage
        val t0 = System.nanoTime()
        vecs.select(xxhash64(out).as("h")).queryExecution.toRdd
          .foreach(r => acc.add(r.getLong(0)))
        val sec = (System.nanoTime() - t0) / 1e9
        if (chk != 0L) assert(acc.value == chk, s"$name: rep checksums diverged")
        chk = acc.value
        results += s"${name}_load" -> (math.rint(load * 100) / 100)
        math.rint(sec * 1000) / 1000
      }
      println(f"PROBE $name%-16s ${secs.mkString("/")} s chk=$chk")
      results += s"${name}_secs" -> secs.mkString("[", ",", "]")
      results += s"${name}_min_sec" -> secs.min
      results += s"${name}_checksum" -> chk
      chk
    }

    Seq(16, 256).foreach { nCodes =>
      val cb = codebook(nCodes)
      measure(s"codes_8x$nCodes", PqCodes.of(col("embedding"), cb))
      measure(s"dtab_8x$nCodes", PqDistanceTable.of(col("embedding"), cb))
    }

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("PQ_GEOMETRY_JSON " + json)
    spark.stop()
  }
}
