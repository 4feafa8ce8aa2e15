package graft

import graft.functions.{IvfNearestCell, IvfTopCells, QuantizedDot}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev-only probe (r18): the IVF kernels timed at true production
  * geometry next to the gate geometry — completing the ANN geometry
  * story `r18_pq_geometry.json` started for PQ.
  *
  * The IVF contract says nCells ≈ √n, so a 1M-vector corpus at
  * production embedding width runs the assign scan at ~1024 cells ×
  * 768 dims — 48× the cells and 12× the dims of the 64-cell/64-dim
  * band the gates exercise. The kernel's generated code is constant
  * size in both axes (compile pinned by IvfExprSpec at 512 cells and at
  * 768 dims); this probe makes the COST at the full production corner a
  * number instead of an extrapolation: the assign scan is
  * O(n · nCells · dims) arithmetic, and the r18 exact overflow guard is
  * what admits the 768-dim normalized table at all.
  *
  * Same discipline as [[ProbePqGeometry]]: synthetic float corpus
  * (localCheckpointed, generation off the clock), pure projection
  * reduced task-side via `sum(xxhash64(out))`, min-of-2, per-rep
  * loadavg, `codegen.fallback=false` so a silent interpreted downgrade
  * fails the probe. n scales down with geometry so each point stays
  * minutes-bounded; per-row cost is the honest unit across points.
  *
  * Run: `sbt "Test/runMain graft.ProbeIvfGeometry"`; paste the JSON
  * line into `bench_records/r18_ivf_geometry.json`.
  */
object ProbeIvfGeometry {

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("ivf_geometry", 32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]

    // (tag, corpus rows, cells, dims)
    val points = Seq(
      ("gate_64c_64d", 2000000L, 64, 64),
      ("prod_1024c_768d", 250000L, 1024, 768))

    for ((tag, n, nCells, dims) <- points) {
      val centsQ = Array.tabulate(nCells)(c =>
        Array.tabulate(dims)(i => QuantizedDot.quantize(math.sin(c * 31 + i) / 2)))
      // transform-over-sequence, NOT array(sin...× dims): the latter is
      // itself a dims-wide expression forest and blows the 64 KB method
      // cap at 768 dims — the r17 geometry lesson applies to probe
      // harness code too (this probe's first cut failed exactly there)
      val vecs = spark.range(0, n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dims)),
          i => sin(col("id") * 31 + i).cast("float")).as("embedding"))
        .localCheckpoint(true)

      def measure(name: String, out: Column): Unit = {
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
        println(f"PROBE $name%-28s ${secs.mkString("/")} s chk=$chk")
        results += s"${name}_secs" -> secs.mkString("[", ",", "]")
        results += s"${name}_min_sec" -> secs.min
        results += s"${name}_us_per_row" -> (math.rint(secs.min / n * 1e9) / 1000.0)
        results += s"${name}_checksum" -> chk
      }

      results += s"${tag}_n" -> n
      measure(s"assign_$tag", IvfNearestCell.of(col("embedding"), centsQ))
      measure(s"probe4_$tag", IvfTopCells.of(col("embedding"), centsQ, 4))
      vecs.unpersist()
    }

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("IVF_GEOMETRY_JSON " + json)
    spark.stop()
  }
}
