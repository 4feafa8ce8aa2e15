package graft

/** Dev-only probe (r20): the noise floor of the bench calibration pair.
  *
  * `calib_cpu_sec`/`calib_scan_sec` (added to bench.json this round) are
  * the instrument future rounds read machine-generation drift from —
  * so the instrument's own jitter must be on record: a generation read
  * smaller than the calibration noise is not a read. Ten back-to-back
  * samples of each half under an otherwise idle session, plus the
  * min-of-3 the sweeps actually record.
  *
  * Run: `sbt "Test/runMain graft.ProbeCalibNoise"` (or java -cp with the
  * test classpath); writes `bench_records/r20_calibration_noise.json`.
  */
object ProbeCalibNoise {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("calibnoise", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Bench.calibScanWrite(spark, "target/calibnoise")
    // one throwaway of each so JIT compile / first-scan file listing is
    // excluded, as min-of-N excludes it in real sweeps
    Bench.calibCpu(); Bench.calibScan(spark, dir)
    val cpu = (1 to 10).map(_ => Bench.calibCpu())
    val scan = (1 to 10).map(_ => Bench.calibScan(spark, dir))
    def stats(xs: Seq[Double]): String = {
      val mn = xs.min; val mx = xs.max
      val mean = xs.sum / xs.size
      f"""{"samples": [${xs.map(x => f"$x%.4f").mkString(", ")}], "min": $mn%.4f, "max": $mx%.4f, "mean": $mean%.4f, "spread_pct": ${100 * (mx - mn) / mn}%.1f}"""
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val out =
      s"""{"probe": "ProbeCalibNoise (noise floor of the r20 bench calibration pair)",
         | "cpu": ${stats(cpu)},
         | "scan": ${stats(scan)},
         | "load": ${math.rint(load * 100) / 100},
         | "note": "FILL"}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_records/r20_calibration_noise.json"),
      out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
