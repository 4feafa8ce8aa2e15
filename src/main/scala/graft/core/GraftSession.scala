package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's session bootstrap
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:34-38`)
  * but pins the settings the reference leaves at defaults: UTC session
  * timezone (oracle parity), AQE on (runtime re-planning / skew joins at
  * scale), and shuffle partitions sized for the actual parallelism instead
  * of the default 200 — on a real cluster this would be set to ~2-3x total
  * executor cores, here it tracks local cores.
  */
object GraftSession {

  /** Local session for tests / benchmarks. `cores` controls both the
    * master thread count and `spark.sql.shuffle.partitions`.
    */
  def local(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // skew detection thresholds on COMPRESSED shuffle bytes, and a
      // hot KEY is maximally compressible (a run of identical values):
      // at the stock 256 MB threshold a mega-key partition at 16x the
      // median ROWS measured identical to skew-off (ProbeSkew,
      // bench_records/r17_skew_probe.json). Pin the threshold to the
      // advisory target so a skewed partition splits as soon as it is
      // both over the advisory chunk size and 5x the median - inert on
      // uniform workloads (the 5x median factor still gates), active
      // exactly under real skew.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
