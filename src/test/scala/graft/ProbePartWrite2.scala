package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop probe #2: the two I/O knobs for the 358-directory
  * partitioned write/read — file-output-committer algorithm v2 (task-
  * commit renames in parallel instead of the driver's sequential job
  * commit) and driver-side partition discovery (a 358-task Spark listing
  * job vs a local-FS stat sweep).
  */
object ProbePartWrite2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("probe-partwrite2")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val derived = graft.transform.Derive.pricing(
      graft.core.Catalog(spark, sf).lineitem)
      .select("l_orderkey", "l_linenumber", "net_price", "week_no")
    derived.count()

    val base = graft.core.Scratch.dir("probe_pw2")
    def timed(name: String, path: String)(write: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); write
        val w = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        spark.read.parquet(path).filter(col("week_no") === 52)
          .groupBy(col("week_no")).agg(count(lit(1))).count()
        val r = (System.nanoTime() - t1) / 1e9
        (w, r)
      }
      println(f"[probe] $name%-28s write min ${ts.map(_._1).min}%.2f s, readback min ${ts.map(_._2).min}%.2f s")
    }
    timed("v2+driver-list repart(key)", s"$base/a") {
      derived.repartition(col("week_no"))
        .write.mode("overwrite").partitionBy("week_no").parquet(s"$base/a")
    }
    // dynamic partition overwrite path (q40/q47 shape)
    timed("v2+driver-list dyn-overwrite", s"$base/d") {
      derived.repartition(col("week_no"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("week_no").parquet(s"$base/d")
    }
    spark.stop()
  }
}
