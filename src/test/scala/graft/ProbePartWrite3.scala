package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.functions._

/** Dev-loop probe #3: same-session A/B of (a) file-output-committer v1
  * vs v2 on the 358-directory partitioned write, (b) Spark-job vs
  * driver-side partition discovery on the read-back. Both knobs toggle
  * at runtime (hadoopConfiguration is read at job setup; the discovery
  * threshold is a SQL conf).
  */
object ProbePartWrite3 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-pw3", 32)
    spark.sparkContext.setLogLevel("WARN")
    val derived = graft.transform.Derive.pricing(Catalog(spark, sf).lineitem)
      .select("l_orderkey", "l_linenumber", "net_price", "week_no")
    derived.count()
    val base = graft.core.Scratch.dir("probe_pw3")
    val hc = spark.sparkContext.hadoopConfiguration

    def wr(path: String): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      derived.repartition(col("week_no"))
        .write.mode("overwrite").partitionBy("week_no").parquet(path)
      (System.nanoTime() - t0) / 1e9
    }
    def rd(path: String): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      spark.read.parquet(path).filter(col("week_no") === 52)
        .groupBy(col("week_no")).agg(count(lit(1))).count()
      (System.nanoTime() - t0) / 1e9
    }
    // interleave v1/v2 writes, 3 each
    for (i <- 1 to 3) {
      hc.set("mapreduce.fileoutputcommitter.algorithm.version", "1")
      val v1 = wr(s"$base/v1")
      hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
      val v2 = wr(s"$base/v2")
      println(f"[probe] write round $i: v1 $v1%.2f s, v2 $v2%.2f s")
    }
    for (i <- 1 to 3) {
      spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
      val job = rd(s"$base/v2")
      spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      val drv = rd(s"$base/v2")
      println(f"[probe] read round $i: job-list $job%.2f s, driver-list $drv%.2f s")
    }
    spark.stop()
  }
}
