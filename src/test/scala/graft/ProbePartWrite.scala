package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.functions._

/** Dev-loop probe: file-count and wall-clock of the partitioned-parquet
  * write behind q21/q40/q47, under the current repartition(key) form vs
  * explicit-partition-count variants.
  */
object ProbePartWrite {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-partwrite", 32)
    spark.sparkContext.setLogLevel("WARN")
    val derived = graft.transform.Derive.pricing(Catalog(spark, sf).lineitem)
      .select("l_orderkey", "l_linenumber", "net_price", "week_no")
    derived.count()

    def files(path: String): (Int, Int) = {
      val dir = new java.io.File(path)
      val dirs = Option(dir.listFiles()).getOrElse(Array.empty).count(_.isDirectory)
      def all(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(all).sum
        else 1
      (dirs, all(dir))
    }

    def timed(name: String, path: String)(write: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); write
        val w = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n = spark.read.parquet(path).filter(col("week_no") === 52)
          .groupBy(col("week_no")).agg(count(lit(1))).count()
        val r = (System.nanoTime() - t1) / 1e9
        (w, r, n)
      }
      val (dirs, total) = files(path)
      println(f"[probe] $name%-28s write min ${ts.map(_._1).min}%.2f s, readback min ${ts.map(_._2).min}%.2f s, dirs=$dirs files=$total")
    }

    val base = graft.core.Scratch.dir("probe_pw")
    timed("repartition(key)", s"$base/a") {
      derived.repartition(col("week_no"))
        .write.mode("overwrite").partitionBy("week_no").parquet(s"$base/a")
    }
    timed("repartition(53,key)", s"$base/b") {
      derived.repartition(53, col("week_no"))
        .write.mode("overwrite").partitionBy("week_no").parquet(s"$base/b")
    }
    timed("no repartition", s"$base/c") {
      derived.write.mode("overwrite").partitionBy("week_no").parquet(s"$base/c")
    }
    spark.stop()
  }
}
