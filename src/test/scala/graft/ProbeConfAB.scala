package graft

import graft.core.GraftSession

/** Dev-loop probe: same-session A/B of a SQL conf over registry queries.
  *
  * Usage: Test/runMain graft.ProbeConfAB <confKey> <offVal> <onVal> <q1,q2,...> [sfDir] [cores]
  * Runs each query min-of-2 per conf value, interleaved (off,on,off,on),
  * after one warm run — ambient drift hits both arms equally.
  */
object ProbeConfAB {
  def main(args: Array[String]): Unit = {
    val key = args(0); val off = args(1); val on = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 4) args(4) else "/root/testdata/sf0.1"
    val cores = if (args.length > 5) args(5).toInt else 32
    val spark = GraftSession.local("probe-confab", cores)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sf).count() // warm
      def one(v: String): Double = {
        spark.conf.set(key, v)
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); fn(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      val runs = (1 to 2).map(_ => (one(off), one(on)))
      spark.conf.set(key, off)
      val a = runs.map(_._1).min; val b = runs.map(_._2).min
      println(f"[probe] $n%-28s off ${a}%6.2f s  on ${b}%6.2f s  ratio ${b / a}%.2f")
    }
    spark.stop()
  }
}
