package graft

import graft.core.{Catalog, GraftSession}
import graft.ml.AlsTwin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-loop probe (r21): phase attribution inside AlsTwin.recommend —
  * the ProbeJobs view shows ~1.4 s of driver gaps; this splits them into
  * ratings collect / driver fit / factor-frame construction / scoring,
  * and A/Bs the factor frames as plan-embedded LocalRelations (current)
  * vs RDD-backed frames (rows off the plan).
  *
  * Usage: Test/runMain graft.ProbeAlsPhases [runs] [sfDir]
  */
object ProbeAlsPhases {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("probe-als-phases", 32)
    spark.sparkContext.setLogLevel("WARN")
    val c = Catalog(spark, sf)

    def one(arm: String): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val rat = AlsTwin.ratingsInt(c.orders, c.lineitem).cache()
      val fitRows = rat.orderBy(col("custkey"), col("partkey")).limit(AlsTwin.maxFitRows)
        .collect().map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2)))
      val t1 = System.nanoTime()
      val (uf, itf) = AlsTwin.fit(fitRows)
      val t2 = System.nanoTime()
      val (ufDf, ifDf) = arm match {
        case "local" =>
          (spark.createDataFrame(uf.toIndexedSeq).toDF("custkey", "x1", "x2"),
            spark.createDataFrame(itf.toIndexedSeq).toDF("partkey", "y1", "y2"))
        case "rdd" =>
          (spark.createDataFrame(spark.sparkContext.parallelize(uf.toIndexedSeq, 1))
            .toDF("custkey", "x1", "x2"),
            spark.createDataFrame(spark.sparkContext.parallelize(itf.toIndexedSeq, 1))
              .toDF("partkey", "y1", "y2"))
      }
      val t3 = System.nanoTime()
      val scored = rat
        .join(broadcast(ufDf), Seq("custkey"))
        .join(broadcast(ifDf), Seq("partkey"))
        .withColumn("pred", col("x1") * col("y1") + col("x2") * col("y2"))
      val w = Window.partitionBy(col("custkey"))
        .orderBy(col("pred").desc, col("partkey").asc)
      val res = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= AlsTwin.TopN)
        .select(col("custkey"), col("partkey"), col("pred"), col("rn"))
        .localCheckpoint(true)
      val t4 = System.nanoTime()
      val n = res.orderBy(col("custkey"), col("partkey")).count()
      val t5 = System.nanoTime()
      rat.unpersist()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
      println(s"[probe] $arm n=$n uf=${uf.length} if=${itf.length} " +
        s"total=${s(t0, t5)} collect=${s(t0, t1)} fit=${s(t1, t2)} " +
        s"frames=${s(t2, t3)} score+ckpt=${s(t3, t4)} count=${s(t4, t5)}")
    }
    one("local") // warm
    for (_ <- 1 to runs) { one("local"); one("rdd") }
    spark.stop()
  }
}
