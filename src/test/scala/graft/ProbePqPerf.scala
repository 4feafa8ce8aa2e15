package graft

import graft.core.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** One-off PQ stage-cost probe (dev tool, not a test). */
object ProbePqPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Catalog(spark, "/root/testdata/sf0.1").embeddings
    val q = e.filter(col("vec_id") < 10)
    val cb = graft.ext.AnnPq.fixedCodebooks(e)
    import graft.ext.{AnnPq, VectorOps}
    def time[T](label: String)(f: => T): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime(); f
        println(f"$label rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val enc = AnnPq.encode(e, cb)
      .select(col("vec_id").as("cid"), col("codes"), col("embedding").as("cv"), col("nrm").as("cn"))
    val qd = q.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      sqrt(VectorOps.dotQ(col("embedding"), col("embedding")).cast(DoubleType)).as("qn"),
      array(cb.indices.map(m =>
        array(cb(m).indices.map(j => {
          def quantL(x: Float): Long = math.floor(x.toDouble * graft.functions.QuantizedDot.Grid).toLong
          val c2 = cb(m)(j).map(x => quantL(x) * quantL(x)).sum
          lit(c2) - lit(2L) * VectorOps.dotQ(slice(col("embedding"), m * 8 + 1, 8), typedLit(cb(m)(j)))
        }): _*)): _*).as("dtab"))
    val joined = enc.crossJoin(broadcast(qd)).filter(col("qid") =!= col("cid"))
    time("join only")(joined.count())
    val scored = joined.withColumn("adc", expr(
      "aggregate(sequence(0, 7), 0L, (acc, m) -> acc + dtab[m][codes[m]])"))
    time("join+adc")(scored.select(max(col("adc"))).count())
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").asc, col("cid").asc)
    val short = scored.withColumn("adc_rank", row_number().over(wAdc)).filter(col("adc_rank") <= 50)
    time("..+shortlist")(short.count())
    time("full")(AnnPq.topK(e, q, 5, cb).count())
  }
}
