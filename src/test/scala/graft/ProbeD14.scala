package graft

import graft.core.{Catalog, GraftSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for d14 (containment join) — dev-loop
  * only, mirrors ContainmentJoin.pairs to localize cost.
  */
object ProbeD14 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("probe-d14", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Catalog(spark, sf).documents
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val g = docs.select(col("doc_id"),
        array_sort(array_distinct(
          graft.ext.TextStats.hashedWordGramsCol(col("text"), 3))).as("grams"))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .where(col("n_grams") > 0)
      .cache()
    timed("grams build+cache")(g.count())
    val posting = g.select(col("doc_id"), col("n_grams"), explode(col("grams")).as("gram"))
    println(s"[probe] posting rows: ${timed("posting count")(posting.count())}")
    val dfreq = posting.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    println(s"[probe] distinct grams: ${timed("dfreq count")(dfreq.count())}")
    val pfx = posting.join(dfreq, Seq("gram"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))))
      .where(col("rn") <= expr(s"n_grams * 20 DIV 100 + 1"))
      .select(col("doc_id").as("doc_a"), col("gram"))
    println(s"[probe] prefix rows: ${timed("pfx count")(pfx.count())}")
    val cand = pfx
      .join(posting.select(col("doc_id").as("doc_b"), col("gram")), Seq("gram"))
      .where(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    println(s"[probe] raw cand rows: ${timed("cand raw count")(cand.count())}")
    val candD = cand.distinct()
    println(s"[probe] distinct cand rows: ${timed("cand distinct count")(candD.count())}")
    val full = graft.ext.ContainmentJoin.pairs(docs, 3, 80)
    println(s"[probe] final rows: ${timed("full pipeline")(full.count())}")
    timed("full pipeline again")(graft.ext.ContainmentJoin.pairs(docs, 3, 80).count())
    spark.stop()
  }
}
