package graft

import graft.core.Catalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off PQ recall probe (dev tool, not a test). */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Catalog(spark, sf).embeddings.cache()
      val q = e.filter(col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      val got = pairs(graft.ext.AnnPq.topK(e, q, 5, graft.ext.AnnPq.fixedCodebooks(e)))
      val want = pairs(graft.queries.ExtensionQueries.bruteTopK(e, q, 5))
      println(s"PQRECALL $sf = ${got.intersect(want).size.toDouble / want.size}")
      e.unpersist()
    }
  }
}
