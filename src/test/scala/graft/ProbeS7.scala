package graft

import graft.core.Catalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off IVF-PQ recall probe (dev tool, not a test). */
object ProbeS7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Catalog(spark, sf).embeddings.cache()
      val q = e.filter(col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      val got = pairs(graft.ext.AnnPq.ivfPqTopK(e, q, 5,
        graft.ext.AnnIvf.fixedCentroids(e, 16), graft.ext.AnnPq.fixedCodebooks(e)))
      val want = pairs(graft.queries.ExtensionQueries.bruteTopK(e, q, 5))
      println(s"IVFPQ_RECALL $sf = ${got.intersect(want).size.toDouble / want.size}")
      e.unpersist()
    }
  }
}
