package graft

import org.apache.spark.sql.functions._

/** Dev-only stage-timing probe for the s3 Lloyd-IVF path. */
object ProbeS3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("s3probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.core.Catalog(spark, d).embeddings
    println("n=" + e.count())
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("lloyd_fit")(graft.ext.AnnIvf.lloydCentroidsQ(e, 16, 3))
    t("query_full")(graft.ext.AnnIvf.topKLloyd(e, e.filter(col("vec_id") < 10), 5).count())
    t("lloyd_fit2")(graft.ext.AnnIvf.lloydCentroidsQ(e, 16, 3))
    val cq = t("lloyd_fit3")(graft.ext.AnnIvf.lloydCentroidsQ(e, 16, 3))
    t("kmeans_fit")(graft.ext.AnnIvf.centroids(e, 16))
    t("fixed_query")(graft.ext.AnnIvf.topKWith(
      e, e.filter(col("vec_id") < 10), 5, graft.ext.AnnIvf.fixedCentroids(e, 16)).count())
    spark.stop()
  }
}
