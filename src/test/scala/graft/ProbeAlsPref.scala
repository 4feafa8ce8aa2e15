package graft

/** Dev-only probe: ALS holdout metrics on the preference-derived rating
  * matrix ([[graft.ml.Recommender.preferenceRatings]]) — run before
  * setting the MlSpec band so the asserted bound derives from a
  * measurement, not a guess. `sbt "Test/runMain graft.ProbeAlsPref"`.
  */
object ProbeAlsPref {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local("alsprefprobe", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val c = graft.core.Catalog(spark, sfDir)
    val pr = graft.ml.Recommender
      .preferenceRatings(c.orders, c.lineitem, c.customer, c.part).cache()
    println("MATRIX rows=" + pr.count())
    println("USERS=" + pr.select("user").distinct().count() +
      " ITEMS=" + pr.select("item").distinct().count())
    val hr = graft.ml.Recommender.holdoutFilteredHitRateOf(pr, 5)
    val base = graft.ml.Recommender.randomHitRateBaselineOf(pr, 5)
    println(f"FILTERED_HITRATE=$hr%.4f BASELINE=$base%.4f LIFT=${hr / base}%.2f")
    val (uhr, recon) = graft.ml.Recommender.holdoutMetricsOf(pr, 5)
    println(f"UNFILTERED=$uhr%.4f RECON_RATIO=$recon%.2f")
    spark.stop()
  }
}
