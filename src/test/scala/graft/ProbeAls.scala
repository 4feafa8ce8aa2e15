package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only probe for ALS holdout eval variants (not part of the suite). */
object ProbeAls {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local("alsprobe", 8)
    s.sparkContext.setLogLevel("WARN")
    val c = graft.core.Catalog(s, "/root/testdata/sf0.001")
    val r = graft.ml.Recommender.ratings(c.orders, c.lineitem)
    val bucket = pmod(conv(substring(md5(concat_ws(":", col("user"), col("item")).cast("binary")), 1, 12), 16, 10).cast("long"), lit(100L))
    val wb = r.withColumn("bucket", bucket).cache()
    val train = wb.filter(col("bucket") < 80).drop("bucket")
    val test = wb.filter(col("bucket") >= 80).drop("bucket")
    val nItems = r.select("item").distinct().count()
    println("ITEMS=" + nItems + " train=" + train.count() + " test=" + test.count())
    val als = new org.apache.spark.ml.recommendation.ALS().setMaxIter(10).setRegParam(0.1)
      .setImplicitPrefs(true).setColdStartStrategy("drop").setSeed(42L)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
    val model = als.fit(train)
    val maxTrain = train.groupBy("user").count().agg(max("count")).head().getLong(0).toInt
    println("MAXTRAIN=" + maxTrain)
    val k = 5 + maxTrain
    val recs = model.recommendForAllUsers(k)
      .select(col("user"), explode(col("recommendations")).as("rec"))
      .select(col("user"), col("rec.item").as("item"), col("rec.rating").as("score"))
    val unseen = recs.join(train.select("user", "item"), Seq("user", "item"), "left_anti")
    val w = Window.partitionBy("user").orderBy(col("score").desc, col("item").asc)
    val top = unseen.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    val hits = test.join(top, Seq("user", "item"), "left_semi").count()
    val total = test.count()
    println("FILTERED_HITRATE=" + hits.toDouble / total)
    val tc = train.groupBy("user").agg(count(lit(1)).as("n_train"))
    val base = test.groupBy("user").agg(count(lit(1)).as("n_test"))
      .join(tc, Seq("user"), "left").na.fill(0, Seq("n_train"))
      .select(
        sum(col("n_test") * lit(5.0) / (lit(nItems) - col("n_train"))).as("num"),
        sum(col("n_test")).as("den")).head()
    println("UNSEEN_BASELINE=" + base.getDouble(0) / base.getLong(1))
    // train-reconstruction: precision@5 of RAW top-5 vs train pairs —
    // does the optimizer actually fit the interactions it saw?
    val raw5 = model.recommendForAllUsers(5)
      .select(col("user"), explode(col("recommendations.item")).as("item"))
    val trainHits = raw5.join(train.select(col("user"), col("item")), Seq("user", "item"), "left_semi").count()
    val nRaw = raw5.count()
    println("TRAIN_PRECISION_AT_5=" + trainHits.toDouble / nRaw)
    val avgTrainPerUser = train.groupBy("user").count().agg(avg(col("count"))).head().getDouble(0)
    println("TRAIN_PRECISION_RANDOM=" + avgTrainPerUser / nItems)
    s.stop()
  }
}
