package graft.ml

import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS implicit-feedback recommender.
  *
  * Mirrors `scripts/product-recommendation/ProductRecommendation.java:49-69`:
  * ratings = `groupBy(user, item).agg(sum(value))` [A10], ALS maxIter=10,
  * regParam=0.1, implicitPrefs=true, coldStartStrategy=drop [M11], then
  * `recommendForAllUsers(5)` exploded to (user, item, rating) rows [F5].
  */
object Recommender {

  def ratings(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
      .agg(sum(col("l_quantity")).cast("float").as("rating"))

  def topN(orders: DataFrame, lineitem: DataFrame, n: Int = 5, seed: Long = 42L): DataFrame = {
    val als = new ALS()
      .setMaxIter(10).setRegParam(0.1).setImplicitPrefs(true)
      .setColdStartStrategy("drop").setSeed(seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
    val model = als.fit(ratings(orders, lineitem))
    model.recommendForAllUsers(n)
      .select(col("user"), explode(col("recommendations")).as("rec"))
      .select(col("user"), col("rec.item").as("item"), col("rec.rating").as("score"))
  }
}
