package graft.ml

import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over order baskets.
  *
  * Replaces the reference's RDD-based mllib FP-Growth
  * (`scripts/basket-analysis/MarketBasketAnalysis.java:125-183`: Row ->
  * JavaPairRDD -> groupByKey -> mllib FPGrowth [R1-R5, M13]) with the
  * DataFrame-native `ml.fpm.FPGrowth`: baskets are built with
  * `groupBy(order).agg(collect_set(item))` — staying inside Catalyst
  * keeps codegen + AQE, which the reference's `javaRDD()` detour forfeits
  * (SURVEY §2.9).
  */
object BasketItemsets {

  def baskets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey").cast("string")).as("items"))

  /** Frequent itemsets; output canonicalized (sorted items joined by ',')
    * and deterministically ordered.
    */
  def frequentItemsets(lineitem: DataFrame, minSupport: Double = 0.002): DataFrame = {
    val fp = new FPGrowth().setItemsCol("items")
      .setMinSupport(minSupport).setMinConfidence(0.1)
    val model = fp.fit(baskets(lineitem).cache())
    model.freqItemsets
      .select(array_join(sort_array(col("items")), ",").as("itemset"), col("freq"))
      .orderBy(col("freq").desc, col("itemset").asc)
  }
}
