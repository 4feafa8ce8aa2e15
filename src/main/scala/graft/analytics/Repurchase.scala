package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repurchase-within-window labeling — the reference's hardest query
  * (`src/main/java/com/retail/ml/ChurnPrediction.java:147-171`): join first
  * purchases to later purchases of the same (household, product), keep
  * `first_day < later_day <= first_day + W` (strict lower bound
  * `ChurnPrediction.java:152`, inclusive upper `:153`), then aggregate
  * `min(first_repurchase)` / `count(repurchases)` and label
  * `repurchased = n > 0` with `coalesce(..., 0)` defaults (`:191-192`).
  *
  * Re-expressed over the star schema: a "purchase" is (o_custkey,
  * l_partkey, day), first purchase per pair = min(day) — equivalent to the
  * reference's row_number()=1 on day ordering, but deterministic.
  *
  * Scale design (SURVEY §7 known hard part 1): the naive form is an
  * equi-join on (custkey, partkey) with a range post-filter — fan-out is
  * bounded by purchases-per-pair, which is fine when pairs are small but
  * explodes on skewed hot pairs. [[bandJoin]] is the 100 TB path: both
  * sides are bucketed into W-day bands, the join adds the band key
  * (first-purchase rows are duplicated into band b and b+1 — every later
  * day within W of `first_day` lands in one of those two bands), which
  * bounds per-key fan-out to two W-day buckets and lets AQE split what
  * remains. Identical output, verified against the same oracle.
  */
object Repurchase {

  /** (custkey, partkey, day) purchase events from orders x lineitem.
    * `day` is the 1-based int index of o_orderdate (Derive.epoch).
    */
  def purchases(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_custkey").as("custkey"),
        col("l_partkey").as("partkey"),
        graft.transform.Derive.dayIndex(col("o_orderdate")).as("day"))
      .distinct()

  private def firstPurchases(p: DataFrame): DataFrame =
    p.groupBy("custkey", "partkey").agg(min(col("day")).as("first_day"))

  private def labelFromPairs(fp: DataFrame, later: DataFrame, window: Int): DataFrame = {
    val joined = fp.join(
      later,
      fp("custkey") === later("l_custkey") && fp("partkey") === later("l_partkey") &&
        later("l_day") > fp("first_day") && later("l_day") <= fp("first_day") + window,
      "left")
    joined
      .groupBy(fp("custkey"), fp("partkey"), col("first_day"))
      .agg(
        coalesce(min(col("l_day")), lit(0)).as("first_repurchase_day"),
        count(col("l_day")).as("n_repurchases"))
      .withColumn("repurchased", when(col("n_repurchases") > 0, lit(1)).otherwise(lit(0)))
  }

  /** Naive range join (reference-shaped). W in days. [J4, J5, A7]
    *
    * `purchases` is deliberately NOT cached although both join sides read
    * it: for a one-shot query the cache is a pipeline barrier whose
    * materialization costs more than the recompute (measured 7.6s vs
    * 3.3s at sf0.1), and Catalyst's ReusedExchange dedupes the shuffle
    * anyway. Callers iterating on the result should cache it themselves.
    */
  def apply(orders: DataFrame, lineitem: DataFrame, window: Int = 30): DataFrame = {
    val p = purchases(orders, lineitem)
    val later = p.select(
      col("custkey").as("l_custkey"), col("partkey").as("l_partkey"), col("day").as("l_day"))
    labelFromPairs(firstPurchases(p), later, window)
  }

  /** Band-join rewrite: equi-join includes a W-sized day bucket, bounding
    * per-key fan-out at scale. Same output as [[apply]].
    */
  def bandJoin(orders: DataFrame, lineitem: DataFrame, window: Int = 30): DataFrame = {
    val p = purchases(orders, lineitem)
    val fp = firstPurchases(p)
    // first purchases are duplicated into their own band and the next one:
    // any later day in (first_day, first_day + W] falls in band(first_day)
    // or band(first_day)+1 when bands are W wide.
    val fpBands = fp
      .withColumn("band", explode(array(
        floor(col("first_day") / window),
        floor(col("first_day") / window) + 1)))
    val later = p.select(
      col("custkey").as("l_custkey"), col("partkey").as("l_partkey"), col("day").as("l_day"),
      floor(col("day") / window).as("l_band"))
    val matched = fpBands
      .join(
        later,
        col("custkey") === col("l_custkey") && col("partkey") === col("l_partkey") &&
          col("band") === col("l_band") &&
          col("l_day") > col("first_day") && col("l_day") <= col("first_day") + window)
      .groupBy("custkey", "partkey", "first_day")
      .agg(min(col("l_day")).as("mrd"), count(col("l_day")).as("mn"))
    fp.join(matched, Seq("custkey", "partkey", "first_day"), "left")
      .select(
        col("custkey"), col("partkey"), col("first_day"),
        coalesce(col("mrd"), lit(0)).as("first_repurchase_day"),
        coalesce(col("mn"), lit(0L)).as("n_repurchases"),
        when(coalesce(col("mn"), lit(0L)) > 0, lit(1)).otherwise(lit(0)).as("repurchased"))
  }

  def oracle(window: Int): String =
    s"""WITH p AS (
       |  SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey,
       |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1 AS day
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |fp AS (SELECT custkey, partkey, min(day) AS first_day FROM p GROUP BY 1, 2)
       |SELECT fp.custkey, fp.partkey, fp.first_day,
       |  COALESCE(min(l.day), 0) AS first_repurchase_day,
       |  count(l.day) AS n_repurchases,
       |  CASE WHEN count(l.day) > 0 THEN 1 ELSE 0 END AS repurchased
       |FROM fp LEFT JOIN p l ON fp.custkey = l.custkey AND fp.partkey = l.partkey
       |  AND l.day > fp.first_day AND l.day <= fp.first_day + $window
       |GROUP BY fp.custkey, fp.partkey, fp.first_day""".stripMargin

  /** Cohort repurchase-rate table
    * (`src/main/java/com/retail/ml/ChurnPrediction.java:340-345`:
    * `groupBy(flag).agg(count(*), sum(label), expr("sum(label)/count(*)"))`).
    * Cohort flag: whether the first purchase happened in the first half of
    * the day range (stand-in for the reference's coupon flag). Rate is an
    * exact-int division done once in double — deterministic.
    */
  def cohortRates(labels: DataFrame, splitDay: Int): DataFrame =
    labels
      .withColumn("early_cohort", when(col("first_day") <= splitDay, lit(1)).otherwise(lit(0)))
      .groupBy("early_cohort")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("repurchased")).as("n_repurchases"),
        expr("CAST(sum(repurchased) AS DOUBLE) / count(*)").as("repurchase_rate"))
      .orderBy("early_cohort")

  def cohortOracle(window: Int, splitDay: Int): String =
    s"""WITH p AS (
       |  SELECT DISTINCT o_custkey AS custkey, l_partkey AS partkey,
       |    datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1 AS day
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |fp AS (SELECT custkey, partkey, min(day) AS first_day FROM p GROUP BY 1, 2),
       |lab AS (
       |  SELECT fp.custkey, fp.partkey, fp.first_day,
       |    CASE WHEN count(l.day) > 0 THEN 1 ELSE 0 END AS repurchased
       |  FROM fp LEFT JOIN p l ON fp.custkey = l.custkey AND fp.partkey = l.partkey
       |    AND l.day > fp.first_day AND l.day <= fp.first_day + $window
       |  GROUP BY fp.custkey, fp.partkey, fp.first_day)
       |SELECT CASE WHEN first_day <= $splitDay THEN 1 ELSE 0 END AS early_cohort,
       |  count(*) AS n_pairs, CAST(sum(repurchased) AS BIGINT) AS n_repurchases,
       |  CAST(sum(repurchased) AS DOUBLE) / count(*) AS repurchase_rate
       |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin
}
