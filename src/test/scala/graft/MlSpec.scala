package graft

import graft.core.Catalog
import graft.ml._
import org.scalatest.funsuite.AnyFunSuite

/** ML smoke tests: deterministic fits with pinned seeds, metrics within
  * tolerance (SURVEY §5 point 5 — not bit-exact across Spark versions).
  */
class MlSpec extends AnyFunSuite with SharedSpark {

  test("segmentation auto-K picks K in range with valid silhouette") {
    val c = Catalog(spark, sf)
    val f = SegmentationPipeline.features(c.customer, c.orders)
    val best = SegmentationPipeline.fitAutoK(f, 2 to 4)
    assert(best.k >= 2 && best.k <= 4)
    assert(best.silhouette >= -1.0 && best.silhouette <= 1.0)
    assert(best.wssse >= 0.0)
  }

  test("churn RF trains and yields a sane AUC") {
    val c = Catalog(spark, sf)
    val r = ChurnPipeline.fitEvaluate(ChurnPipeline.examples(c.customer, c.orders, c.lineitem))
    assert(r.auc >= 0.0 && r.auc <= 1.0)
    assert(r.train > 0 && r.test > 0)
  }

  test("FP-Growth finds frequent itemsets with support bounds honored") {
    val c = Catalog(spark, sf)
    val fi = BasketItemsets.frequentItemsets(c.lineitem, minSupport = 0.002)
    val n = BasketItemsets.baskets(c.lineitem).count()
    val rows = fi.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("freq") >= (0.002 * n).floor.toLong))
  }

  test("ALS produces top-N recommendations per user") {
    val c = Catalog(spark, sf)
    val recs = Recommender.topN(c.orders, c.lineitem, 3)
    val perUser = recs.groupBy("user").count().collect()
    assert(perUser.nonEmpty && perUser.forall(_.getAs[Long]("count") <= 3))
  }
}
