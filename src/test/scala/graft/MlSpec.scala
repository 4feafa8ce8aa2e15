package graft

import graft.core.Catalog
import graft.ml._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** ML quality gates: deterministic fits with pinned seeds, metrics within
  * tolerance bands (SURVEY §5 point 5 — deterministic per Spark version,
  * not bit-exact across versions). Band centers were measured at sf0.001
  * with the pinned seeds (silhouette 0.494, AUC 0.741, 635 itemsets); the
  * bands catch a silent model break — feature drift, a lost seed, a
  * changed default — while tolerating library-version variance. The
  * collected metrics are emitted as MODEL_METRICS.json (per-round
  * artifact) by the last test.
  */
class MlSpec extends AnyFunSuite with SharedSpark {

  private val collected = scala.collection.mutable.Map[String, Double]()

  test("segmentation auto-K picks K=4 with silhouette in band") {
    val c = Catalog(spark, sf)
    val f = SegmentationPipeline.features(c.customer, c.orders)
    val best = SegmentationPipeline.fitAutoK(f, 2 to 4)
    collected ++= Map(
      "seg_k" -> best.k.toDouble,
      "seg_silhouette" -> best.silhouette,
      "seg_wssse" -> best.wssse)
    assert(best.k == 4, s"auto-K drifted: k=${best.k} (measured 4)")
    assert(best.silhouette > 0.44 && best.silhouette < 0.55,
      s"silhouette ${best.silhouette} outside [0.44, 0.55] (measured 0.494)")
    assert(best.wssse > 0.0)
  }

  test("Lloyd segmentation twin: k live clusters, deterministic, tiny corpus seeds fewer") {
    val c = Catalog(spark, sf)
    val a = SegmentationLloyd.segments(c.customer, c.orders).collect()
    val nCustomers = c.customer.count()
    assert(a.length == nCustomers, s"one row per customer: ${a.length} vs $nCustomers")
    val sizes = a.groupBy(_.getAs[Int]("cluster")).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3), s"expected 4 live clusters, got ${sizes.keySet}")
    // no degenerate cluster: the max-abs standardization must keep all
    // four features in play (measured split at sf0.01: 268/406/481/345)
    assert(sizes.values.min >= nCustomers / 20,
      s"degenerate cluster in $sizes (floor ${nCustomers / 20})")
    // bit-determinism across a re-run (fit + assignment are integer)
    val b = SegmentationLloyd.segments(c.customer, c.orders).collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1))).toSeq)
    // corpus smaller than k: seeds bound on the actual row count
    val tiny = c.customer.orderBy(col("c_custkey")).limit(2)
    val t = SegmentationLloyd.segments(tiny, c.orders).collect()
    assert(t.length == 2 && t.map(_.getAs[Int]("cluster")).toSet.subsetOf(Set(0, 1)))
  }

  test("churn tree twin: one row per labeled pair, informative splits, deterministic") {
    val c = Catalog(spark, sf)
    val a = ChurnTree.scores(c.customer, c.orders, c.lineitem).collect()
    val nPairs = graft.analytics.Repurchase(c.orders, c.lineitem).count()
    assert(a.length == nPairs, s"one row per (custkey, partkey): ${a.length} vs $nPairs")
    // leaves are the 4 depth-2 buckets; stats are consistent per leaf
    val byLeaf = a.groupBy(_.getAs[Int]("leaf"))
    assert(byLeaf.keySet.subsetOf(Set(0, 1, 2, 3)))
    byLeaf.foreach { case (_, rows) =>
      assert(rows.map(r => (r.getAs[Long]("leaf_pos"), r.getAs[Long]("leaf_n"))).toSet.size == 1,
        "every row in a leaf carries that leaf's fit stats")
    }
    // the splits are informative, not degenerate: leaf positive rates
    // differ (a tree that never separated labels would emit one rate),
    // and at least two leaves received fit rows
    val stats = byLeaf.values.map { rows =>
      val r = rows.head
      (r.getAs[Long]("leaf_pos").toDouble, r.getAs[Long]("leaf_n").toDouble)
    }.filter(_._2 > 0).toSeq
    val rates = stats.map { case (p, n) => p / n }
    assert(rates.size >= 2, s"tree routed everything to one leaf: $rates")
    // relative to the base rate, not an absolute gap: repurchase
    // positives are rare (~0.5% at sf0.001), so an informative tree
    // shows up as leaf ENRICHMENT — the best leaf's rate above the
    // overall rate, and a strict spread between leaves
    val overall = stats.map(_._1).sum / stats.map(_._2).sum
    assert(rates.max > overall && rates.max > rates.min,
      s"splits separated nothing: leaf rates $rates vs base $overall")
    // bit-determinism across a re-run (fit + assignment are integer)
    val b = ChurnTree.scores(c.customer, c.orders, c.lineitem).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("churn RF trains with AUC in band and an exact split") {
    val c = Catalog(spark, sf)
    val r = ChurnPipeline.fitEvaluate(ChurnPipeline.examples(c.customer, c.orders, c.lineitem))
    collected ++= Map(
      "churn_auc" -> r.auc,
      "churn_train" -> r.train.toDouble,
      "churn_test" -> r.test.toDouble)
    assert(r.auc > 0.68 && r.auc < 0.80,
      s"AUC ${r.auc} outside [0.68, 0.80] (measured 0.741)")
    assert(r.train + r.test == 5382L,
      s"example count drifted: ${r.train}+${r.test} (measured 4349+1033)")
  }

  test("FP-Growth finds the exact frequent-itemset count; support bounds honored") {
    val c = Catalog(spark, sf)
    val fi = BasketItemsets.frequentItemsets(c.lineitem, minSupport = 0.002)
    val n = BasketItemsets.baskets(c.lineitem).count()
    val rows = fi.collect()
    collected += "fpgrowth_itemsets" -> rows.length.toDouble
    // itemset counting is exact combinatorics over fixed data — no band
    assert(rows.length == 635, s"itemset count drifted: ${rows.length} (measured 635)")
    assert(rows.forall(_.getAs[Long]("freq") >= (0.002 * n).floor.toLong))
  }

  test("ALS produces top-N recommendations per user; metrics artifact emitted") {
    val c = Catalog(spark, sf)
    val recs = Recommender.topN(c.orders, c.lineitem, 3)
    val nRecs = recs.count()
    val nUsers = recs.select("user").distinct().count()
    collected ++= Map("als_recs" -> nRecs.toDouble, "als_users" -> nUsers.toDouble)
    assert(nRecs == 450L && nUsers == 150L,
      s"ALS coverage drifted: $nRecs recs / $nUsers users (measured 450/150)")
    val perUser = recs.groupBy("user").count().collect()
    assert(perUser.nonEmpty && perUser.forall(_.getAs[Long]("count") <= 3))
    // fit QUALITY band (not just coverage): deterministic hash-split
    // holdout, hit-rate@5 of held-out interactions in the model's top-5
    // build the rating matrix ONCE for both eval metrics (the
    // orders/lineitem join is the expensive part of either)
    val ratingFrame = Recommender.ratings(c.orders, c.lineitem).cache()
    val (hitRate, reconRatio) = Recommender.holdoutMetricsOf(ratingFrame, 5)
    val baseline = Recommender.randomHitRateBaselineOf(ratingFrame, 5)
    ratingFrame.unpersist()
    collected += "als_quantity_hit_rate" -> hitRate
    collected += "als_quantity_baseline" -> baseline
    collected += "als_train_recon_ratio" -> reconRatio
    // generator-structurelessness gate (same fit, no extra cost): if the
    // synthetic baskets ever gain real preference signal, train
    // reconstruction — the EASY direction — jumps first and this fails
    // pointing at the DATA, with instructions: re-derive the chance band
    // below before touching the model (measured ratio ~1.15)
    assert(reconRatio >= 0.5 && reconRatio <= 2.0,
      s"train-reconstruction ratio $reconRatio left the structureless band [0.5, 2.0]: " +
        "the basket generator likely gained preference structure — re-derive the " +
        "holdout chance band instead of hunting a model bug")
    // The bound is DERIVED from an executable baseline, not calibrated
    // from one measurement — and what it pins is chance-level: the
    // synthetic baskets assign parts to customers with no preference
    // structure, so NO recommender can beat uniform random here
    // (measured: hit-rate 0.0242 vs baseline 5/|items| = 0.025, ratio
    // 0.97; a train-item-filtered eval gives the same ratio 1.00, and
    // train-reconstruction precision@5 is 0.164 vs 0.142 random — the
    // data is structureless, r7's "~10x random" note miscounted the
    // catalog at ~2000 items where the rating matrix has 200). The band
    // still gates real failure in both directions: ~0 catches degenerate
    // recs (empty/NaN factors, coldStartStrategy dropping everyone);
    // >2x baseline catches holdout leakage (split bug putting train
    // pairs in test, where hit-rate jumps toward train precision).
    assert(hitRate >= 0.2 * baseline && hitRate <= 2 * baseline,
      s"ALS quantity-matrix hit-rate $hitRate outside chance band " +
        s"[${0.2 * baseline}, ${2 * baseline}] (measured 0.0242 vs baseline 0.025): " +
        "below = degenerate recommendations, above = holdout leakage")

    // The HEADLINE organic gate runs on the preference-derived matrix
    // (Recommender.preferenceRatings — segment↔brand affinity-thresholded
    // implicit quantities over the real catalog tables): unlike the
    // structureless quantity matrix above, this one carries learnable
    // block preference, so the product-path metric is a real learning
    // gate — a broken fit (degenerate factors, dead regularization, a
    // leaky split) lands OUTSIDE the band instead of hiding at chance.
    // The train-filtered hit-rate is the form that can see
    // generalization (see holdoutFilteredHitRateOf). Measured at
    // sf0.001: 0.0426 vs baseline 0.0251 — lift 1.70 (deterministic:
    // fixed seed, fixed data, hash split).
    val prefFrame = Recommender
      .preferenceRatings(c.orders, c.lineitem, c.customer, c.part).cache()
    val prefHitRate = Recommender.holdoutFilteredHitRateOf(prefFrame, 5)
    val prefBaseline = Recommender.randomHitRateBaselineOf(prefFrame, 5)
    prefFrame.unpersist()
    collected += "als_holdout_hit_rate" -> prefHitRate
    collected += "als_random_baseline" -> prefBaseline
    assert(prefHitRate > 1.2 * prefBaseline,
      s"ALS holdout hit-rate $prefHitRate does not beat the random baseline " +
        s"$prefBaseline by 1.2x on the preference-structured matrix " +
        "(measured lift 1.70): the fit stopped learning the block structure")
    assert(prefHitRate < 10 * prefBaseline,
      s"ALS holdout hit-rate $prefHitRate exceeds 10x baseline $prefBaseline: " +
        "holdout leakage (train pairs in test)")
    ModelMetrics.write("MODEL_METRICS.json", collected.toMap)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get("MODEL_METRICS.json")))
  }

  test("ALS eval harness is falsifiable: planted preference structure lifts " +
      "holdout hit-rate far above chance, and shuffling the item labels kills it") {
    // The testdata's baskets are structureless, so the chance-band gate
    // above can only pin "not degenerate, no leakage". THIS test proves
    // the eval pipeline (hash split + fit + hit-rate@5 + computed random
    // baseline) DETECTS real preference signal when it exists, and stops
    // detecting it when the user↔item association is destroyed — i.e.
    // the gate is not vacuous: a broken eval (leaky split, wrong join,
    // mis-joined baseline) fails one of these two directions.
    import spark.implicits._
    val nUsers = 120; val nItems = 80; val blocks = 4
    def pct(u: Int, i: Int): Int =
      math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"$u:$i"), 100)
    // planted signal: user u prefers item block (u % 4) — 60% density
    // in-block, 4% off-block; every inclusion decision is a fixed hash,
    // so the dataset (and both fits below) is fully deterministic
    val structured = for {
      u <- 0 until nUsers; i <- 0 until nItems
      if pct(u, i) < (if (i % blocks == u % blocks) 60 else 4)
    } yield (u, i, 1.0f)
    // label shuffle: permute the item column across rows with a fixed
    // seed — both marginals survive, the user↔item association dies
    val shuffled = structured
      .zip(new scala.util.Random(7).shuffle(structured.map(_._2).toList))
      .map { case ((u, _, r), i2) => (u, i2, r) }
    // the TRAIN-FILTERED hit-rate (see holdoutFilteredHitRateOf): with
    // ~12 train interactions per user, the unfiltered top-5 is all
    // train items and held-out hits are structurally impossible — the
    // filtered form is the one that can see generalization
    def lift(rows: Seq[(Int, Int, Float)]): Double = {
      val df = rows.toDF("user", "item", "rating")
      Recommender.holdoutFilteredHitRateOf(df, 5) /
        Recommender.randomHitRateBaselineOf(df, 5)
    }
    val plantedLift = lift(structured)
    val shuffledLift = lift(shuffled)
    collected += "als_planted_lift" -> plantedLift
    collected += "als_shuffled_lift" -> shuffledLift
    // re-emit the artifact so the two lift metrics land in it too (the
    // write is idempotent; this test runs after the main ALS gate)
    ModelMetrics.write("MODEL_METRICS.json", collected.toMap)
    assert(plantedLift > 2.0,
      s"planted-structure lift $plantedLift <= 2: the eval cannot detect real " +
        "preference signal — hit-rate join, split, or baseline is broken")
    assert(shuffledLift < 2.0,
      s"shuffled-label lift $shuffledLift >= 2: chance-level data scored as " +
        "signal — the holdout split is leaking train pairs into test")
    assert(plantedLift > 2.0 * shuffledLift,
      s"planted lift $plantedLift not clearly above shuffled lift $shuffledLift")
  }
}
