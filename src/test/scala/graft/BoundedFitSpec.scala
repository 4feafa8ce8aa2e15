package graft

import graft.core.Catalog
import graft.ml.{AlsTwin, ChurnTree, SegmentationLloyd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-driver-fit contract, ENFORCED instead of asserted: every
  * deterministic twin fits on a ≤[[Cap]]-row, SQL-expressible sample
  * (the "driver pulls are plan constants" claim SCALING.md makes for
  * 100 TB). Two teeth per fit family:
  *
  *  1. a [[QueryExecutionListener]] audits every driver `collect`-class
  *     action issued WHILE the fit runs on an input larger than the
  *     cap, and asserts its executed plan carries a row-limit node
  *     (TakeOrderedAndProject / CollectLimit / GlobalLimit) of at most
  *     [[Cap]] — an unbounded driver pull anywhere in a fit path fails
  *     the suite with the offending plan in the message;
  *  2. capped ≡ full: feeding a fit ONLY its declared sample (the cap
  *     smallest ids) reproduces the full-input fit bit-for-bit — rows
  *     beyond the cap provably cannot influence the model.
  *
  * The ANN/Lloyd fits get synthetic >cap corpora (the testdata tops out
  * at 2k embeddings, which would leave the bound unexercised); the
  * churn/ALS twins run against sf0.1 where the real example counts
  * exceed the cap (asserted, so data drift can't make this vacuous).
  */
class BoundedFitSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val Cap = 65536L

  /** Collected (funcName, smallest limit in the executed plan or None). */
  private val audited =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[Long], String)]()

  private val collectFuncs = Set("collect", "collectAsList", "head", "take", "first", "tail")

  /** All row-limit nodes in a plan, descending through the AQE wrappers
    * (AdaptiveSparkPlanExec and QueryStageExec present as leaves to
    * normal traversal — their actual plans hang off fields).
    */
  private def limitNodes(p: SparkPlan): Seq[Long] = {
    val self = p match {
      case t: TakeOrderedAndProjectExec => Seq(t.limit.toLong)
      case c: CollectLimitExec => Seq(c.limit.toLong)
      case g: GlobalLimitExec => Seq(g.limit.toLong)
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(limitNodes)
  }

  private object Audit extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      if (collectFuncs.contains(funcName)) {
        val limits = limitNodes(qe.executedPlan)
        audited.add((funcName, limits.minOption, qe.executedPlan.nodeName))
      }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  /** Run `body` with the audit listener attached; return the audited
    * collect-class events it triggered (poll-waits for the async
    * listener bus to drain).
    */
  private def auditedCollects[A](body: => A): (A, Seq[(String, Option[Long], String)]) = {
    audited.clear()
    spark.listenerManager.register(Audit)
    try {
      val result = body
      // ExecutionListener events ride the async listener bus
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var last = -1
      while (System.nanoTime() < deadline &&
             (audited.size() != last || audited.isEmpty)) {
        last = audited.size(); Thread.sleep(300)
      }
      import scala.jdk.CollectionConverters._
      (result, audited.asScala.toSeq)
    } finally spark.listenerManager.unregister(Audit)
  }

  private def assertAllBounded(events: Seq[(String, Option[Long], String)], who: String): Unit = {
    assert(events.nonEmpty, s"$who: the fit issued no audited driver collect — " +
      "the audit harness saw nothing (listener drift?)")
    for ((fn, lim, plan) <- events)
      assert(lim.exists(_ <= Cap),
        s"$who: driver action '$fn' executed ${lim.fold("WITHOUT a row-limit node")(l => s"with limit $l > $Cap")} " +
          s"— an unbounded driver pull in a fit path (root plan: $plan)")
  }

  /** 70k synthetic 4-dim embeddings (deterministic arithmetic values in
    * [-1, 1] — the catalog's embedding contract).
    */
  private def synthEmbeddings(n: Int): DataFrame =
    spark.range(1, n + 1L).select(
      col("id").as("vec_id"),
      array(
        ((col("id") % 17) / 8.0 - 1.0).cast("float"),
        ((col("id") % 29) / 14.0 - 1.0).cast("float"),
        ((col("id") % 7) / 3.0 - 1.0).cast("float"),
        ((col("id") % 101) / 50.0 - 1.0).cast("float")).as("embedding"))

  test("IVF Lloyd fit: bounded pulls on a 70k corpus; capped sample ≡ full input") {
    val emb = synthEmbeddings(70000).cache()
    try {
      assert(emb.count() > Cap)
      val (full, events) = auditedCollects {
        graft.ext.AnnIvf.lloydCentroidsQ(emb, nCells = 8, iters = 2)
      }
      assertAllBounded(events, "lloydCentroidsQ")
      val capped = graft.ext.AnnIvf.lloydCentroidsQ(
        emb.orderBy(col("vec_id")).limit(Cap.toInt), nCells = 8, iters = 2)
      assert(full.length == capped.length &&
        full.zip(capped).forall { case (a, b) => a.sameElements(b) },
        "rows beyond the 65536-smallest-vec_id sample influenced the Lloyd fit")
    } finally emb.unpersist()
  }

  test("segmentation Lloyd fit: bounded pulls on a 70k frame; capped sample ≡ full input") {
    val q = spark.range(1, 70001L).select(
      col("id").as("custkey"),
      (col("id") % 1000L - 500L).as("q1"), (col("id") % 77L).as("q2"),
      (col("id") % 13L * 31L).as("q3"), (col("id") % 401L - 200L).as("q4")).cache()
    try {
      assert(q.count() > Cap)
      val (full, events) = auditedCollects {
        SegmentationLloyd.fitLloyd(q, k = 4, iters = 3)
      }
      assertAllBounded(events, "SegmentationLloyd.fitLloyd")
      val capped = SegmentationLloyd.fitLloyd(
        q.orderBy(col("custkey")).limit(Cap.toInt), k = 4, iters = 3)
      assert(full.length == capped.length &&
        full.zip(capped).forall { case (a, b) => a.sameElements(b) },
        "rows beyond the 65536-smallest-custkey sample influenced the Lloyd fit")
    } finally q.unpersist()
  }

  test("PQ codebook fit: bounded pulls (seed collect is nCodes-limited)") {
    val emb = synthEmbeddings(70000).cache()
    try {
      val (_, events) = auditedCollects {
        graft.ext.AnnPq.fixedCodebooks(emb, nSub = 2, nCodes = 16)
      }
      assertAllBounded(events, "AnnPq.fixedCodebooks")
    } finally emb.unpersist()
  }

  test("churn-tree fit at sf0.1: example frame exceeds the cap, pulls stay bounded") {
    val c = Catalog(spark, "/root/testdata/sf0.1")
    val nExamples = ChurnTree.features(c.customer, c.orders, c.lineitem).count()
    assert(nExamples > Cap,
      s"sf0.1 churn examples ($nExamples) no longer exceed the fit cap — " +
        "the bound is unexercised at this scale; move the test up a scale")
    val (scores, events) = auditedCollects {
      ChurnTree.scores(c.customer, c.orders, c.lineitem).count()
    }
    assertAllBounded(events, "ChurnTree.scores")
    assert(scores == nExamples)
  }

  test("ALS twin fit at sf0.1: rating matrix exceeds the cap, pulls stay bounded") {
    val c = Catalog(spark, "/root/testdata/sf0.1")
    val nPairs = AlsTwin.ratingsInt(c.orders, c.lineitem).count()
    assert(nPairs > Cap,
      s"sf0.1 rating pairs ($nPairs) no longer exceed the fit cap — " +
        "the bound is unexercised at this scale; move the test up a scale")
    val (out, events) = auditedCollects {
      AlsTwin.recommend(c.orders, c.lineitem).count()
    }
    assertAllBounded(events, "AlsTwin.recommend")
    assert(out > 0)
  }
}
