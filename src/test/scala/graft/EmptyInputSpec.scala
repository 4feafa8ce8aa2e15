package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Zero-row inputs are routine at pipeline scale — an upstream filter
  * that matches nothing, a partition with no late events, a fresh
  * incremental batch. Every multi-pass operator must return an EMPTY
  * result (with its normal schema) instead of throwing on a driver-side
  * `.head`/`collect()(0)`/seed-array access.
  *
  * Each case runs the operator on a schema-correct empty frame and
  * asserts count == 0 — which also proves the full plan executes.
  */
class EmptyInputSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def edges0: DataFrame =
    Seq.empty[(Long, Long)].toDF("src", "dst")
  private def docs0: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emb0: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("graph family returns empty on an empty edge list") {
    spark.catalog.clearCache()
    assert(ext.PageRank.ranks(edges0).count() == 0L)
    assert(ext.Triangles.perNode(edges0).count() == 0L)
    assert(ext.Triangles.perNodeCapped(edges0).count() == 0L)
    assert(ext.BfsHops.hops(edges0).count() == 0L)
    assert(ext.LabelPropagation.communities(edges0).count() == 0L)
    // the early-return paths honor the cache-release contract too
    assert(org.apache.spark.sql.GraftSessionBridge.cacheManagerIsEmpty(spark),
      "an empty-input early return leaked a build cache")
  }

  test("dedup family returns empty on an empty corpus") {
    assert(ext.ExactDedup.dedup(docs0).count() == 0L)
    assert(ext.MinHashDedup.verifiedPairs(docs0).count() == 0L)
    assert(ext.SimHash.pairs(docs0).count() == 0L)
    assert(ext.DedupClusters.clusters(docs0,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0L)
  }

  test("ANN family returns empty on an empty corpus") {
    assert(graft.queries.ExtensionQueries.bruteTopK(emb0, emb0, 5).count() == 0L)
    assert(ext.AnnLsh.topK(emb0, emb0, 5).count() == 0L)
    assert(ext.AnnIvf.topKLloyd(emb0, emb0, 5).count() == 0L)
  }

  test("span/similarity-join family returns empty on an empty corpus") {
    assert(ext.SpanDedup.spanPairs(docs0).count() == 0L)
    assert(ext.SpanDedup.removeSpans(docs0).count() == 0L)
    assert(ext.ContainmentJoin.pairs(docs0).count() == 0L)
    assert(ext.FuzzyJoin.editDistancePairs(docs0).count() == 0L)
    // pairsBanded blocks on (lang, n_chars-derived len_bucket) — its
    // contract includes the documents table's lang/n_chars columns
    assert(ext.NgramJaccard.pairsBanded(
      Seq.empty[(Long, String, String, Long)]
        .toDF("doc_id", "text", "lang", "n_chars")).count() == 0L)
    assert(ext.Decontaminate.flags(docs0, docs0).count() == 0L)
  }

  test("corpus curation returns empty on an empty documents frame") {
    val documents0 = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(ext.CorpusPipeline.curate(documents0).count() == 0L)
  }

  test("PQ fit fails LOUDLY on a corpus smaller than nCodes; encode of an " +
    "empty shard under a valid codebook is fine") {
    // no well-defined smaller-corpus semantics exists for a PQ codebook
    // (the subspace split needs the dimension, the code count is the
    // compression contract) — so unlike the Lloyd fits, the fit must
    // fail with a clear message, not degrade
    val e = intercept[IllegalArgumentException] { ext.AnnPq.fixedCodebooks(emb0) }
    assert(e.getMessage.contains("corpus smaller than nCodes"))
    // encoding an empty SHARD under a codebook fit elsewhere is the
    // routine case and must return zero rows with the codes schema
    val corpus = (0L until 16L)
      .map(i => (i, Array.tabulate(64)(d => ((i * 5 + d) % 13).toFloat / 13f)))
      .toDF("vec_id", "embedding")
    val cb = ext.AnnPq.fixedCodebooks(corpus)
    assert(ext.AnnPq.encode(emb0, cb).count() == 0L)
    assert(ext.AnnPq.topK(emb0, emb0, 5, cb).count() == 0L)
  }

  test("segmentation Lloyd returns empty on an empty customer table") {
    val customer0 = Seq.empty[(Long, Double)].toDF("c_custkey", "c_acctbal")
    val orders0 = Seq.empty[(Long, Long, Double, java.sql.Date)]
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    assert(ml.SegmentationLloyd.segments(customer0, orders0).count() == 0L)
  }

  test("churn and ALS twins return empty on empty fact tables (the empty-fit branches)") {
    val customer0 = Seq.empty[(Long, Double, String)]
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val orders0 = Seq.empty[(Long, Long, java.sql.Date)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem0 = Seq.empty[(Long, Long, Double)]
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    assert(ml.ChurnTree.scores(customer0, orders0, lineitem0).count() == 0L)
    assert(ml.AlsTwin.recommend(orders0, lineitem0).count() == 0L)
    // the early returns honor the cache-release contract too
    assert(org.apache.spark.sql.GraftSessionBridge.cacheManagerIsEmpty(spark),
      "an empty-fit early return leaked a build cache")
  }
}
