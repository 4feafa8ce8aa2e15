package graft

import org.apache.spark.sql.GraftSessionBridge
import org.scalatest.funsuite.AnyFunSuite

/** Operator cache lifecycle: every multi-pass operator must release the
  * caches it takes before returning. A CacheManager entry is never
  * reclaimed automatically — in a long-lived session composing
  * operators, one leaked build cache per call accumulates until
  * executors spill or OOM. The contract the graph/cluster family
  * follows (the DedupClusters lifecycle): iterative state lives as
  * `localCheckpoint`s (ContextCleaner-managed, freed on GC), build
  * frames (`adjacency`, `oriented`, gram caches) are `unpersist`ed once
  * the result is materialized, and the CacheManager is EMPTY when the
  * operator returns.
  *
  * The CacheManager is per-SharedState (one per JVM here), so each
  * check clears residue from other suites first — the assertion is then
  * exactly "this query added nothing that survived its own completion".
  */
class CacheHygieneSpec extends AnyFunSuite with SharedSpark {

  private val queries = Seq(
    "g1_pagerank",        // PageRank: withDeg + nodes build caches
    "g2_triangles",       // Triangles: und/deg + oriented
    "g3_bfs_hops",        // BfsHops: adjacency + per-round frontier/settled
    "g4_label_prop",      // LabelPropagation: adjacency + per-round labels
    "g5_triangles_capped", // capped variant: und0 + countUnd internals
    "d8_dup_clusters",    // DedupClusters + gram cache + spreadText
    "d3_minhash_pairs",   // MinHashDedup.verifiedPairs gram + spreadText
    "d4_ngram_jaccard",   // NgramJaccard.pairsBanded gram + spreadText
    "d10_span_dedup",     // spreadText released at the registry
    "d11_span_removal",   // spreadText released at the registry
    "d12_incremental_dedup", // spreadText released at the registry
    "d14_containment",    // ContainmentJoin gram cache
    "d6_simhash_pairs",   // SimHash fingerprint cache
    "ml_fpgrowth_pairs",  // FP-Growth basket cache released after fit
    "ml_model_roundtrip", // segmentation feature cache released
    "ml_kmeans_lloyd"     // SegmentationLloyd quantized-feature cache
  )

  for (name <- queries)
    test(s"$name leaves the CacheManager empty after running to completion") {
      spark.catalog.clearCache()
      val df = SparkEntry.queries(name)(spark, sf)
      df.count()
      assert(GraftSessionBridge.cacheManagerIsEmpty(spark),
        s"$name left cached frames registered in the CacheManager at return — " +
          "an operator must unpersist its build caches once its result is " +
          "materialized (keep iterative state as localCheckpoints instead)")
    }
}
