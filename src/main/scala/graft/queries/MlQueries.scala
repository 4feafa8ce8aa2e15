package graft.queries

import graft.core.Catalog
import graft.ml._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ML pipeline surface (SURVEY §2.10 M1-M13) as named queries.
  *
  * These are model fits — correctness is model-quality-within-tolerance
  * (SURVEY §5), not SQL-reproducible, so all entries are rows-only for
  * the driver; quantitative assertions live in the ScalaTest suite.
  */
object MlQueries {

  def registry: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(

    // M1-M5: assembler + scaler + KMeans auto-K by silhouette
    "ml_kmeans_segmentation" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        SegmentationPipeline.clusterSizes(c.customer, c.orders)
      }),
      None),

    // M6-M10: indexer/OHE/assembler/scaler/RF + AUC
    "ml_churn_rf" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        ChurnPipeline.metrics(c.customer, c.orders, c.lineitem)
      }),
      None),

    // M11: ALS implicit top-5
    "ml_als_recommend" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        Recommender.topN(c.orders, c.lineitem, 5)
      }),
      None),

    // M13/R1-R5: DataFrame FP-Growth itemsets — the FULL (unsliced)
    // result, hash-gated: at minSupport 0.0001 the synthetic baskets
    // contain NO frequent itemset larger than 3 (checked in DuckDB at
    // min_freq=2/sf0.01: 12 triples, 0 quadruples — and by the Apriori
    // property no larger set can be frequent without a frequent subset),
    // so the complete FP-Growth output equals the size-<=3 relational
    // replay and upTo3Oracle gates it exactly. If the generator ever
    // produces a frequent quadruple the row-count match fails loudly.
    "ml_fpgrowth" -> (
      ((s: SparkSession, d: String) => BasketItemsets.frequentItemsets(Catalog(s, d).lineitem, 0.0001)),
      Some(BasketItemsets.upTo3Oracle(0.0001))),

    // FP-Growth restricted to size<=2 itemsets: the frequent-pattern
    // result replayed exactly by relational SQL (oracle-checked)
    "ml_fpgrowth_pairs" -> (
      ((s: SparkSession, d: String) => BasketItemsets.frequentItemsetsUpTo2(Catalog(s, d).lineitem, 0.002)),
      Some(BasketItemsets.upTo2Oracle(0.002))),

    // association rules (1->1) with confidence/lift/support replayed as
    // frequency ratios by the oracle; support 0.0001 is the level where
    // pair itemsets exist in the synthetic baskets (132 rules clear
    // confidence 0.1 at sf0.01 — 0.002 admits only singletons, no rules)
    "ml_fpgrowth_rules" -> (
      ((s: SparkSession, d: String) => BasketItemsets.associationRules(Catalog(s, d).lineitem, 0.0001, 0.1)),
      Some(BasketItemsets.rulesOracle(0.0001, 0.1))),

    // FP-Growth restricted to size<=3: the triple slice exercises the
    // conditional-tree recursion the pairs gate cannot see. minSupport
    // 0.0001 -> min_freq 2 at sf0.01, the level where size-3 itemsets
    // actually exist in the synthetic baskets (12 of them; 0.002 yields
    // zero triples and would gate nothing new)
    "ml_fpgrowth_upto3" -> (
      ((s: SparkSession, d: String) => BasketItemsets.frequentItemsetsUpTo3(Catalog(s, d).lineitem, 0.0001)),
      Some(BasketItemsets.upTo3Oracle(0.0001)))
  )
}
