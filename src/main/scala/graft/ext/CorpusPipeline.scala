package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition every LLM data
  * pipeline runs — quality filter ∘ language filter ∘ near-dup dedup —
  * expressed as one declarative plan so Catalyst fuses the per-row stages
  * into a single scan and the only shuffles are the dedup component
  * rounds.
  *
  * Keep rule: a document survives iff (a) its quality score clears the
  * threshold, (b) its predicted language matches, and (c) it is the
  * canonical representative (min doc_id) of its near-dup cluster.
  */
object CorpusPipeline {

  def curate(documents: DataFrame, minQuality: Double = 0.8,
             lang: String = "en", jaccard: Double = 0.5): DataFrame = {
    val quality = TextStats.qualityScore(documents)
      .select(col("doc_id"), col("n_words"), col("quality_score"))
    val langs = TextStats.langId(documents)
      .select(col("doc_id"), col("predicted_lang"))
    val comp = DedupClusters.components(
      documents, MinHashDedup.verifiedPairs(documents, 5, jaccard))
    documents.select(col("doc_id"))
      .join(quality, "doc_id")
      .join(langs, "doc_id")
      .join(comp, "doc_id")
      .filter(
        col("quality_score") >= minQuality &&
        col("predicted_lang") === lang &&
        col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("n_words"), col("quality_score"))
  }

  /** Filter-first curation: quality + language predicates applied BEFORE
    * any dedup work, so MinHash signatures, the LSH pair join, and the
    * component propagation rounds run over *survivors only* — the
    * production shape. At a 100 TB corpus with (say) 50% quality/lang
    * rejection this halves the dominant (dedup-shaped) cost; the trade vs
    * [[curate]] is semantic, not approximate: cluster representatives are
    * chosen among survivors (min surviving doc_id), whereas [[curate]]
    * picks the min doc_id of the FULL corpus's cluster, so a survivor
    * whose cluster-rep was rejected is dropped there but kept here. Both
    * forms are oracle-gated; pick by whether cross-reject dup evidence
    * should suppress survivors.
    */
  def curateFiltered(documents: DataFrame, minQuality: Double = 0.8,
                     lang: String = "en", jaccard: Double = 0.5): DataFrame = {
    // quality/lang are per-row column algebra, so the survivor set is ONE
    // narrow filtered scan — no scored-frame self-joins (measured 2s
    // SLOWER than curate() at sf0.1 in the joined formulation; the whole
    // point of filter-first is that rejects never reach a shuffle).
    // Cached because it feeds the signature scan, the gram scan, and the
    // final rep filter.
    val survivors = documents
      .select(col("doc_id"), col("text"),
        TextStats.nWordsCol(col("text")).as("n_words"),
        TextStats.qualityScoreCol(col("text")).as("quality_score"),
        TextStats.predictedLangCol(col("text")).as("predicted_lang"))
      .filter(col("quality_score") >= minQuality && col("predicted_lang") === lang)
      .cache()
    val comp = DedupClusters.components(
      survivors, MinHashDedup.verifiedPairs(survivors, 5, jaccard))
    survivors
      .join(comp, "doc_id")
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("n_words"), col("quality_score"))
  }

  /** DuckDB twin of [[curateFiltered]]: the identical verified-pairs +
    * recursive-closure SQL, with every dedup CTE reading the `sdocs`
    * (survivors) CTE instead of the base table.
    */
  def filteredOracle(minQuality: Double, lang: String, jaccard: Double): String =
    s"""WITH RECURSIVE
       |qual AS (${TextStats.qualityOracle}),
       |lang AS (${TextStats.langIdOracle}),
       |sdocs AS (
       |  SELECT d.* FROM documents d
       |  JOIN qual ON d.doc_id = qual.doc_id
       |  JOIN lang ON d.doc_id = lang.doc_id
       |  WHERE qual.quality_score >= $minQuality
       |    AND lang.predicted_lang = '$lang'),
       |p AS (${MinHashDedup.verifiedPairsOracle(5, jaccard, table = "sdocs")}),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |      UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT doc_id, doc_id AS root FROM sdocs
       |  UNION
       |  SELECT e.dst AS doc_id, r.root FROM reach r JOIN e ON e.src = r.doc_id),
       |comp AS (SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id)
       |SELECT s.doc_id, qual.n_words, qual.quality_score
       |FROM sdocs s
       |JOIN qual ON s.doc_id = qual.doc_id
       |JOIN comp ON s.doc_id = comp.doc_id
       |WHERE s.doc_id = comp.cluster_id""".stripMargin

  def oracle(minQuality: Double, lang: String, jaccard: Double): String =
    s"""WITH RECURSIVE
       |p AS (${MinHashDedup.verifiedPairsOracle(5, jaccard)}),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
       |      UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT doc_id, doc_id AS root FROM documents
       |  UNION
       |  SELECT e.dst AS doc_id, r.root FROM reach r JOIN e ON e.src = r.doc_id),
       |comp AS (SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id),
       |qual AS (${TextStats.qualityOracle}),
       |lang AS (${TextStats.langIdOracle})
       |SELECT d.doc_id, qual.n_words, qual.quality_score
       |FROM documents d
       |JOIN qual ON d.doc_id = qual.doc_id
       |JOIN lang ON d.doc_id = lang.doc_id
       |JOIN comp ON d.doc_id = comp.doc_id
       |WHERE qual.quality_score >= $minQuality
       |  AND lang.predicted_lang = '$lang'
       |  AND d.doc_id = comp.cluster_id""".stripMargin
}
