package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication for document corpora.
  *
  * Extends the reference's keyed `dropDuplicates`
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:148-152`)
  * to content dedup at scale: group on a *hash* of the content, not the
  * content itself, so the shuffle carries 16-byte keys instead of full
  * documents — the difference between shuffling 100 TB of text and
  * shuffling ~2 GB of digests. The representative is min(doc_id)
  * (deterministic, unlike the reference's arbitrary-row semantics).
  */
object ExactDedup {

  /** One row per distinct content hash: representative id + duplicate
    * count. md5 here because the oracle shares it; xxhash64 (cheaper, no
    * crypto strength needed) is the drop-in for production.
    */
  def groups(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("rep_doc_id"),
        count(lit(1)).as("n_dups"))

  val groupsOracle: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id, count(*) AS n_dups
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** The deduplicated corpus: keep only each group's representative row.
    * Implemented as a semi-join against [[groups]] rather than a window,
    * so the full text shuffles zero times (only doc_ids move).
    */
  def dedup(documents: DataFrame): DataFrame =
    documents.join(
      groups(documents).select(col("rep_doc_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
}
