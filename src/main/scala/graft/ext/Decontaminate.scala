package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any word
  * n-gram with an evaluation/benchmark set — the standard "n-gram
  * overlap" contamination check run before training (an eval question
  * leaking into the training corpus inflates benchmark scores), here as
  * a first-class corpus operator (north-star extension; the reference
  * has no text processing at all).
  *
  * Shape at 100 TB: the benchmark side is an eval suite — megabytes, not
  * terabytes — so its distinct hashed-gram set is BROADCAST and the
  * corpus-side probe is a map-side semi-join: one pass over the corpus,
  * no corpus shuffle at all. Grams cross the wire as the engine's shared
  * md5-prefix longs (8 bytes each), never as strings. For a benchmark
  * too large to broadcast (past the 8 GB broadcast limit / driver
  * memory), pass `broadcastBench = false` to fall back to a shuffled
  * semi-join on the gram hash — the same plan minus the hint; the hint
  * is explicit because an eval-suite gram set is far below the
  * autoBroadcastJoinThreshold heuristics would need to SEE (they only
  * know source sizes, and the gram explode inflates before the join).
  */
object Decontaminate {

  /** (doc_id, contaminated) for every corpus document: true iff the doc
    * shares at least one word `n`-gram with any benchmark document.
    */
  def flags(corpus: DataFrame, benchmark: DataFrame, n: Int = 8,
            broadcastBench: Boolean = true): DataFrame = {
    val benchDistinct = benchmark
      .select(explode(TextStats.hashedWordGramsCol(col("text"), n)).as("g"))
      .distinct()
    val benchGrams = if (broadcastBench) broadcast(benchDistinct) else benchDistinct
    val hit = corpus
      .select(col("doc_id"), explode(TextStats.hashedWordGramsCol(col("text"), n)).as("g"))
      .join(benchGrams, Seq("g"), "left_semi")
      .select(col("doc_id"))
      .distinct()
    corpus
      .select(col("doc_id"))
      .join(hit.withColumn("hit", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("contaminated"))
  }

  /** DuckDB twin of [[flags]] with the benchmark/corpus split expressed
    * as a doc_id predicate over the shared `documents` table (how the
    * gated query derives its eval set).
    */
  def flagsOracle(n: Int, benchmarkPredicate: String): String =
    s"""WITH grams AS (
       |  SELECT doc_id, unnest(${TextStats.hashedWordGramsSql(n)}) AS g FROM documents),
       |bench AS (SELECT DISTINCT g FROM grams WHERE $benchmarkPredicate),
       |corpus AS (SELECT doc_id FROM documents WHERE NOT ($benchmarkPredicate)),
       |hits AS (
       |  SELECT DISTINCT doc_id FROM grams
       |  WHERE doc_id IN (SELECT doc_id FROM corpus) AND g IN (SELECT g FROM bench))
       |SELECT c.doc_id, (h.doc_id IS NOT NULL) AS contaminated
       |FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id""".stripMargin
}
