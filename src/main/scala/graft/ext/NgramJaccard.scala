package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram Jaccard near-duplicate detection.
  *
  * North-star dedup operator: exact set-similarity over character
  * shingles, with *blocking* to bound the pair space — candidate pairs
  * are generated only within a block (here: same `lang`), the standard
  * trade of recall-across-blocks for a join that scales. The oracle uses
  * identical blocking, so results match exactly.
  *
  * Scale: the pair join is the quadratic hot spot; per-block pair count
  * is O(B^2). At corpus scale this operator is the *verifier* stage after
  * [[MinHashDedup]] candidate generation (bounded pairs), not a
  * free-standing all-pairs scan.
  */
object NgramJaccard {

  /** Distinct character n-grams of a string column. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
      i => text.substr(i, lit(n))))

  /** Pairs (doc_a < doc_b) within the same `lang` block whose distinct
    * n-gram Jaccard >= `threshold`.
    */
  def pairs(documents: DataFrame, n: Int = 5, threshold: Double = 0.3): DataFrame = {
    val g = documents.select(
      col("doc_id"), col("lang"), charNgrams(col("text"), n).as("grams"))
    val a = g.select(col("doc_id").as("doc_a"), col("lang"), col("grams").as("grams_a"))
    val b = g.select(col("doc_id").as("doc_b"), col("lang"), col("grams").as("grams_b"))
    a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("n_inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("grams_a")) + size(col("grams_b")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def oracle(n: Int, threshold: Double): String =
    s"""WITH g AS (SELECT doc_id, lang,
       |  list_distinct(list_transform(range(1, greatest(length(text) - ${n - 1}, 0) + 1),
       |    i -> substr(text, i, $n))) AS grams
       |  FROM documents),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_intersect(a.grams, b.grams)) AS n_inter,
       |    len(a.grams) AS na, len(b.grams) AS nb
       |  FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / (na + nb - n_inter) AS jaccard
       |FROM p WHERE CAST(n_inter AS DOUBLE) / (na + nb - n_inter) >= $threshold""".stripMargin
}
