package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding near-duplicate detection.
  *
  * The classic corpus-dedup pipeline: 5-char shingles → k independent
  * min-hashes (signature) → band the signature → equi-join on band keys
  * for candidates → verify candidates with exact shingle Jaccard.
  *
  * Hash choice: each of the k hash functions is `md5(j || '|' ||
  * shingle)` truncated to 16 hex chars, minimized *lexicographically*
  * (fixed-width hex, so lexicographic = numeric). md5 is used because the
  * DuckDB oracle shares it — in production the drop-in is xxhash64 with
  * k seeds (same structure, ~20x cheaper). Everything is deterministic:
  * no RNG, no model state.
  *
  * Scale: shingling is a projection; the signature aggregate shuffles
  * (doc_id, 16-byte mins) — not the text. Banding turns the quadratic
  * all-pairs problem into an equi-join whose fan-out is bucket-bounded;
  * hot buckets (boilerplate-heavy corpora) are handled by AQE skew
  * splitting. The verify stage re-reads only candidate-pair shingle sets.
  */
object MinHashDedup {

  val numHashes  = 64
  val bandsCount = 16
  val rowsPerBand = numHashes / bandsCount

  /** Exploded distinct 5-char shingles: (doc_id, shingle). */
  def shingles(documents: DataFrame, n: Int = 5): DataFrame =
    documents.select(
      col("doc_id"),
      explode(NgramJaccard.charNgrams(col("text"), n)).as("shingle"))

  private def hashJ(j: Int): Column =
    substring(md5(concat(lit(j.toString), lit("|"), col("shingle")).cast("binary")), 1, 16)

  /** MinHash signatures: one row per doc, columns sig_0..sig_63. */
  def signatures(documents: DataFrame, n: Int = 5): DataFrame = {
    val aggs = (0 until numHashes).map(j => min(hashJ(j)).as(s"sig_$j"))
    shingles(documents, n).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Signatures flattened to a single string column (stable to compare). */
  def signatureStrings(documents: DataFrame, n: Int = 5): DataFrame =
    signatures(documents, n).select(
      col("doc_id"),
      concat_ws(",", (0 until numHashes).map(j => col(s"sig_$j")): _*).as("signature"))

  /** LSH candidate pairs: docs sharing any band key. */
  def candidatePairs(documents: DataFrame, n: Int = 5): DataFrame = {
    val sigs = signatures(documents, n)
    val bandKeys = (0 until bandsCount).map { b =>
      concat_ws(",", (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*)
    }
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band", "band_key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Candidates verified with exact shingle Jaccard >= threshold. */
  def verifiedPairs(documents: DataFrame, n: Int = 5, threshold: Double = 0.5): DataFrame = {
    val g = documents.select(
      col("doc_id"), NgramJaccard.charNgrams(col("text"), n).as("grams"))
    candidatePairs(documents, n)
      .join(g.select(col("doc_id").as("doc_a"), col("grams").as("grams_a")), "doc_a")
      .join(g.select(col("doc_id").as("doc_b"), col("grams").as("grams_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (size(col("grams_a")) + size(col("grams_b")) - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private def oracleShingles(n: Int): String =
    s"""sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |  range(1, greatest(length(text) - ${n - 1}, 0) + 1),
       |  i -> substr(text, i, $n)))) AS shingle FROM documents)""".stripMargin

  private def oracleSigs(n: Int): String = {
    val aggs = (0 until numHashes)
      .map(j => s"min(substr(md5('$j' || '|' || shingle), 1, 16)) AS sig_$j")
      .mkString(", ")
    s"${oracleShingles(n)}, sigs AS (SELECT doc_id, $aggs FROM sh GROUP BY doc_id)"
  }

  def signaturesOracle(n: Int): String = {
    val cols = (0 until numHashes).map(j => s"sig_$j").mkString(" || ',' || ")
    s"WITH ${oracleSigs(n)}\nSELECT doc_id, $cols AS signature FROM sigs"
  }

  def verifiedPairsOracle(n: Int, threshold: Double): String = {
    val bandSelects = (0 until bandsCount).map { b =>
      val key = (0 until rowsPerBand).map(r => s"sig_${b * rowsPerBand + r}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS band_key FROM sigs"
    }.mkString(" UNION ALL ")
    s"""WITH ${oracleSigs(n)},
       |banded AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |g AS (SELECT doc_id, list_distinct(list_transform(
       |  range(1, greatest(length(text) - ${n - 1}, 0) + 1),
       |  i -> substr(text, i, $n))) AS grams FROM documents),
       |v AS (SELECT doc_a, doc_b,
       |    len(list_intersect(ga.grams, gb.grams)) AS n_inter,
       |    len(ga.grams) AS na, len(gb.grams) AS nb
       |  FROM cand JOIN g ga ON cand.doc_a = ga.doc_id JOIN g gb ON cand.doc_b = gb.doc_id)
       |SELECT doc_a, doc_b, CAST(n_inter AS DOUBLE) / (na + nb - n_inter) AS jaccard
       |FROM v WHERE CAST(n_inter AS DOUBLE) / (na + nb - n_inter) >= $threshold""".stripMargin
  }
}
