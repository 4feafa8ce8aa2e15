package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting.
  *
  * 64-bit SimHash over whitespace tokens: each token hashes to 64 bits
  * (md5 hex prefix, shared with the DuckDB oracle — xxhash64 is the
  * production drop-in); bit b of the fingerprint is 1 iff the sum over
  * token *occurrences* of (+1 if token bit b set else -1) is positive.
  * Near-duplicates differ in few bits (low Hamming distance).
  *
  * Bits are extracted portably — hex digit -> value via
  * `instr('0123456789abcdef', c) - 1`, then `floor(v / 2^s) % 2` — the
  * exact same arithmetic runs on both engines, so fingerprints match
  * bit-for-bit.
  *
  * Scale: one explode + one 64-column aggregate per doc; the shuffle
  * carries (doc_id, 64 small ints). Hamming-bucket pairing (split the
  * fingerprint into 4 x 16-bit blocks; near-dups within Hamming<=3 share
  * at least one exact block — pigeonhole) makes pair generation an
  * equi-join, as with MinHash banding.
  */
object SimHash {

  /** Hex digit char -> 0..15 (16-way when-chain: portable, codegen'd). */
  private def hexVal(hexDigit: Column): Column =
    "0123456789abcdef".zipWithIndex.foldLeft(lit(-1)) { case (acc, (ch, v)) =>
      when(hexDigit === ch.toString, lit(v)).otherwise(acc)
    }

  /** (doc_id, simhash) where simhash is a 64-char '0'/'1' string,
    * bit 0 first.
    */
  def fingerprints(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val bitSums = (0 until 64).map { b =>
      val hexDigit = substring(md5(col("token").cast("binary")), b / 4 + 1, 1)
      val v = hexVal(hexDigit)
      val bit = (floor(v / lit((1 << (b % 4)).toDouble)).cast("int") % 2).cast("int")
      sum(bit * 2 - 1).as(s"s_$b")
    }
    val sums = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val bitChars = (0 until 64).map(b => when(col(s"s_$b") > 0, lit("1")).otherwise(lit("0")))
    sums.select(col("doc_id"), concat(bitChars: _*).as("simhash"))
  }

  def fingerprintsOracle: String = {
    val bitSums = (0 until 64).map { b =>
      val v = s"(instr('0123456789abcdef', substr(md5(token), ${b / 4 + 1}, 1)) - 1)"
      s"SUM(CAST(floor($v / ${(1 << (b % 4)).toDouble}) AS INT) % 2 * 2 - 1) AS s_$b"
    }.mkString(", ")
    val bitChars = (0 until 64)
      .map(b => s"CASE WHEN s_$b > 0 THEN '1' ELSE '0' END")
      .mkString(" || ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents),
       |toks2 AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
       |sums AS (SELECT doc_id, $bitSums FROM toks2 GROUP BY doc_id)
       |SELECT doc_id, $bitChars AS simhash FROM sums""".stripMargin
  }

  /** DuckDB oracle for [[pairs]]: same fingerprint CTE, 4-block
    * pigeonhole candidates, and a generated 64-term Hamming sum.
    */
  def pairsOracle(maxHamming: Int): String = {
    val fpSql = fingerprintsOracle
    val blocks = (0 until 4)
      .map(i => s"SELECT doc_id, $i AS blk, substr(simhash, ${i * 16 + 1}, 16) AS bits FROM fp")
      .mkString(" UNION ALL ")
    val ham = (0 until 64)
      .map(i => s"CASE WHEN substr(a_sh, ${i + 1}, 1) <> substr(b_sh, ${i + 1}, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH fp AS ($fpSql),
       |blocked AS ($blocks),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM blocked a JOIN blocked b
       |    ON a.blk = b.blk AND a.bits = b.bits AND a.doc_id < b.doc_id),
       |withsh AS (
       |  SELECT doc_a, doc_b, fa.simhash AS a_sh, fb.simhash AS b_sh
       |  FROM cand JOIN fp fa ON doc_a = fa.doc_id JOIN fp fb ON doc_b = fb.doc_id)
       |SELECT doc_a, doc_b, CAST($ham AS INT) AS hamming
       |FROM withsh WHERE $ham <= $maxHamming""".stripMargin
  }

  /** Near-duplicate candidates via 4x16-bit block pigeonholing + exact
    * Hamming verify (<= maxHamming).
    */
  def pairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = fingerprints(documents)
    val blocked = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i => substring(col("simhash"), i * 16 + 1, 16)): _*))
        .as(Seq("block", "block_bits")))
    val cand = blocked.as("a")
      .join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.block_bits") === col("b.block_bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    val hamming = (0 until 64)
      .map(i => when(substring(col("sh_a"), i + 1, 1) =!= substring(col("sh_b"), i + 1, 1), 1).otherwise(0))
      .reduce(_ + _)
    cand.withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
